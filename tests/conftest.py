"""Test configuration: force JAX onto a virtual 8-device CPU mesh before any
jax import, and make the torch reference importable for golden generation.

The 8 fake devices let the distributed/data-parallel tests (SURVEY.md §4.7)
run without TPU hardware; everything numerical runs f32-on-CPU which matches
the torch-CPU reference used for parity goldens.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize force-registers the TPU plugin and sets
# JAX_PLATFORMS=axon; override it before any backend initialises. Backend
# selection is lazy, so a config update here (before first jax.devices())
# reliably pins tests to the virtual 8-device CPU platform.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Make the PyTorch reference importable (read-only; used only to generate
# golden values inside tests — never on the device path).
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng_np():
    # function-scoped: every test sees the same deterministic stream
    # regardless of execution order
    return np.random.default_rng(0)
