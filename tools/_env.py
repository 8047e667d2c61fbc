"""Shared tool bootstrap: make JAX_PLATFORMS authoritative.

The container's TPU-relay sitecustomize patches jax's backend resolution in
a way that can initialize the relay client even when the environment asks
for cpu (observed: jax.default_backend() hanging on a down relay under
JAX_PLATFORMS=cpu). Applying the env choice via jax.config.update BEFORE
first device use wins — the same mechanism tests/conftest.py and
__graft_entry__.py use. Import this module first in every tools/ script:

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import _env  # noqa: F401  (JAX_PLATFORMS pin)
"""

import os

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
