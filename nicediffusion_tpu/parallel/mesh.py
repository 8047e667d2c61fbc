"""Device-mesh and sharding helpers.

The reference has **no** distributed support (reference trainer.py:9 TODO;
no torch.distributed anywhere — SURVEY.md §2 parallelism statement). This
module is the TPU-native addition: a `jax.sharding.Mesh` over the chips with
named axes, batch sharding over 'data', and replicated parameters. XLA emits
the gradient all-reduce as ICI collectives; nothing here ever touches
NCCL/MPI-style process groups.

Axes:
  * 'data'  — batch (data parallelism); the required strategy per
              BASELINE.json's north star.
  * 'model' — reserved for tensor-parallel sharding of attention heads /
              conv channels on larger models (kept size 1 by default).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
]


def make_mesh(
    num_data: int | None = None, num_model: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults to all devices on the data axis — the right layout for
    diffusion sampling/training where the model fits one chip.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    devices = devices[: num_data * num_model].reshape(num_data, num_model)
    return Mesh(devices, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Sharding that splits axis 0 over 'data', replicating the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays with batch-axis sharding over the mesh."""
    out = tuple(
        jax.device_put(a, data_sharding(mesh, np.ndim(a))) if a is not None else None
        for a in arrays
    )
    return out if len(out) > 1 else out[0]
