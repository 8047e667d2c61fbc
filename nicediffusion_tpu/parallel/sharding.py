"""Tensor-parallel parameter sharding rules for the UNet.

Data parallelism is the primary strategy for this model family — every
preset fits comfortably on one chip (SURVEY.md §2, BASELINE.json) — but the
framework also supports sharding the model weights over the mesh's 'model'
axis for scaling beyond single-chip memory (e.g. much wider channel_mults):

  * Conv kernels (kh, kw, I, O) and Dense kernels (I, O) shard their
    output-channel dimension.
  * GroupNorm scales/biases, embeddings, and any dimension not divisible by
    the axis size stay replicated.

Shardings are expressed as NamedSharding annotations on the parameter
pytree; GSPMD propagates them through the forward/backward graphs and
inserts the (all-gather/reduce-scatter) collectives over ICI. Pipeline (PP),
sequence (SP), and expert (EP) parallelism have no applicable structure in
this model family: there is no layer pipeline depth worth the bubbles at
<=600M params, max attention sequence is 1024 tokens (SURVEY.md §5.7), and
there are no experts. DP (+ optional TP) is the honest full coverage.

The Pallas fused-attention kernels are SPMD-partitionable: they register a
custom_partitioning rule (ops/pallas/attention.py) that keeps a
P('data')-sharded batch shard-local (no collectives) and reshards
channel-sharded ('model'-axis) inputs to whole channels before the
shard-local kernel, so both DP and DP x TP jits use the fast path.
"""

from __future__ import annotations

from typing import Mapping

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["unet_param_shardings", "shard_params"]


def _spec_for(path: tuple[str, ...], value, axis_size: int) -> P:
    name = path[-1] if path else ""
    if name == "kernel" and value.ndim >= 2 and value.shape[-1] % axis_size == 0:
        # conv (kh, kw, I, O) / dense (I, O): shard output channels
        return P(*([None] * (value.ndim - 1) + ["model"]))
    if name == "bias" and value.ndim == 1 and value.shape[0] % axis_size == 0:
        return P("model")
    # GroupNorm scale/bias, embeddings, odd shapes: replicate
    return P()


def unet_param_shardings(params: Mapping, mesh: Mesh):
    """NamedSharding pytree for a DiffusionModel params pytree."""
    axis_size = mesh.shape["model"]

    def walk(path, node):
        if isinstance(node, Mapping):
            return {k: walk(path + (k,), v) for k, v in node.items()}
        if axis_size == 1:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _spec_for(path, node, axis_size))

    return walk((), params)


def shard_params(params: Mapping, mesh: Mesh):
    """Place a params pytree with tensor-parallel shardings over `mesh`."""
    shardings = unet_param_shardings(params, mesh)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, s), dict(params), shardings
    )
