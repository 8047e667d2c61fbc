"""Tensor-parallel parameter sharding rules for the UNet.

Data parallelism is the primary strategy for this model family — every
preset fits comfortably on one chip (SURVEY.md §2, BASELINE.json) — but the
framework also supports sharding the model weights over the mesh's 'model'
axis for scaling beyond single-chip memory (e.g. much wider channel_mults).

The rules implement **Megatron-style pairing** inside each residual block
(the FLOP-carrying pattern, reference model.py:117-211) so the wide
intermediate activation stays sharded between the two convs and the only
collective per block is the row-parallel all-reduce:

  * ``in_conv``  — column-parallel: kernel (kh, kw, I, O) sharded on O,
    bias sharded. Input is replicated, each shard computes its own output
    channels locally; the intermediate ``h`` is channel-sharded.
  * ``out_norm`` — scale/bias sharded on the channel dim. GroupNorm
    reshapes C -> (32 groups, C/32) with groups as the MAJOR factor
    (ops/groupnorm.py:_group_stats), so a channel shard over an axis that
    divides 32 maps onto whole groups and the statistics stay shard-local
    — GSPMD propagates the sharding through the reshape with no
    collective. Pairing is therefore gated on ``axis_size | 32``.
  * ``out_conv`` — row-parallel: kernel sharded on its INPUT dim; each
    shard contributes a partial sum over its channels and GSPMD inserts
    one all-reduce (ICI psum). Bias replicated, added after the reduce.
  * ``step_embedding`` — replicated. Its 2*out_ch output is split into
    (scale, shift) halves (unet.py ResidualBlock), and a contiguous shard
    of the concatenated axis straddles that split, so sharding it would
    force a reshard; it is tiny (step_ch x 2*out_ch) and the AdaGN
    elementwise consumes replicated scale/shift against sharded ``h``
    shard-locally.
  * ``skip`` / Up/Downsample convs / stem / head — replicated. They are
    unpaired (their outputs add to or feed replicated tensors); sharding
    them would trade one cheap local op for an activation reshard.
  * ``in_norm`` stays replicated — its input (the block input) is
    replicated by construction.
  * Attention ``qkv_nin``/``proj_out`` kernels shard their output dim
    (parameter-memory scaling). The fused 3C qkv layout interleaves
    q/k/v as the MAJOR factor (unet.py qkv_attention), so a contiguous
    channel shard mixes q/k/v fragments of several heads — true
    head-parallel attention would need a (heads-major) weight layout that
    breaks checkpoint compatibility. Instead the Pallas attention kernel's
    custom_partitioning rule (ops/pallas/attention.py) reshards
    channel-sharded qkv to whole channels before the shard-local kernel —
    an all-gather of the (B, N, 3C) activation. Honest cost statement:
    attention is ~10% of the forward (BASELINE.md roofline), and at
    <=600M params TP is a memory lever, not a throughput one.

Shardings are expressed as NamedSharding annotations on the parameter
pytree; GSPMD propagates them through the forward/backward graphs and
inserts the collectives over ICI. Pipeline (PP), sequence (SP), and expert
(EP) parallelism have no applicable structure in this model family: there
is no layer pipeline depth worth the bubbles at <=600M params, max
attention sequence is 1024 tokens (SURVEY.md §5.7), and there are no
experts. DP (+ optional TP) is the honest full coverage.

tests/test_tensor_parallel.py pins both numerics (TP forward/grads match
unsharded) and the collective structure (the paired GN->conv->AdaGN->conv
pattern compiles to all-reduce only — no all-gather of the intermediate).
"""

from __future__ import annotations

from typing import Mapping

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["unet_param_shardings", "shard_params"]

# GroupNorm group count is fixed at 32 (reference model.py uses
# nn.GroupNorm(32, C) everywhere); see ops/groupnorm.py.
_GN_GROUPS = 32


def _spec_for(path: tuple[str, ...], value, axis_size: int) -> P:
    name = path[-1] if path else ""
    parent = path[-2] if len(path) >= 2 else ""

    # Megatron pairing needs shards to hold whole GroupNorm groups so the
    # out_norm statistics stay shard-local.
    paired = _GN_GROUPS % axis_size == 0

    if parent == "in_conv" and paired:
        if name == "kernel" and value.shape[-1] % axis_size == 0:
            return P(None, None, None, "model")  # column-parallel
        if name == "bias" and value.shape[0] % axis_size == 0:
            return P("model")
        return P()
    if parent == "out_norm" and paired:
        if value.ndim == 1 and value.shape[0] % axis_size == 0:
            return P("model")
        return P()
    if parent == "out_conv" and paired:
        if name == "kernel" and value.shape[-2] % axis_size == 0:
            return P(None, None, "model", None)  # row-parallel
        return P()  # bias replicated: added after the all-reduce
    if parent in ("step_embedding", "skip", "in_norm", "conv", "norm"):
        return P()
    if parent == "qkv_nin":
        # column-parallel qkv: splits the projection FLOPs/params; the
        # Pallas kernel's SPMD rule then reshards the (B, N, 3C) qkv
        # activation to whole channels (the documented attention gather)
        if name == "kernel" and value.shape[-1] % axis_size == 0:
            return P(None, "model")
        if name == "bias" and value.shape[0] % axis_size == 0:
            return P("model")
        return P()
    if parent == "proj_out":
        # row-parallel output projection: the attention output is
        # replicated, each shard slices its input channels locally
        # (a slice of a replicated tensor is free), partial-sums, and one
        # all-reduce restores the replicated residual-add operand
        if name == "kernel" and value.shape[0] % axis_size == 0:
            return P("model", None)
        return P()  # bias replicated: added after the all-reduce
    if name == "kernel" and value.ndim == 2 and value.shape[-1] % axis_size == 0:
        # remaining dense layers (timestep MLP): shard output channels.
        # 4-D (conv) kernels falling through to here — stem, head,
        # Up/Downsample — stay replicated: they are unpaired, and a
        # column-sharded unpaired conv would force an activation gather at
        # its consumer.
        return P(None, "model")
    # GroupNorm scale/bias, embeddings, stem/head convs, odd shapes
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
