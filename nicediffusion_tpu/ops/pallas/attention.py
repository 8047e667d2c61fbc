"""Fused multi-head QKV self-attention as a Pallas TPU kernel.

The UNet's attention operates on flattened image tokens with short sequences
(N = 64..1024 for the reference model family — SURVEY.md §5.7) but runs at
2x-batch under CFG and ~21 layers deep, and ablation shows the XLA einsum
path spends ~half the forward pass here: the (B*H, N, N) float32 logits
round-trip through HBM between the QK matmul, softmax, and the PV matmul.

This kernel keeps the whole (N, N) logits tile resident in VMEM — at N=1024
that is 4 MB f32, well inside a v5e core's VMEM — so each (batch, head) does
exactly one HBM read of q/k/v and one write of the output. No streaming/
online-softmax machinery is needed at these sequence lengths; this is a
single-block flash kernel (softmax in f32, matmuls on the MXU with
preferred_element_type=f32).

Primary entry points:
  * mha_attention_fused_qkv      — forward, grid (batch,), heads unrolled,
    reading each head's q/k/v channel slices straight from the (B, N, 3C)
    projection layout (both checkpoint orders) and writing (B, N, C).
  * mha_attention_fused_qkv_bwd  — flash-style backward (see its docstring).
  * mha_attention                — (B, H, N, D) variant kept for tests.
Head dims are 64..256 for all presets; N is padded to sublane multiples.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "mha_attention",
    "mha_attention_fused_qkv",
    "mha_attention_fused_qkv_bwd",
    "fused_qkv_attention_sharded",
    "fused_qkv_attention_bwd_sharded",
]


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    # block shapes: (1, 1, N, D) for one (batch, head) program
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (N, N) f32, resident in VMEM

    n_total = logits.shape[-1]
    if n_valid != n_total:
        # mask key padding so softmax ignores it (finite sentinel: padded
        # *query* rows would turn all -inf into NaN)
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < n_valid, logits, -1e30)

    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fused_kernel(
    qkv_ref, o_ref, *, scale: float, n_valid: int, num_heads: int,
    split_qkv_first: bool,
):
    """One batch element: all heads, sliced statically from the (N, 3C)
    block. Static per-head channel offsets cover both checkpoint layouts.

    Query tiling note (round-2 measurement): at the model's sequence
    lengths (N <= 1024) the whole-N form is FASTER than query tiling
    (2.53 vs 2.93/3.73 ms per res-32 layer for qb=1024/256/128 — the
    (N, N) f32 logits block fits VMEM and re-reading k/v per tile plus the
    loop overhead costs more than it saves), and the in-model kernel is
    already near its arithmetic floor (~12 ms of the 112 ms batch-64
    forward; head_dim=64 caps the MXU at 50% on the QK^T contraction).
    Query tiles engage only for hypothetical N > 1024 workloads, where the
    logits block would outgrow VMEM."""
    n, c3 = qkv_ref.shape[1], qkv_ref.shape[2]
    c = c3 // 3
    hc = c // num_heads
    if n <= 1024:
        qb = n
    else:
        qb = 256 if n % 256 == 0 else (128 if n % 128 == 0 else n)
    n_blocks = n // qb

    def offsets(head):
        if split_qkv_first:
            return head * hc, c + head * hc, 2 * c + head * hc
        base = head * 3 * hc
        return base, base + hc, base + 2 * hc

    for head in range(num_heads):
        qo, ko, vo = offsets(head)
        go = head * hc

        def qtile(i, _, qo=qo, ko=ko, vo=vo, go=go):
            r0 = pl.multiple_of(i * qb, qb)
            # all loads inside the loop body so Mosaic reuses one set of
            # temporaries across tiles AND unrolled heads
            q = qkv_ref[0, pl.ds(r0, qb), qo : qo + hc]
            k = qkv_ref[0, :, ko : ko + hc]
            v = qkv_ref[0, :, vo : vo + hc]
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (QB, N) f32
            if n_valid != n:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n_valid, s, -1e30)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_ref[0, pl.ds(r0, qb), go : go + hc] = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, n_blocks, qtile, 0)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "split_qkv_first", "interpret")
)
def mha_attention_fused_qkv(
    qkv, num_heads: int, split_qkv_first: bool, *, interpret: bool = False
):
    """Attention directly on the fused (B, N, 3C) qkv projection -> (B, N, C).

    Zero transposes: each batch element's program DMAs the projection block
    in its native layout, statically slices every head's q/k/v channels
    (covering both checkpoint layouts — reference model.py:266-287), and
    writes the (B, N, C) head-contiguous layout the out-projection consumes.
    Head loop is python-unrolled (<= 12 heads for all presets); Mosaic block
    shapes stay full-width on the lane dimension, so no 128-divisibility
    constraints on the head dim. Differentiable via the custom VJP in
    ops/attention.py (backward = mha_attention_fused_qkv_bwd).
    """
    b, n, c3 = qkv.shape
    c = c3 // 3
    hc = c // num_heads
    scale = hc**-0.5

    n_pad = (-n) % 8
    qkv_p = jnp.pad(qkv, ((0, 0), (0, n_pad), (0, 0))) if n_pad else qkv
    np_ = n + n_pad

    kernel = functools.partial(
        _fused_kernel, scale=scale, n_valid=n, num_heads=num_heads,
        split_qkv_first=split_qkv_first,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, np_, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, np_, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_, c), qkv.dtype),
        # batch programs are independent -> Mosaic double-buffers the DMAs
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(qkv_p)
    return out[:, :n, :]


def _fused_bwd_kernel(
    qkv_ref, g_ref, o_ref, dqkv_ref, *, scale: float, n_valid: int,
    num_heads: int, split_qkv_first: bool,
):
    """Flash-style attention backward for one batch element, all heads.

    Recomputes p = softmax(q k^T * scale) in VMEM, then with the forward
    output o as a residual:
      delta = rowsum(g * o)          (== rowsum(dp * p), the softmax trick)
      dv = p^T g;  dp = g v^T;  ds = p * (dp - delta) * scale;
      dq = ds k;   dk = ds^T q
    Intermediates are kept bf16 where safe so the (N, N) live set fits VMEM.
    """
    qkv = qkv_ref[0]
    n, c3 = qkv.shape
    c = c3 // 3
    hc = c // num_heads

    def offsets(head):
        if split_qkv_first:
            return head * hc, c + head * hc, 2 * c + head * hc
        base = head * 3 * hc
        return base, base + hc, base + 2 * hc

    # Query rows processed in tiles so the f32 (QB, N) score blocks stay
    # small enough for VMEM alongside the double-buffered qkv/g/o/dqkv
    # blocks; dk/dv accumulate across tiles in f32. The tile loop is a
    # fori_loop (not python-unrolled) so Mosaic reuses one set of temps.
    # The wrapper pads n to a multiple of the tile, so n // qb is exact —
    # an inexact split would leave trailing dq rows UNWRITTEN (real-TPU
    # garbage/NaN; interpret mode zero-fills and hid it — the EMNIST
    # 14x14 level, N=196 -> 200, hit exactly this).
    qb = min(128, n)
    assert n % qb == 0, (n, qb)
    n_blocks = n // qb

    for head in range(num_heads):
        qo, ko, vo = offsets(head)
        q = qkv[:, qo : qo + hc]
        k = qkv[:, ko : ko + hc]
        v = qkv[:, vo : vo + hc]
        go = head * hc

        def qblock(i, carry, q=q, k=k, v=v, qo=qo, go=go):
            dv_acc, dk_acc = carry
            r0 = pl.multiple_of(i * qb, qb)
            # slice query rows from the ref (value dynamic_slice is not
            # lowerable in Mosaic)
            qblk = qkv_ref[0, pl.ds(r0, qb), qo : qo + hc]
            gblk = g_ref[0, pl.ds(r0, qb), go : go + hc]
            oblk = o_ref[0, pl.ds(r0, qb), go : go + hc]

            s = jax.lax.dot_general(
                qblk, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if n_valid != n:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n_valid, s, -1e30)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qkv.dtype)

            # delta[t] = rowsum(g*o) == rowsum(dp*p) (softmax trick)
            delta = jnp.sum(
                gblk.astype(jnp.float32) * oblk.astype(jnp.float32),
                axis=-1, keepdims=True,
            )

            dv_acc = dv_acc + jax.lax.dot_general(
                p, gblk, (((0,), (0,)), ((), ())),  # p^T g -> (N, hc)
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                gblk, v, (((1,), (1,)), ((), ())),  # g v^T -> (QB, N)
                preferred_element_type=jnp.float32,
            )
            ds = (
                p.astype(jnp.float32) * (dp - delta) * scale
            ).astype(qkv.dtype)
            dq = jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv_ref[0, pl.ds(r0, qb), qo : qo + hc] = dq.astype(
                dqkv_ref.dtype
            )
            dk_acc = dk_acc + jax.lax.dot_general(
                ds, qblk, (((0,), (0,)), ((), ())),  # ds^T q -> (N, hc)
                preferred_element_type=jnp.float32,
            )
            return dv_acc, dk_acc

        dv_acc, dk_acc = jax.lax.fori_loop(
            0, n_blocks, qblock,
            (jnp.zeros((n, hc), dtype=jnp.float32),
             jnp.zeros((n, hc), dtype=jnp.float32)),
        )
        dqkv_ref[0, :, ko : ko + hc] = dk_acc.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, vo : vo + hc] = dv_acc.astype(dqkv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "split_qkv_first", "interpret")
)
def mha_attention_fused_qkv_bwd(
    qkv, g, o, num_heads: int, split_qkv_first: bool, *,
    interpret: bool = False
):
    """Gradient of mha_attention_fused_qkv w.r.t. its qkv input.

    (B, N, 3C) qkv + (B, N, C) output cotangent + (B, N, C) forward output
    (the softmax-trick residual) -> (B, N, 3C) cotangent, computed entirely
    in VMEM per batch element (no (N, N) HBM traffic)."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    hc = c // num_heads
    scale = hc**-0.5

    # pad the sequence to a multiple of the kernel's query tile (128 when
    # n > 128, else the sublane 8) so the fori_loop covers every row —
    # see the tiling note in _fused_bwd_kernel. Padded g rows are zero, so
    # they contribute nothing to dk/dv and their dq rows are sliced off.
    tile = 128 if n > 128 else 8
    n_pad = (-n) % tile
    if n_pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, n_pad), (0, 0)))
        o = jnp.pad(o, ((0, 0), (0, n_pad), (0, 0)))
    np_ = n + n_pad

    kernel = functools.partial(
        _fused_bwd_kernel, scale=scale, n_valid=n, num_heads=num_heads,
        split_qkv_first=split_qkv_first,
    )
    # single-buffered blocks: each program's compute dwarfs the DMA, and
    # double-buffering all four (N, 3C)-scale blocks exceeds VMEM
    single = pl.Buffered(buffer_count=1)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, np_, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM, pipeline_mode=single),
            pl.BlockSpec((1, np_, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM, pipeline_mode=single),
            pl.BlockSpec((1, np_, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM, pipeline_mode=single),
        ],
        out_specs=pl.BlockSpec((1, np_, c3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM,
                               pipeline_mode=single),
        out_shape=jax.ShapeDtypeStruct((b, np_, c3), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(qkv, g, o)
    return out[:, :n, :]


# ---------------------------------------------------------------------------
# SPMD partitioning
#
# A pallas_call lowers to an opaque CustomCallOp that GSPMD/shardy cannot see
# through: under a sharded jit the partitioner would replicate the operands
# (all-gathering a P('data')-sharded batch onto every chip) or fail. Both
# kernels grid over the batch dimension with fully independent programs, so
# they partition trivially along batch — these wrappers teach the partitioner
# exactly that via jax.experimental.custom_partitioning: the batch dim keeps
# whatever mesh axes the operand carries, every other dim is forced
# replicated (need_replication factors), and each shard runs the kernel on
# its local (B/shards, N, 3C) block. No collectives are inserted for plain
# data parallelism; a tensor-parallel ('model'-sharded) qkv is all-gathered
# on channels first, which is the correct semantics for this fused kernel.
# ---------------------------------------------------------------------------

from jax.experimental.custom_partitioning import (  # noqa: E402
    custom_partitioning,
)
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def _batch_only_sharding(mesh, sharding, ndim: int) -> NamedSharding:
    """Keep the operand's batch-dim placement; replicate all other dims."""
    batch = None
    spec = getattr(sharding, "spec", None)
    if spec is not None and len(spec) > 0:
        batch = spec[0]
    return NamedSharding(mesh, P(batch, *([None] * (ndim - 1))))


@functools.lru_cache(maxsize=None)
def _sharded_fwd(num_heads: int, split_qkv_first: bool, interpret: bool):
    def impl(qkv):
        return mha_attention_fused_qkv(
            qkv, num_heads, split_qkv_first, interpret=interpret
        )

    fn = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        sh = _batch_only_sharding(mesh, arg_shapes[0].sharding, 3)
        return mesh, impl, sh, (sh,)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        return _batch_only_sharding(mesh, arg_shapes[0].sharding, 3)

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        # batch factor `b` is freely shardable; sequence and channel dims
        # must stay whole per shard (the kernel needs the full sequence and
        # all heads of one batch element in VMEM)
        sharding_rule="b n c -> b n d",
        need_replication_factors=("n", "c", "d"),
    )
    return fn


@functools.lru_cache(maxsize=None)
def _sharded_bwd(num_heads: int, split_qkv_first: bool, interpret: bool):
    def impl(qkv, g, o):
        return mha_attention_fused_qkv_bwd(
            qkv, g, o, num_heads, split_qkv_first, interpret=interpret
        )

    fn = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        sh3 = _batch_only_sharding(mesh, arg_shapes[0].sharding, 3)
        return mesh, impl, sh3, (sh3, sh3, sh3)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        return _batch_only_sharding(mesh, arg_shapes[0].sharding, 3)

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule="b n c, b n e, b n f -> b n d",
        need_replication_factors=("n", "c", "e", "f", "d"),
    )
    return fn


def fused_qkv_attention_sharded(
    qkv, num_heads: int, split_qkv_first: bool, *, interpret: bool = False
):
    """mha_attention_fused_qkv, partitionable along batch under SPMD jit.

    On a single device this calls the kernel directly (identical lowering to
    round-1's benched path); with >1 visible device the custom_partitioning
    wrapper lets a P('data')-sharded batch run the kernel shard-locally.
    """
    if len(jax.devices()) == 1:
        return mha_attention_fused_qkv(
            qkv, num_heads, split_qkv_first, interpret=interpret
        )
    return _sharded_fwd(num_heads, split_qkv_first, interpret)(qkv)


def fused_qkv_attention_bwd_sharded(
    qkv, g, o, num_heads: int, split_qkv_first: bool, *,
    interpret: bool = False
):
    """mha_attention_fused_qkv_bwd, partitionable along batch under SPMD."""
    if len(jax.devices()) == 1:
        return mha_attention_fused_qkv_bwd(
            qkv, g, o, num_heads, split_qkv_first, interpret=interpret
        )
    return _sharded_bwd(num_heads, split_qkv_first, interpret)(qkv, g, o)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mha_attention(q, k, v, *, interpret: bool = False):
    """softmax(q k^T / sqrt(D)) v for (B, H, N, D) inputs -> (B, H, N, D).

    Scale matches the reference (channels//heads)^-0.5 (model.py:245).
    Pads N to a sublane multiple and D to the 128-lane width, masking padded
    keys inside the kernel.
    """
    b, h, n, d = q.shape
    scale = d**-0.5

    qp = _pad_to(_pad_to(q, 2, 8), 3, 128)
    kp = _pad_to(_pad_to(k, 2, 8), 3, 128)
    vp = _pad_to(_pad_to(v, 2, 8), 3, 128)
    np_, dp = qp.shape[2], qp.shape[3]

    kernel = functools.partial(_attn_kernel, scale=scale, n_valid=n)
    out = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, np_, dp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, np_, dp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, np_, dp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, np_, dp), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, np_, dp), q.dtype),
        # both grid axes are independent (batch, head) -> lets Mosaic
        # double-buffer the q/k/v DMAs across grid steps (measured ~5x)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :, :n, :d]
