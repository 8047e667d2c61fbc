"""Fused GroupNorm(+SiLU)(+AdaGN) + 3x3 conv Pallas kernel.

Targets the residual-block hot pattern (reference model.py:188-211; our
models/unet.py ResidualBlock): both the ``in_norm -> in_conv`` and the
``out_norm(AdaGN) -> out_conv`` halves are GN+SiLU epilogues feeding a
stride-1 3x3 SAME conv. Round-2 device traces put this pattern (conv +
GN-stat `convert_reduce_fusion`s + normalize/SiLU epilogue fusions) at
~88 of the 112 ms batch-64 ImageNet-64 forward (BASELINE.md roofline
table), with XLA sustaining 40-60% MXU on the convs.

The kernel's thesis: one VMEM residency per batch element. The whole
per-example feature map fits VMEM at every UNet level (64x64x192x2B =
1.5 MB down to 8x8x768 = 0.1 MB), so we can

  1. DMA x[b] HBM -> VMEM once,
  2. compute the f32 group statistics there (group reduce via two tiny
     one-hot matmuls — avoids (HW, G, C/G) relayouts),
  3. normalize + modulate + SiLU on the VPU into a zero-padded scratch,
  4. implicit-GEMM the 3x3 conv as 9 shifted (HW, C) x (C, F) MXU dots
     accumulated in f32,

eliminating the separate HBM round-trips XLA spends on the stat pass and
the normalized intermediate. Grid is (B,); weights live in VMEM across the
whole grid (largest level: 3x3x768x768 bf16 = 10.6 MB).

Correctness spec: ops/groupnorm.py `_reference_fn` (f32 stats, torch-style
biased variance) composed with lax.conv — tested to tight tolerances in
tests/test_pallas_resblock.py. Backward is a jnp-recompute custom VJP like
the other fused kernels.

Measured on a v5e-1 chip (tools/resblock_probe.py), batch-64 chained steps
per fused block vs the XLA composite: this is an EXPERIMENT — see
BASELINE.md for the verdict and whether it is default-on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gn_silu_conv3x3", "gn_silu_conv3x3_reference"]


def _group_onehots(c: int, num_groups: int):
    """(C, G) membership matrix and its transpose, f32 host constants."""
    g = np.zeros((c, num_groups), dtype=np.float32)
    per = c // num_groups
    for i in range(c):
        g[i, i // per] = 1.0
    return g


def _kernel(x_ref, gamma_ref, beta_ref, es_ref, eb_ref, w_ref, b_ref,
            onehot_ref, out_ref, xn_ref, *, num_groups, eps, ada, h, w, c, f,
            out_dtype):
    # x block: (1, H, W, C) -> (HW, C)
    x = x_ref[0].reshape(h * w, c).astype(jnp.float32)

    # group statistics via one-hot matmuls: (1, C) @ (C, G) -> (1, G)
    onehot = onehot_ref[...]  # (C, G)
    sums = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    sumsq = jnp.sum(x * x, axis=0, keepdims=True)
    gsum = jnp.dot(sums, onehot, preferred_element_type=jnp.float32)
    gsumsq = jnp.dot(sumsq, onehot, preferred_element_type=jnp.float32)
    count = float(h * w * (c // num_groups))
    gmean = gsum / count
    gvar = gsumsq / count - gmean * gmean
    # broadcast back per channel: (1, G) @ (G, C)
    mean_c = jnp.dot(gmean, onehot.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(
        jax.lax.rsqrt(gvar + eps), onehot.T,
        preferred_element_type=jnp.float32,
    )

    xn = (x - mean_c) * rstd_c
    xn = xn * gamma_ref[...].astype(jnp.float32) + beta_ref[...].astype(
        jnp.float32
    )
    if ada:
        # per-example (1, C) modulation rows (carried (B, 1, C) so the
        # batch-blocked axis stays out of the tiled last two dims)
        xn = xn * (1.0 + es_ref[0].astype(jnp.float32))
        xn = xn + eb_ref[0].astype(jnp.float32)
    xn = xn * jax.nn.sigmoid(xn)

    # zero-padded normalized map in VMEM scratch, conv dtype
    xn_ref[...] = jnp.zeros(xn_ref.shape, xn_ref.dtype)
    xn_ref[1 : h + 1, 1 : w + 1, :] = xn.reshape(h, w, c).astype(xn_ref.dtype)

    # implicit-GEMM 3x3 conv: 9 shifted (rows*W, C) x (C, F) dots, row-
    # chunked so the f32 accumulator stays small (at 64x64x192 a full
    # (4096, 192) f32 accumulator pushed the kernel past VMEM)
    chunk = h
    while chunk * w * f * 4 > 1 << 20 and chunk % 2 == 0:
        chunk //= 2
    bias = b_ref[...].astype(jnp.float32)
    for r0 in range(0, h, chunk):
        acc = jnp.zeros((chunk * w, f), dtype=jnp.float32)
        for dy in range(3):
            for dx in range(3):
                patch = xn_ref[
                    r0 + dy : r0 + dy + chunk, dx : dx + w, :
                ].reshape(chunk * w, c)
                acc = acc + jnp.dot(
                    patch, w_ref[dy, dx], preferred_element_type=jnp.float32
                )
        out_ref[0, r0 : r0 + chunk] = (
            (acc + bias).reshape(chunk, w, f).astype(out_dtype)
        )


def _fused_call(x, gamma, beta, es, eb, kernel, bias, *, num_groups, eps,
                ada, interpret):
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    onehot = jnp.asarray(_group_onehots(c, num_groups))
    compute_dtype = x.dtype

    grid = (b,)
    kern = functools.partial(
        _kernel, num_groups=num_groups, eps=float(eps), ada=ada,
        h=h, w=w, c=c, f=f, out_dtype=compute_dtype,
    )
    row = lambda i: (i, 0, 0)  # per-example (1, 1, C) rows
    fixed = lambda i: (0, 0)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), fixed, memory_space=pltpu.VMEM),  # gamma
            pl.BlockSpec((1, c), fixed, memory_space=pltpu.VMEM),  # beta
            pl.BlockSpec((1, 1, c), row, memory_space=pltpu.VMEM),  # es
            pl.BlockSpec((1, 1, c), row, memory_space=pltpu.VMEM),  # eb
            pl.BlockSpec((3, 3, c, f), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), fixed, memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec((c, num_groups), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, f), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, f), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, c), compute_dtype),
        ],
        interpret=interpret,
    )(
        x,
        gamma.reshape(1, c), beta.reshape(1, c),
        es.reshape(b, 1, c), eb.reshape(b, 1, c),
        kernel, bias.reshape(1, f),
        onehot,
    )


def gn_silu_conv3x3_reference(x, gamma, beta, es, eb, kernel, bias, *,
                              num_groups=32, eps=1e-5, ada=False):
    """jnp spec: ops/groupnorm semantics + lax 3x3 SAME conv."""
    from ..groupnorm import ada_group_norm_silu, group_norm_silu

    if ada:
        h = ada_group_norm_silu(x, gamma, beta, es, eb, num_groups, eps)
    else:
        h = group_norm_silu(x, gamma, beta, num_groups, eps)
    o = jax.lax.conv_general_dilated(
        h.astype(x.dtype), kernel.astype(x.dtype), (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (o + bias.astype(jnp.float32)).astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _make_op(num_groups: int, eps: float, ada: bool, interpret: bool):
    def impl(x, gamma, beta, es, eb, kernel, bias):
        return _fused_call(
            x, gamma, beta, es, eb, kernel, bias,
            num_groups=num_groups, eps=eps, ada=ada, interpret=interpret,
        )

    def ref(x, gamma, beta, es, eb, kernel, bias):
        return gn_silu_conv3x3_reference(
            x, gamma, beta, es, eb, kernel, bias,
            num_groups=num_groups, eps=eps, ada=ada,
        )

    op = jax.custom_vjp(impl)

    def fwd(*args):
        return impl(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(ref, *res)
        return vjp(g.astype(res[0].dtype))

    op.defvjp(fwd, bwd)
    return op


def gn_silu_conv3x3(x, gamma, beta, kernel, bias, es=None, eb=None, *,
                    num_groups=32, eps=1e-5, interpret=False):
    """Fused GN(+AdaGN)+SiLU + stride-1 3x3 SAME conv.

    x: (B, H, W, C) NHWC; gamma/beta: (C,) GN affine; kernel: (3, 3, C, F)
    HWIO; bias: (F,); es/eb: optional (B, C) AdaGN scale/shift rows
    (``SiLU((1 + es) * GN(x) + eb)`` before the conv). Returns (B, H, W, F)
    in x.dtype, f32 accumulation throughout.
    """
    ada = es is not None
    b, _, _, c = x.shape
    if not ada:
        es = jnp.zeros((b, c), dtype=x.dtype)
        eb = jnp.zeros((b, c), dtype=x.dtype)
    return _make_op(num_groups, float(eps), ada, interpret)(
        x, gamma, beta, es, eb, kernel, bias
    )
