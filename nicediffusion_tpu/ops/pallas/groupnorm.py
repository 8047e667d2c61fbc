"""Fused GroupNorm (+SiLU, +AdaGN scale-shift) Pallas TPU kernel.

The UNet normalizes every residual-block activation twice plus once per
attention block (reference model.py:172-176, 250). XLA lowers GroupNorm as a
reduce pass followed by a normalize/affine fusion — at least two full HBM
reads of the activation plus materialised f32 temporaries. This kernel
streams each batch element's tokens through VMEM **twice within one grid
row** (phase 0: accumulate per-channel sum / sum-of-squares into VMEM
scratch; phase 1: normalize + affine + AdaGN + SiLU and write out), so the
activation makes exactly two HBM reads and one write with no f32
temporaries in HBM.

Mosaic cannot reshape the lane (channel) dimension, so the per-group
reduce/broadcast of the (1, C) statistics goes through a 0/1 channel→group
matrix on the MXU — exact integer-weight sums, bit-identical to a reshape
reduce.

Stats accumulate in float32 regardless of input dtype, matching the jnp
reference implementation (ops/groupnorm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["group_norm_fused"]

_CHUNK = 512  # tokens per grid step; bounds VMEM at ~C * 512 * 6 bytes


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "eps", "silu", "interpret"),
)
def group_norm_fused(
    x,
    scale,
    bias,
    emb_scale=None,
    emb_shift=None,
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    silu: bool = True,
    interpret: bool = False,
):
    """Fused GroupNorm over NHWC with optional AdaGN modulation and SiLU.

    x: (B, H, W, C); scale/bias: (C,); emb_scale/emb_shift: (B, C) or None.
    Semantics identical to ops/groupnorm.py's group_norm /
    group_norm_silu / ada_group_norm_silu.
    """
    b, h, w, c = x.shape
    ada = emb_scale is not None
    hw = h * w

    chunk = min(_CHUNK, ((hw + 7) // 8) * 8)
    nc = -(-hw // chunk)
    hw_p = nc * chunk

    xt = x.reshape(b, hw, c)
    if hw_p != hw:
        # zero-pad the token axis; zeros do not perturb the sums and the
        # kernel divides by the true token count
        xt = jnp.pad(xt, ((0, 0), (0, hw_p - hw), (0, 0)))

    if ada:
        es = emb_scale.reshape(b, 1, c)
        esh = emb_shift.reshape(b, 1, c)
    else:
        es = jnp.zeros((b, 1, c), dtype=x.dtype)
        esh = jnp.zeros((b, 1, c), dtype=x.dtype)

    def kernel(x_ref, scale_ref, bias_ref, es_ref, esh_ref, o_ref):
        cg = c // num_groups
        ch_i = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
        gr_i = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
        m = (ch_i // cg == gr_i).astype(jnp.float32)  # (C, G)

        # pass 1 over VMEM-resident slices: per-channel sum / sum-of-squares
        # accumulated in f32 without materialising a full-block f32 temp
        s1 = jnp.zeros((1, c), dtype=jnp.float32)
        s2 = jnp.zeros((1, c), dtype=jnp.float32)
        for s in range(nc):
            xk = x_ref[0, s * chunk : (s + 1) * chunk, :].astype(jnp.float32)
            s1 = s1 + jnp.sum(xk, axis=0, keepdims=True)
            s2 = s2 + jnp.sum(xk * xk, axis=0, keepdims=True)

        denom = hw * cg  # true token count (padding is zeros)
        gs1 = jnp.dot(s1, m, preferred_element_type=jnp.float32)
        gs2 = jnp.dot(s2, m, preferred_element_type=jnp.float32)
        gmean = gs1 / denom
        gvar = gs2 / denom - gmean * gmean
        grstd = jax.lax.rsqrt(gvar + eps)
        mean_c = jnp.dot(gmean, m.T, preferred_element_type=jnp.float32)
        rstd_c = jnp.dot(grstd, m.T, preferred_element_type=jnp.float32)

        sc = scale_ref[...].astype(jnp.float32)[None, :]
        bi = bias_ref[...].astype(jnp.float32)[None, :]
        if ada:
            esf = es_ref[0, 0].astype(jnp.float32)[None, :]
            eshf = esh_ref[0, 0].astype(jnp.float32)[None, :]

        # pass 2 over the same VMEM block: normalize + modulate + SiLU
        for s in range(nc):
            xk = x_ref[0, s * chunk : (s + 1) * chunk, :].astype(jnp.float32)
            y = (xk - mean_c) * (rstd_c * sc) + bi
            if ada:
                y = y * (1.0 + esf) + eshf
            if silu:
                y = y * jax.nn.sigmoid(y)
            o_ref[0, s * chunk : (s + 1) * chunk, :] = y.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw_p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw_p, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw_p, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(xt, scale, bias, es, esh)
    return out[:, :hw, :].reshape(b, h, w, c)
