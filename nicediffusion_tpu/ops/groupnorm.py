"""GroupNorm (NHWC) with optional fused SiLU / scale-shift epilogues.

The reference uses torch ``nn.GroupNorm(32, C, eps=1e-5)`` followed by SiLU
(reference model.py:172-176, 190, 203-207) and, in AdaGN mode, a per-channel
``(1 + scale) * GN(h) + shift`` modulation (model.py:199-203). On TPU the win
is fusing the normalize + modulate + SiLU chain into one pass over the tensor
so the activations make a single HBM round-trip; this module provides the
reference-exact jnp implementation. A Pallas kernel with the same signature
lives in nicediffusion_tpu.ops.pallas and is swapped in on TPU backends.

Statistics are computed in float32 regardless of input dtype (torch
GroupNorm upcasts similarly for half inputs), matching torch's per-group
biased variance.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["group_norm", "group_norm_silu", "ada_group_norm_silu"]


def _pallas_enabled(x) -> bool:
    """Opt-in Pallas GN dispatch (NICEDIFFUSION_PALLAS_GN=1).

    Measured on v5e: the fused kernel wins on small activations but the
    UNet's large decoder-concat blocks exceed VMEM double-buffering limits
    and XLA's reduce+fuse lowering is already within ~6% of the total
    forward, so XLA remains the default (see ops/pallas/groupnorm.py).
    """
    if os.environ.get("NICEDIFFUSION_NO_PALLAS"):
        return False
    if not os.environ.get("NICEDIFFUSION_PALLAS_GN"):
        return False
    b, h, w, c = x.shape
    # in+out double-buffered blocks must fit VMEM (~16MB scoped limit)
    if 4 * h * w * c * x.dtype.itemsize > 12 * 1024 * 1024:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _group_stats(x: jax.Array, num_groups: int):
    b, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(b, h * w, num_groups, c // num_groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = jnp.square(xg).mean(axis=(1, 3), keepdims=True) - jnp.square(mean)
    return xg, mean, var


def _plain_group_norm(x, scale, bias, num_groups=32, eps=1e-5):
    b, h, w, c = x.shape
    xg, mean, var = _group_stats(x, num_groups)
    xn = (xg - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, h, w, c)
    out = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
) -> jax.Array:
    """Plain GroupNorm over NHWC, channel groups laid out torch-style
    (channel c belongs to group c // (C/G))."""
    if _pallas_enabled(x):
        from .pallas.groupnorm import group_norm_fused

        return group_norm_fused(x, scale, bias, num_groups=num_groups,
                                eps=eps, silu=False)
    return _plain_group_norm(x, scale, bias, num_groups, eps)


def group_norm_silu(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
) -> jax.Array:
    """GroupNorm followed by SiLU, fused (reference model.py:190)."""
    if _pallas_enabled(x):
        from .pallas.groupnorm import group_norm_fused

        return group_norm_fused(x, scale, bias, num_groups=num_groups,
                                eps=eps, silu=True)
    out = _plain_group_norm(x, scale, bias, num_groups, eps).astype(jnp.float32)
    return (out * jax.nn.sigmoid(out)).astype(x.dtype)


def ada_group_norm_silu(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    emb_scale: jax.Array,
    emb_shift: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
) -> jax.Array:
    """Adaptive GroupNorm: ``SiLU((1 + s) * GN(h) + b)`` with per-example
    (B, C) modulation from the timestep/class embedding.

    Matches reference model.py:199-203 followed by the SiLU at model.py:207.
    """
    if _pallas_enabled(x):
        from .pallas.groupnorm import group_norm_fused

        return group_norm_fused(x, scale, bias, emb_scale, emb_shift,
                                num_groups=num_groups, eps=eps, silu=True)
    out = _plain_group_norm(x, scale, bias, num_groups, eps).astype(jnp.float32)
    out = out * (1.0 + emb_scale[:, None, None, :].astype(jnp.float32)) + (
        emb_shift[:, None, None, :].astype(jnp.float32)
    )
    return (out * jax.nn.sigmoid(out)).astype(x.dtype)
