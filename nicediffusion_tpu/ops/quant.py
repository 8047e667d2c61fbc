"""int8 quantization primitives for the serving fast path.

TPU v5e's MXU executes int8 x int8 -> int32 at 2x the bf16 FLOP rate — the
only way past the bf16 roofline documented in BASELINE.md (100% bf16 MXU
caps the 250-step CFG sampler at ~1.87 samples/sec/chip). The serving mode
quantizes conv/dense weights per output channel (symmetric) and activations
dynamically per tensor, accumulates in int32, and dequantizes into the
f32/bf16 epilogue. Opt-in and lossy: parity tests bound the error
statistically, not bitwise; training always runs bf16/f32.

No reference analogue (the reference is fp32 eager torch end-to-end;
SURVEY.md §6) — this is new TPU-native scope.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "quantize_weight_channelwise",
    "quantize_activation",
    "int8_conv",
    "int8_dense",
]


def quantize_weight_channelwise(w: jax.Array, axis: int = -1):
    """Symmetric per-output-channel int8 quantization.

    Returns (w_q int8, scale f32 of shape w.shape[axis]) with
    w ~= w_q * scale broadcast along `axis`.
    """
    w = w.astype(jnp.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis % w.ndim)
    absmax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale.reshape((w.shape[axis % w.ndim],))


def quantize_activation(x: jax.Array):
    """Dynamic symmetric per-tensor int8 quantization of an activation."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)
    return x_q, scale


def int8_conv(x, w, bias=None, stride: int = 1, out_dtype=None):
    """3x3/1x1 'SAME' conv with int8 inputs x int8 weights -> int32 MXU
    accumulation, dequantized into `out_dtype` (default: x.dtype).

    x is an unquantized NHWC activation; w an unquantized HWIO kernel. Both
    are quantized here (weights per output channel, activations per tensor)
    so XLA can constant-fold or hoist the weight quantization when `w` is a
    loop constant.
    """
    out_dtype = out_dtype or x.dtype
    x_q, s_x = quantize_activation(x)
    w_q, s_w = quantize_weight_channelwise(w, axis=-1)
    kh = w.shape[0]
    pad = ((kh // 2, kh // 2), (w.shape[1] // 2, w.shape[1] // 2))
    o = jax.lax.conv_general_dilated(
        x_q, w_q, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    o = o.astype(jnp.float32) * (s_x * s_w)
    if bias is not None:
        o = o + bias.astype(jnp.float32)
    return o.astype(out_dtype)


def int8_dense(x, w, bias=None, out_dtype=None):
    """(..., I) x (I, O) int8 matmul with int32 accumulation, dequantized."""
    out_dtype = out_dtype or x.dtype
    x_q, s_x = quantize_activation(x)
    w_q, s_w = quantize_weight_channelwise(w, axis=-1)
    o = jax.lax.dot_general(
        x_q, w_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o = o.astype(jnp.float32) * (s_x * s_w)
    if bias is not None:
        o = o + bias.astype(jnp.float32)
    return o.astype(out_dtype)
