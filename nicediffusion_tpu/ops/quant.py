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

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "quantize_weight_channelwise",
    "quantize_activation",
    "int8_conv",
    "int8_dense",
    "int8_conv_static",
    "int8_dense_static",
    "static_quant_triple",
    "merge_calibrations",
    "collect_calibration",
    "freeze_int8",
    "build_int8_variables",
    "calibration_inputs",
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


def int8_conv_static(x, w_q, inv_act_scale, deq, bias=None, stride: int = 1,
                     out_dtype=None):
    """Static-scale int8 conv: the round-3 serving fast path.

    Unlike `int8_conv` (dynamic per-tensor activation scale computed with a
    full absmax reduce every call), the activation scale here is a
    CALIBRATED constant and the weights arrive already quantized — so the
    only per-call work beyond the int8 MXU conv is an elementwise
    round/clip that XLA fuses into the producing op's epilogue (the GN/SiLU
    that precedes every conv in the UNet). Measured on a v5e chip this is
    what actually preserves the int8 gain in-scan: 3.39 vs 4.21 ms bf16 per
    GN+SiLU+conv block at 64x64x192 (tools/int8_probe2.py), where the
    dynamic path's absmax pass gave back half the win.

    Args: x float NHWC; w_q int8 HWIO; inv_act_scale scalar f32
    (1/act_scale); deq f32 [Cout] = act_scale * weight_scale.
    """
    out_dtype = out_dtype or x.dtype
    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) * inv_act_scale), -127, 127
    ).astype(jnp.int8)
    kh, kw = w_q.shape[0], w_q.shape[1]
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    o = jax.lax.conv_general_dilated(
        x_q, w_q, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    o = o.astype(jnp.float32) * deq
    if bias is not None:
        o = o + bias.astype(jnp.float32)
    return o.astype(out_dtype)


def merge_calibrations(calibs):
    """Merge per-run 'calib' collections (sow tuples) into one pytree of
    scalar absmax leaves, taking the max across runs."""

    def _leaf(*vals):
        flat = [
            v
            for tup in vals
            for v in (tup if isinstance(tup, tuple) else (tup,))
        ]
        return functools.reduce(jnp.maximum, flat)

    return jax.tree.map(
        _leaf, *calibs, is_leaf=lambda x: isinstance(x, tuple)
    )


def collect_calibration(model, params, sample_inputs):
    """Float forwards with ``mutable=['calib']`` over ``sample_inputs``:
    every Int8Conv/Int8Dense records the absmax of its input activation
    (models/unet.py). Returns the merged absmax pytree — one f32 scalar per
    quantized layer, a few KB even for the 553.8M preset — which is the
    thing worth PERSISTING between serving runs (`save_params_npz(calib,
    path)` / `load_params(path)`): reloading it skips the full-chain
    calibration draw on the next invocation."""
    sample_inputs = list(sample_inputs)
    assert sample_inputs, "need at least one calibration input"

    # jitted pass: eager flax apply on a 295M UNet dispatches thousands
    # of individual ops (pathological through the TPU relay)
    @jax.jit
    def calib_pass(p, x, t, y):
        _, st = model.apply({"params": p}, x, t, y, mutable=["calib"])
        return st["calib"]

    return merge_calibrations(
        [calib_pass(params, x, t, y) for x, t, y in sample_inputs]
    )


def freeze_int8(model, params, calib, example_input=None):
    """One forward with the merged stats and ``mutable=['quant']``: every
    Int8Conv/Int8Dense quantizes its weights per output channel and freezes
    {kernel_q int8, inv_act f32 scalar, deq f32 [Cout]}.

    ``example_input`` is an (x, mapped_t, y) triple fixing the trace
    shapes; values are irrelevant to the frozen constants, so when omitted
    a batch-1 zero input is synthesized from the model config.

    Returns the full serving variables dict ``{"params": ..., "quant": ...}``
    to pass wherever a params pytree is accepted (Diffusion.denoise and
    friends unwrap it — diffusion/process.py _variables).
    """
    if example_input is None:
        x = jnp.zeros(
            (1, model.resolution, model.resolution, model.in_channels),
            jnp.float32,
        )
        t = jnp.zeros((1,), jnp.int32)
        y = (
            jnp.zeros((1,), jnp.int32)
            if getattr(model, "num_classes", None) else None
        )
        example_input = (x, t, y)

    @jax.jit
    def freeze_pass(p, calib, x, t, y):
        _, qvars = model.apply(
            {"params": p, "calib": calib}, x, t, y, mutable=["quant"]
        )
        return qvars["quant"]

    x, t, y = example_input
    return {"params": params, "quant": freeze_pass(params, calib, x, t, y)}


def build_int8_variables(model, params, sample_inputs=None, calib=None):
    """Calibrate (or reuse a saved calibration) and freeze int8 serving.

    Either pass ``sample_inputs`` (an iterable of ``(x, mapped_t, y)``
    model inputs drawn from the sampling distribution — see
    `calibration_inputs`) to calibrate from scratch, or pass ``calib`` (a
    merged absmax pytree from `collect_calibration`, possibly reloaded
    from disk) to skip straight to the freeze.
    """
    example = None
    if calib is None:
        sample_inputs = list(sample_inputs)
        calib = collect_calibration(model, params, sample_inputs)
        example = sample_inputs[0]
    return freeze_int8(model, params, calib, example)


def calibration_inputs(diffusion, params, rng, y=None, batch_size=8,
                       num_points=6, x0=None):
    """Model inputs spanning the sampling chain for int8 calibration.

    Draws one sample batch through ``diffusion`` itself (the dynamic-quant
    path when the model is quantized — accurate enough for activation-range
    statistics), then q-samples it back to ``num_points`` evenly spaced
    rescaled timesteps — covering the actual marginal distribution of x_t
    the quantized sampler will see (plus the pure-noise endpoint). Inputs
    are CFG-doubled when the diffusion is classifier-free-guided, matching
    serving batch statistics. Pass ``x0`` to skip the sample draw (e.g. a
    batch of real training images). Returns a list of (x, mapped_t, y)
    tuples for `build_int8_variables`.
    """
    if x0 is None:
        rng, sample_rng = jax.random.split(rng)
        x0 = diffusion.denoise(params, sample_rng, y=y, batch_size=batch_size)
    else:
        batch_size = x0.shape[0]

    n = diffusion.rescaled_num_steps
    ts = [int(round(i * (n - 1) / max(num_points - 1, 1)))
          for i in range(num_points)]
    inputs = []
    for ti in sorted(set(ts)):
        rng, noise_rng = jax.random.split(rng)
        t = jnp.full((batch_size,), ti, dtype=jnp.int32)
        if ti == n - 1:  # chain start: pure noise, as denoise() draws it
            x_t = jax.random.normal(noise_rng, x0.shape, dtype=jnp.float32)
        else:
            noise = jax.random.normal(noise_rng, x0.shape, dtype=x0.dtype)
            x_t = diffusion.q_sample(x0, t, noise)
        mapped = jnp.take(diffusion.timestep_map, t)
        if diffusion.guidance == "classifier_free":
            x_t = jnp.concatenate([x_t, x_t], axis=0)
            mapped = jnp.concatenate([mapped, mapped], axis=0)
            yy = jnp.concatenate([y, jnp.zeros_like(y)], axis=0)
        else:
            yy = y
        inputs.append((x_t, mapped, yy))
    return inputs


def static_quant_triple(kernel, absmax, axis: int = -1):
    """Calibrated freeze shared by Int8Conv/Int8Dense (models/unet.py):
    per-output-channel int8 weights + a static activation scale from the
    calibration absmax, as the 'quant'-collection triple
    ``(kernel_q int8, inv_act f32 scalar, deq f32 [Cout])``.

    This is THE single place the calibration convention lives (the 1e-6
    absmax clamp, the /127 symmetric range, the act*weight dequant fold) —
    conv and dense quantization must never diverge on it.
    """
    if isinstance(absmax, tuple):  # flax sow stores tuples
        absmax = absmax[0]
    act_scale = jnp.maximum(jnp.asarray(absmax, jnp.float32), 1e-6) / 127.0
    w_q, s_w = quantize_weight_channelwise(kernel, axis=axis)
    return w_q, 1.0 / act_scale, s_w * act_scale


def int8_dense_static(x, w_q, inv_act_scale, deq, bias=None, out_dtype=None):
    """Static-scale int8 dense: the serving fast path for the attention
    qkv/output projections (dense analogue of `int8_conv_static` — same
    calibrated-constant activation scale, pre-quantized weights, int32
    MXU accumulation, f32 dequant epilogue)."""
    out_dtype = out_dtype or x.dtype
    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) * inv_act_scale), -127, 127
    ).astype(jnp.int8)
    o = jax.lax.dot_general(
        x_q, w_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o = o.astype(jnp.float32) * deq
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
