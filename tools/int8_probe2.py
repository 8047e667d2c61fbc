"""Round-3 int8 serving-path experiments: find a conv formulation that
actually realises the MXU's int8 advantage end-to-end.

THE int8 probe (one probe per question, VERDICT r4 #8): this supersedes
and absorbs the removed round-2 tools/int8_probe.py — its op-level
int8-vs-bf16 peak question is re-measured here by section A's per-shape
conv formulations, and its frozen findings (int8 conv 1.07-1.27x bf16,
int8 dot_general ~1.48x) live in BASELINE.md "Round-3: static-scale int8
serving". This probe produced that section's formulation table
(BASELINE.md:~225) and the static-vs-dynamic chain numbers behind
ops/quant.py's static-scale design.

Round-2 findings (BASELINE.md): XLA int8 *convolutions* only reach
1.07-1.27x bf16, while XLA int8 dot_general reaches ~1.48x — and the
dynamic-quant int8 model forward (98.4 vs 119 ms) loses its whole gain
inside the 250-step sampling scan (1.136 vs 1.131 samples/sec). This
probe isolates the two suspects and the two candidate fixes:

  A. per-shape conv formulations, all int8 with int32 accumulation:
       conv      — XLA's conv lowering (round-2 loser)
       9dots     — 3x3 conv as 9 shifted (H*W, Cin) x (Cin, Cout) dots
                   summed in int32 (dot lowering is the int8 fast path)
       im2col    — explicit patch-gather + single (HW, 9Cin) dot
  B. the in-scan residual-pattern chain [GN+SiLU -> conv3x3] x depth:
       bf16                 — baseline
       int8-dyn             — round-2 path: dynamic per-tensor act scale,
                              weights quantized inside the step
       int8-static          — weights pre-quantized OUTSIDE the scan,
                              static activation scale folded into the
                              GN+SiLU epilogue (quant output written int8)

Usage: python tools/int8_probe2.py [quick]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import _env  # noqa: F401,E402  (make JAX_PLATFORMS authoritative before jax init)

import jax
import jax.numpy as jnp
import numpy as np


def _time_chained(fn, args, n, warm=2):
    """ms per step via an n-deep device-side chain + single scalar fetch
    (tools/perf_probe.py method — trustworthy through the axon relay)."""
    jfn = jax.jit(fn)
    for _ in range(warm):
        float(jfn(*args))
    t0 = time.perf_counter()
    float(jfn(*args))
    return (time.perf_counter() - t0) / n * 1e3


# ---------------------------------------------------------------------------
# A. conv formulations (pure int8 in, int32 accum out)
# ---------------------------------------------------------------------------

def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def conv_9dots(x, w):
    """3x3 SAME conv as 9 shifted matmuls, int32 accumulation.

    x int8 [B,H,W,C], w int8 [3,3,C,F]. Shifting is a pad+slice (cheap,
    VPU/copy); each tap is a (B*H*W, C) x (C, F) int8 dot — the lowering
    XLA is actually good at.
    """
    b, h, wd, c = x.shape
    f = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((b, h, wd, f), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.dynamic_slice(
                xp, (0, dy, dx, 0), (b, h, wd, c)
            ).reshape(b * h * wd, c)
            o = jax.lax.dot_general(
                tap, w[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            out = out + o.reshape(b, h, wd, f)
    return out


def conv_im2col(x, w):
    b, h, wd, c = x.shape
    f = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [
            jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, wd, c))
            for dy in range(3)
            for dx in range(3)
        ],
        axis=-1,
    ).reshape(b * h * wd, 9 * c)
    o = jax.lax.dot_general(
        cols, w.reshape(9 * c, f), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return o.reshape(b, h, wd, f)


def bench_formulation(make_conv, batch, res, cin, cout, dtype, steps=16):
    flops = 2 * batch * res * res * cin * cout * 9
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x0 = jnp.asarray(rng.integers(-100, 100, (batch, res, res, cin)), jnp.int8)
        w = jnp.asarray(rng.integers(-100, 100, (3, 3, cin, cout)), jnp.int8)

        def requant(o):
            return jnp.clip(o // 1024, -127, 127).astype(jnp.int8)
    else:
        x0 = jnp.asarray(rng.normal(size=(batch, res, res, cin)), dtype)
        w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), dtype)

        def requant(o):
            return (o * 0.01).astype(dtype)

    def step(x0, w):
        def body(x, _):
            return requant(make_conv(x, w))[..., :cin], None

        x, _ = jax.lax.scan(body, x0, None, length=steps)
        return jnp.sum(x.astype(jnp.float32))

    ms = _time_chained(step, (x0, w), n=steps)
    return flops / (ms / 1e3) / 1e12, ms


# ---------------------------------------------------------------------------
# B. in-scan residual-pattern chain: GN+SiLU -> conv3x3
# ---------------------------------------------------------------------------

def _gn_silu(x, groups=32, eps=1e-5):
    b, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mu = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mu) ** 2).mean(axis=(1, 3), keepdims=True)
    xn = (xg - mu) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, h, w, c)
    return xn * jax.nn.sigmoid(xn)


def bench_chain(mode, batch, res, c, depth=12, conv9=False):
    """mode: bf16 | int8-dyn | int8-static."""
    flops = 2 * batch * res * res * c * c * 9 * depth
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(batch, res, res, c)), jnp.bfloat16)
    w = jnp.asarray(0.05 * rng.normal(size=(3, 3, c, c)), jnp.float32)

    int8conv = conv_9dots if conv9 else conv_xla

    if mode == "bf16":

        def step(x0, w):
            wb = w.astype(jnp.bfloat16)

            def body(x, _):
                h = _gn_silu(x).astype(jnp.bfloat16)
                o = jax.lax.conv_general_dilated(
                    h, wb, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                )
                return o.astype(jnp.bfloat16), None

            x, _ = jax.lax.scan(body, x0, None, length=depth)
            return jnp.sum(x.astype(jnp.float32))

        args = (x0, w)

    elif mode == "int8-dyn":
        from nicediffusion_tpu.ops.quant import int8_conv

        def step(x0, w):
            def body(x, _):
                h = _gn_silu(x).astype(jnp.bfloat16)
                o = int8_conv(h, w, out_dtype=jnp.bfloat16)
                return o, None

            x, _ = jax.lax.scan(body, x0, None, length=depth)
            return jnp.sum(x.astype(jnp.float32))

        args = (x0, w)

    else:  # int8-static: pre-quantized weights + static act scale fused
        from nicediffusion_tpu.ops.quant import quantize_weight_channelwise

        w_q, s_w = quantize_weight_channelwise(w, axis=-1)
        # GN+SiLU output range is bounded: min of x*sigmoid(x) is ~-0.2785,
        # and normalized activations rarely exceed ~6 sigma. static scale:
        s_x = jnp.float32(6.0 / 127.0)

        def step(x0, w_q, s_w):
            deq = (s_x * s_w).astype(jnp.float32)

            def body(x, _):
                h = _gn_silu(x)  # f32
                h_q = jnp.clip(
                    jnp.round(h * (1.0 / s_x)), -127, 127
                ).astype(jnp.int8)
                o = int8conv(h_q, w_q)
                return (o.astype(jnp.float32) * deq).astype(jnp.bfloat16), None

            x, _ = jax.lax.scan(body, x0, None, length=depth)
            return jnp.sum(x.astype(jnp.float32))

        args = (x0, w_q, s_w)

    ms = _time_chained(step, args, n=depth)
    return flops / (ms / 1e3) / 1e12, ms


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")

    shapes = [(64, 64, 192, 192), (64, 32, 384, 384), (64, 16, 576, 576),
              (64, 8, 768, 768)]
    if quick:
        shapes = shapes[:2]

    print("\n-- A. int8 conv formulations (TF/s; bf16 XLA conv for scale) --")
    for batch, res, cin, cout in shapes:
        row = [f"conv3x3 {res}x{res}x{cin}->{cout}:"]
        tf, _ = bench_formulation(
            lambda x, w: jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ),
            batch, res, cin, cout, jnp.bfloat16,
        )
        row.append(f"bf16conv {tf:6.1f}")
        for name, f in (("conv", conv_xla), ("9dots", conv_9dots),
                        ("im2col", conv_im2col)):
            try:
                tf, _ = bench_formulation(f, batch, res, cin, cout, jnp.int8)
                row.append(f"int8-{name} {tf:6.1f}")
            except Exception as e:  # noqa: BLE001
                row.append(f"int8-{name} FAIL({type(e).__name__})")
        print("  ".join(row))

    print("\n-- B. in-scan [GN+SiLU -> conv] chain (ms per block) --")
    for batch, res, c in [(64, 64, 192), (64, 32, 384), (64, 16, 576)]:
        if quick and res < 32:
            continue
        row = [f"chain {res}x{res}x{c}:"]
        for mode in ("bf16", "int8-dyn", "int8-static"):
            tf, ms = bench_chain(mode, batch, res, c)
            row.append(f"{mode} {ms:6.2f}ms {tf:5.1f}TF/s")
        tf, ms = bench_chain("int8-static", batch, res, c, conv9=True)
        row.append(f"int8-static-9dots {ms:6.2f}ms {tf:5.1f}TF/s")
        print("  ".join(row))


if __name__ == "__main__":
    main()
