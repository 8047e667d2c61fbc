"""Microbenchmark: int8 vs bf16 conv/matmul throughput through XLA on TPU.

Answers whether XLA reaches the MXU's 2x-bf16 int8 peak — the gating
question for an int8 quantized serving mode (the only path past the bf16
roofline documented in BASELINE.md).

Measurement notes:
  * chained-scan timing (tools/perf_probe.py): the axon relay lies to naive
    block_until_ready timing, so we chain N ops device-side and fetch one
    scalar.
  * the chain must be FULLY data-dependent: feeding only `o[0, 0]` forward
    lets XLA rewrite slice-of-dot into dot-of-slices and report >peak
    numbers (observed 411 TF/s on a ~197 TF/s chip). Here each step's whole
    output becomes the next step's input.

Usage: python tools/int8_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import _env  # noqa: F401,E402  (make JAX_PLATFORMS authoritative before jax init)

import jax
import jax.numpy as jnp
import numpy as np


def _time_chained(fn, args, n, warm=2):
    """ms per step via an n-deep device-side chain + single scalar fetch."""
    jfn = jax.jit(fn)
    for _ in range(warm):
        float(jfn(*args))
    t0 = time.perf_counter()
    float(jfn(*args))
    return (time.perf_counter() - t0) / n * 1e3


def _requant(o, dtype):
    """Cast a wide accumulator back to the chain's input dtype with full
    data dependence."""
    if dtype == jnp.int8:
        return jnp.clip(o // 1024, -127, 127).astype(jnp.int8)
    return (o * 0.01).astype(dtype)


def bench_matmul(m, k, dtype, acc, steps=20):
    """Square chain x <- requant(x @ b), x (m, k), b (k, k)."""
    flops = 2 * m * k * k
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x0 = jnp.asarray(rng.integers(-100, 100, (m, k)), jnp.int8)
        b = jnp.asarray(rng.integers(-100, 100, (k, k)), jnp.int8)
    else:
        x0 = jnp.asarray(rng.normal(size=(m, k)), dtype)
        b = jnp.asarray(rng.normal(size=(k, k)), dtype)

    def step(x0, b):
        def body(x, _):
            o = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())), preferred_element_type=acc
            )
            return _requant(o, dtype), None

        x, _ = jax.lax.scan(body, x0, None, length=steps)
        return jnp.sum(x.astype(jnp.float32))

    ms = _time_chained(step, (x0, b), n=steps)
    return flops / (ms / 1e3) / 1e12


def bench_conv(batch, res, cin, cout, dtype, acc, steps=20):
    """Chain x <- requant(conv(x, w))[..., :cin]."""
    flops = 2 * batch * res * res * cin * cout * 9
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x0 = jnp.asarray(
            rng.integers(-100, 100, (batch, res, res, cin)), jnp.int8
        )
        w = jnp.asarray(rng.integers(-100, 100, (3, 3, cin, cout)), jnp.int8)
    else:
        x0 = jnp.asarray(rng.normal(size=(batch, res, res, cin)), dtype)
        w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), dtype)

    def step(x0, w):
        def body(x, _):
            o = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc,
            )
            return _requant(o, dtype)[..., :cin], None

        x, _ = jax.lax.scan(body, x0, None, length=steps)
        return jnp.sum(x.astype(jnp.float32))

    ms = _time_chained(step, (x0, w), n=steps)
    return flops / (ms / 1e3) / 1e12


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    for name, dtype, acc in (
        ("bf16->f32 ", jnp.bfloat16, jnp.float32),
        ("int8->int32", jnp.int8, jnp.int32),
    ):
        tf = bench_matmul(8192, 4096, dtype, acc)
        print(f"matmul 8192x4096x4096 {name}: {tf:7.1f} TF/s")
        # implicit-GEMM shape of the 64x64x192 conv: M=B*H*W, K=9*Cin
        tf = bench_matmul(64 * 64 * 64, 1728, dtype, acc)
        print(f"matmul 262144x1728x1728 {name}: {tf:7.1f} TF/s")

    for batch, res, cin, cout in (
        (64, 64, 192, 192),
        (64, 32, 384, 384),
        (64, 16, 576, 576),
        (64, 8, 768, 768),
    ):
        for name, dtype, acc in (
            ("bf16", jnp.bfloat16, jnp.float32),
            ("int8", jnp.int8, jnp.int32),
        ):
            try:
                tf = bench_conv(batch, res, cin, cout, dtype, acc)
                print(
                    f"conv3x3 {res}x{res}x{cin}->{cout} {name}: {tf:7.1f} TF/s"
                )
            except Exception as e:  # noqa: BLE001 — report lowering failures
                print(
                    f"conv3x3 {res}x{res}x{cin}->{cout} {name}: FAILED "
                    f"({type(e).__name__}: {str(e)[:120]})"
                )


if __name__ == "__main__":
    main()
