"""Microbenchmark: int8 vs bf16 conv/matmul throughput through XLA on TPU.

Answers whether XLA lowers int8 convolutions/matmuls onto the MXU at the
2x-bf16 peak that v5e hardware advertises — the gating question for an int8
quantized serving mode (the only path past the bf16 roofline documented in
BASELINE.md). Uses the chained-scan timing method (see tools/perf_probe.py:
the axon relay lies to naive block_until_ready timing).

Usage: python tools/int8_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _time_chained(make_step, n=20, warm=2):
    """ms per step via an n-deep device-side chain + single scalar fetch."""
    fn = jax.jit(make_step)
    for _ in range(warm):
        float(fn())
    t0 = time.perf_counter()
    float(fn())
    return (time.perf_counter() - t0) / n * 1e3


def bench_matmul(m, k, n, dtype, acc, steps=20):
    flops = 2 * m * k * n

    if dtype == jnp.int8:
        a = jnp.ones((m, k), jnp.int8)
        b = jnp.ones((k, n), jnp.int8)
    else:
        a = jnp.ones((m, k), dtype)
        b = jnp.ones((k, n), dtype)

    def step():
        def body(c, _):
            o = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc
            )
            # fold the result back so the chain has a data dependence
            return c + o[0, 0].astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return c

    ms = _time_chained(step, n=steps)
    return flops / (ms / 1e3) / 1e12


def bench_conv(batch, res, cin, cout, dtype, acc, steps=20):
    flops = 2 * batch * res * res * cin * cout * 9
    x = jnp.ones((batch, res, res, cin), dtype)
    w = jnp.ones((3, 3, cin, cout), dtype)

    def step():
        def body(c, _):
            o = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc,
            )
            return c + o[0, 0, 0, 0].astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return c

    ms = _time_chained(step, n=steps)
    return flops / (ms / 1e3) / 1e12


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    # MXU-friendly large matmul
    for name, dtype, acc in (
        ("bf16xbf16->f32", jnp.bfloat16, jnp.float32),
        ("int8xint8->int32", jnp.int8, jnp.int32),
    ):
        tf = bench_matmul(8192, 4096, 8192, dtype, acc)
        print(f"matmul {name:18s}: {tf:7.1f} TF/s")

    # the UNet's dominant conv shapes (ImageNet-64, batch 64 incl. CFG 2x)
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
