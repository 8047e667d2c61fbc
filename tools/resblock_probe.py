"""On-chip probe: fused GN+SiLU+conv3x3 Pallas kernel vs the XLA composite.

Measures the residual-block hot pattern (ops/pallas/resblock.py header) at
the four ImageNet-64 UNet level shapes, batch 64, bf16, plain and AdaGN
modes, with chained-scan timing (tools/perf_probe.py method).

Usage: python tools/resblock_probe.py [quick]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import _env  # noqa: F401,E402  (make JAX_PLATFORMS authoritative before jax init)

import jax
import jax.numpy as jnp
import numpy as np

from nicediffusion_tpu.ops.pallas.resblock import (
    gn_silu_conv3x3,
    gn_silu_conv3x3_reference,
)


def _time_chained(fn, args, n, warm=2):
    jfn = jax.jit(fn)
    for _ in range(warm):
        float(jfn(*args))
    t0 = time.perf_counter()
    float(jfn(*args))
    return (time.perf_counter() - t0) / n * 1e3


def bench(batch, res, c, f, ada, fused, depth=10, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(batch, res, res, c)), dtype)
    gamma = jnp.asarray(1 + 0.1 * rng.normal(size=(c,)), jnp.float32)
    beta = jnp.asarray(0.1 * rng.normal(size=(c,)), jnp.float32)
    # f == c so the chain composes; zero-mean smallish weights keep finite
    w = jnp.asarray(0.03 * rng.normal(size=(3, 3, c, f)), dtype)
    b = jnp.asarray(0.1 * rng.normal(size=(f,)), jnp.float32)
    es = jnp.asarray(0.2 * rng.normal(size=(batch, c)), dtype)
    eb = jnp.asarray(0.2 * rng.normal(size=(batch, c)), dtype)

    op = gn_silu_conv3x3 if fused else (
        lambda x, gamma, beta, w, b, es=None, eb=None: gn_silu_conv3x3_reference(
            x, gamma, beta, es, eb, w, b, ada=es is not None
        )
    )

    def step(x0, w):
        def body(x, _):
            if ada:
                o = op(x, gamma, beta, w, b, es=es, eb=eb)
            else:
                o = op(x, gamma, beta, w, b)
            return o.astype(dtype), None

        x, _ = jax.lax.scan(body, x0, None, length=depth)
        return jnp.sum(x.astype(jnp.float32))

    ms = _time_chained(step, (x0, w), n=depth)
    flops = 2 * batch * res * res * c * f * 9
    return ms, flops / (ms / 1e3) / 1e12


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    shapes = [(64, 64, 192), (64, 32, 384), (64, 16, 576), (64, 8, 768)]
    if quick:
        shapes = shapes[:2]
    for batch, res, c in shapes:
        for ada in (False, True):
            row = [f"{res}x{res}x{c} {'ada ' if ada else 'plain'}:"]
            for fused in (False, True):
                try:
                    ms, tf = bench(batch, res, c, c, ada, fused)
                    row.append(
                        f"{'pallas' if fused else 'xla'} {ms:6.2f}ms {tf:5.1f}TF/s"
                    )
                except Exception as e:  # noqa: BLE001
                    row.append(
                        f"{'pallas' if fused else 'xla'} FAIL({type(e).__name__}: "
                        f"{str(e)[:80]})"
                    )
            print("  ".join(row))


if __name__ == "__main__":
    main()
