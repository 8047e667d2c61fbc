"""Micro-benchmark of the flagship UNet forward.

IMPORTANT measurement note for this environment: the axon TPU relay makes
`block_until_ready()` return before device execution completes, so naive
timing reports absurd throughput. The trustworthy method (used here) chains
N forwards device-side in a lax.scan and fetches a single scalar — the fetch
forces real completion, and dividing by N amortises the transfer latency.

Usage: python tools/perf_probe.py [batch ...]
Prints ms/forward and sustained TF/s per batch size.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import _env  # noqa: F401,E402  (make JAX_PLATFORMS authoritative before jax init)

import jax
import jax.numpy as jnp
import numpy as np

from nicediffusion_tpu.models.unet import DiffusionModel
from nicediffusion_tpu.utils.config import MODEL_PRESETS


def chained_time(model, params, batch, n=5):
    """ms per forward via an n-deep device-side chain + scalar fetch."""

    def chained(p, x, t, y):
        def body(c, _):
            o = model.apply({"params": p}, c, t, y)
            return o[..., :3].astype(jnp.bfloat16), None

        c, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c.astype(jnp.float32))

    fn = jax.jit(chained)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (batch, 64, 64, 3), dtype=jnp.bfloat16
    )
    t = jnp.full((batch,), 500, jnp.int32)
    y = jnp.zeros((batch,), jnp.int32)
    float(fn(params, x, t, y))  # compile + warm
    t0 = time.perf_counter()
    float(fn(params, x, t, y))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    batches = [int(b) for b in sys.argv[1:]] or [32, 64]
    model = DiffusionModel(**MODEL_PRESETS["openai_64"], dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32),
        )
    )["params"]
    params = jax.tree.map(
        lambda s: (
            jnp.arange(np.prod(s.shape), dtype=jnp.float32) % 97 / 9700.0
        ).reshape(s.shape).astype(s.dtype),
        shapes,
    )
    flops_per_img = 211e9  # cost_analysis of one forward (BASELINE.md)
    for b in batches:
        ms = chained_time(model, params, b)
        tf = flops_per_img * b / (ms / 1e3) / 1e12
        print(f"batch {b:4d}: {ms:7.1f} ms/fwd  {ms / b:5.2f} ms/img  {tf:6.1f} TF/s")


if __name__ == "__main__":
    main()
