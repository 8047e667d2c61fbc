"""Micro-benchmark of the flagship UNet forward under different configs.

Usage: python tools/perf_probe.py [batch ...]
Prints ms/call and TFLOP/s for each (batch, dtype, param-dtype) variant.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time

import jax
import jax.numpy as jnp
import numpy as np

from nicediffusion_tpu.models.unet import DiffusionModel
from nicediffusion_tpu.utils.config import MODEL_PRESETS


def bench_fwd(model, params, batch, n=20):
    x = jnp.zeros((batch, 64, 64, 3), dtype=jnp.bfloat16)
    t = jnp.full((batch,), 500, dtype=jnp.int32)
    y = jnp.zeros((batch,), dtype=jnp.int32)

    fn = jax.jit(lambda p, x, t, y: model.apply({"params": p}, x, t, y))
    lowered = fn.lower(params, x, t, y).compile()
    flops = lowered.cost_analysis().get("flops", 0.0)
    out = fn(params, x, t, y); out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(params, x, t, y)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    return dt * 1e3, flops / dt / 1e12, flops


def main():
    batches = [int(b) for b in sys.argv[1:]] or [32, 64, 128]
    mcfg = dict(MODEL_PRESETS["openai_64"])
    model = DiffusionModel(**mcfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32),
        )
    )["params"]
    params32 = jax.tree.map(
        lambda s: (jnp.arange(np.prod(s.shape), dtype=jnp.float32) % 97 / 9700.0
                   ).reshape(s.shape).astype(s.dtype), shapes)
    params16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params32)

    for b in batches:
        ms, tf, fl = bench_fwd(model, params32, b)
        print(f"batch {b:4d} f32-params: {ms:8.2f} ms  {tf:6.1f} TF/s  ({fl/b/1e9:.1f} GF/img)")
        ms, tf, fl = bench_fwd(model, params16, b)
        print(f"batch {b:4d} b16-params: {ms:8.2f} ms  {tf:6.1f} TF/s")


if __name__ == "__main__":
    main()
