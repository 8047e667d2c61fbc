"""Device-trace op accounting for one UNet forward (bf16 or int8 serving).

Captures a jax.profiler trace of the batch-64 ImageNet-64 forward and sums
device-stream op durations bucketed by op-name head — the methodology
behind BASELINE.md's roofline table, packaged as a tool.

Usage:
  python tools/trace_buckets.py [int8] [batch]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import _env  # noqa: F401,E402  (make JAX_PLATFORMS authoritative before jax init)

import jax
import jax.numpy as jnp
import numpy as np


def capture(quantized: bool, batch: int):
    from nicediffusion_tpu.diffusion.process import Diffusion
    from nicediffusion_tpu.models.unet import DiffusionModel
    from nicediffusion_tpu.utils.config import DIFFUSION_PRESETS, MODEL_PRESETS

    mcfg = dict(MODEL_PRESETS["openai_64"])
    mcfg["num_classes"] += 1
    model = DiffusionModel(
        **mcfg, dtype=jnp.bfloat16, quantized=quantized
    )
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        )
    )["params"]
    params = jax.tree.map(
        lambda s: (jnp.arange(np.prod(s.shape), dtype=jnp.float32) % 97 / 9700.0
                   ).reshape(s.shape).astype(s.dtype),
        shapes,
    )
    variables = {"params": params}
    if quantized:
        from nicediffusion_tpu.ops.quant import (
            build_int8_variables, calibration_inputs,
        )

        dcfg = dict(DIFFUSION_PRESETS["openai_64"])
        dcfg.update(rescaled_num_steps=25, sampler="ddim", use_ddim=True,
                    ddim_eta=0.0, guidance_method="classifier_free",
                    guidance_strength=0.8)
        diffusion = Diffusion(model=model, **dcfg)
        y8 = jnp.arange(8, dtype=jnp.int32)
        variables = build_int8_variables(
            model, params,
            calibration_inputs(diffusion, params, jax.random.PRNGKey(7),
                               y=y8, batch_size=8),
        )

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 64, 64, 3))
    t = jnp.full((batch,), 500, jnp.int32)
    y = jnp.arange(batch, dtype=jnp.int32) % 1000

    fwd = jax.jit(lambda v, x, t, y: model.apply(v, x, t, y))
    float(jnp.mean(fwd(variables, x, t, y)))  # compile + warm

    logdir = f"/tmp/trace_{'int8' if quantized else 'bf16'}"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        out = fwd(variables, x, t, y)
    float(jnp.mean(out))
    jax.profiler.stop_trace()
    return logdir


def bucket(logdir: str, runs: int = 3):
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {logdir}"
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as fh:
        trace = json.load(fh)
    events = trace["traceEvents"]
    # device-stream complete events only (those carry device op names)
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "args" in e
    }
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower()
    }
    sums = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0) / 1e3 / runs  # us -> ms, per run
        name = e.get("name", "?")
        head = name.split(".")[0].split("(")[0]
        # strip trailing digits: fusion.123 -> fusion
        head = head.rstrip("0123456789").rstrip("-_")
        sums[head] += dur
        total += dur
    print(f"total device time per forward: {total:.2f} ms")
    for name, ms in sorted(sums.items(), key=lambda kv: -kv[1])[:18]:
        print(f"  {name:<40s} {ms:8.3f} ms  ({100 * ms / total:4.1f}%)")


def main():
    quantized = "int8" in sys.argv[1:]
    batch = next(
        (int(a) for a in sys.argv[1:] if a.isdigit()), 64
    )
    print(f"mode={'int8' if quantized else 'bf16'} batch={batch}")
    logdir = capture(quantized, batch)
    bucket(logdir)


if __name__ == "__main__":
    main()
