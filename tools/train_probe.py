"""Training-throughput probe: ImageNet-64 (295.9M UNet) images/sec/chip.

Reproduces the BASELINE.md training number (hybrid loss, AdamW + EMA,
bf16 compute, batch 32/chip). Completion is forced with a scalar fetch
(tools/perf_probe.py methodology — block_until_ready can return early
through the axon relay).

Usage: python tools/train_probe.py [batch] [--remat] [--loop]

--loop times the REAL `Trainer.train` loop (logging enabled, JSONL sink)
instead of bare `_train_step` calls — the number that exercises the
log-boundary loss fetch (device-side accumulation; a per-step float()
would stall the dispatch pipeline).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import _env  # noqa: F401,E402  (make JAX_PLATFORMS authoritative before jax init)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 32
    remat = "--remat" in sys.argv
    loop = "--loop" in sys.argv

    from nicediffusion_tpu.models.unet import DiffusionModel
    from nicediffusion_tpu.training.data import synthetic_batches
    from nicediffusion_tpu.training.trainer import Trainer
    from nicediffusion_tpu.utils.config import DIFFUSION_PRESETS, MODEL_PRESETS

    mcfg = dict(MODEL_PRESETS["openai_64"])
    mcfg["num_classes"] += 1  # null class (classifier-free training)
    model = DiffusionModel(**mcfg, dtype=jnp.bfloat16, use_remat=remat)
    dcfg = dict(DIFFUSION_PRESETS["openai_64"])
    dcfg.update(use_ddim=False, ddim_eta=None,
                guidance_method="classifier_free", guidance_strength=0.8,
                rescaled_num_steps=1000)

    loader = synthetic_batches(
        batch_size=batch, resolution=64, channels=3, num_classes=1001
    )
    trainer = Trainer(
        model=model, diffusion_args=dcfg, dataloader=loader, iterations=0,
        batch_size=batch, lr=1e-4, weight_decay=0.0,
        checkpoint_dir="/tmp/train_probe_ckpt",
    )

    if loop:
        # the REAL Trainer.train loop with the JSONL metrics sink on
        # (log_every=10 default): includes data feed, rng split, logging —
        # the path whose per-step host sync VERDICT r3 #5 flagged
        import tempfile

        metrics_path = os.path.join(tempfile.mkdtemp(), "metrics.jsonl")
        trainer.metrics_path = metrics_path
        trainer.save = lambda *a, **k: None  # probe: don't time checkpoints
        trainer.iterations = 1
        trainer.train()  # compile + first step
        n = 30
        trainer.iterations = n  # train() iterates range(iterations) anew
        t0 = time.perf_counter()
        trainer.train()
        dt = (time.perf_counter() - t0) / n
        print(
            f"batch {batch} remat={remat} [train() loop, JSONL logging]: "
            f"{batch / dt:.1f} images/sec/chip ({dt * 1e3:.1f} ms/step)"
        )
        return

    b, l = trainer._shard_batch(*next(trainer.loader))
    rng = jax.random.PRNGKey(0)
    state, metrics = trainer._train_step(trainer.state, b, l, rng)
    float(metrics["loss"])  # compile + force

    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = trainer._train_step(
            state, b, l, jax.random.fold_in(rng, i)
        )
    loss = float(metrics["loss"])  # scalar fetch forces the queue
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(loss), loss
    print(
        f"batch {batch} remat={remat}: {batch / dt:.1f} images/sec/chip "
        f"({dt * 1e3:.1f} ms/step, loss {loss:.4f})"
    )


if __name__ == "__main__":
    main()
