"""Full-chain NLL (bits/dim) evaluation of a diffusion checkpoint.

The reference has no evaluation metrics ("add proper evaluation metrics" is
an explicit TODO, reference README.md:65); this tool computes the IDDPM
variational bound — total/prior bits-per-dim and the per-timestep VLB and
eps-MSE profiles — over a batch of real or synthetic images, using
Diffusion.bpd (one jitted scan over the chain; see diffusion/process.py).

Usage:
  python tools/eval_nll.py --model_path EMNIST_model.npz \
      [--data images.npz] [--batch_size 16] [--num_batches 4]

--data is an .npz with an array under 'images' (NHWC, uint8 [0,255] or
float [-1,1]) and, for class-conditional models, 'labels'; without --data,
smooth synthetic images with random labels are used (useful for
smoke-evaluating untrained/random checkpoints).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import _env  # noqa: F401,E402  (make JAX_PLATFORMS authoritative before jax init)

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--data", default=None, help=".npz with 'images' (+ 'labels')")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_batches", type=int, default=1)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nicediffusion_tpu.diffusion.process import Diffusion
    from nicediffusion_tpu.models.unet import DiffusionModel
    from nicediffusion_tpu.utils.checkpoint import load_params
    from nicediffusion_tpu.utils.config import preset_for_path

    model_args, diff_args = preset_for_path(args.model_path)
    dtype = jnp.float32 if args.cpu else jnp.bfloat16
    model = DiffusionModel(**model_args, dtype=dtype)
    params = jax.tree.map(jnp.asarray, load_params(args.model_path))
    # bpd evaluates the plain (unguided) model likelihood
    diff_args = dict(diff_args, guidance_method=None, guidance_strength=None)
    diffusion = Diffusion(model=model, **diff_args)

    res, ch = model_args["resolution"], model_args["in_channels"]
    n_cls = model_args["num_classes"]
    rng = np.random.default_rng(args.seed)

    if args.data:
        blob = np.load(args.data)
        images = np.asarray(blob["images"], dtype=np.float32)
        if images.max() > 1.5:  # uint8 range
            images = images / 127.5 - 1.0
        labels = np.asarray(blob["labels"]) if "labels" in blob else None
        if n_cls is not None and labels is None:
            sys.exit(
                f"error: {args.model_path} is class-conditional "
                f"({n_cls} classes) — the conditional likelihood needs the "
                f"true labels; add a 'labels' array to {args.data}"
            )
        need = args.batch_size * args.num_batches
        if len(images) < need:
            sys.exit(
                f"error: --data has {len(images)} images but "
                f"batch_size*num_batches = {need}; lower them"
            )
    else:
        # smooth synthetic images in [-1, 1]
        yy, xx = np.mgrid[0:res, 0:res] / res
        n = args.batch_size * args.num_batches
        phase = rng.uniform(0, 2 * np.pi, size=(n, 1, 1, ch))
        freq = rng.uniform(1, 3, size=(n, 1, 1, ch))
        images = np.sin(
            2 * np.pi * freq * (yy + xx)[None, :, :, None] + phase
        ).astype(np.float32) * 0.8
        labels = (
            rng.integers(0, n_cls, size=(n,)) if n_cls is not None else None
        )

    key = jax.random.PRNGKey(args.seed)
    totals, priors, mses = [], [], []
    for i in range(args.num_batches):
        lo, hi = i * args.batch_size, (i + 1) * args.batch_size
        x0 = jnp.asarray(images[lo:hi])
        y = jnp.asarray(labels[lo:hi]) if labels is not None else None
        key, sub = jax.random.split(key)
        out = diffusion.bpd(params, x0, sub, y=y)
        totals.append(np.asarray(out["total_bpd"]))
        priors.append(np.asarray(out["prior_bpd"]))
        mses.append(np.asarray(out["mse_terms"]).mean(axis=1))

    print(json.dumps({
        "model_path": args.model_path,
        "num_images": int(args.batch_size * args.num_batches),
        "chain_steps": int(diffusion.rescaled_num_steps),
        "total_bpd": float(np.concatenate(totals).mean()),
        "prior_bpd": float(np.concatenate(priors).mean()),
        "eps_mse_mean": float(np.stack(mses).mean()),
    }))


if __name__ == "__main__":
    main()
