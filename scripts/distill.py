"""Distillation CLI — guided (stage 1) and/or progressive step-halving.

Capability extension (no reference analogue). `--distill_guidance [W]`
first bakes classifier-free guidance into a single-forward student (Meng
et al. 2210.03142 — halves the per-step serving cost); each `--rounds`
halving round then trains a student initialised from the teacher to match
two teacher DDIM steps in one (Salimans & Ho 2202.00512, see
training/distill.py for the math).

Usage:
  python scripts/distill.py --model_path 64x64_diffusion.pt \
      [--distill_guidance [W]] [--rounds 2] [--iterations 2000] \
      [--lr 1e-4] [--batch_size 32] [--data images.npz] \
      [--save_path distilled.npz] [--cpu] [-w]

Data: an .npz with 'images' (+ 'labels' for conditional models), or
synthetic smooth images as a smoke fallback. The distilled checkpoint
samples with `--sampler ddim` (or dpm++) at rescaled_num_steps / 2**rounds.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--rounds", type=int, default=1)
    p.add_argument("--steps", type=int, default=None,
                   help="teacher step count to start from (must be "
                        "halvable --rounds times; overrides the preset's, "
                        "which may be odd)")
    p.add_argument("--iterations", type=int, default=2000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_schedule", default="warmup_cosine",
                   choices=("constant", "warmup_cosine"))
    p.add_argument("--grad_clip", type=float, default=1.0,
                   help="global-norm gradient clip (0 disables)")
    p.add_argument("--loss_space", default=None, choices=("eps", "x0_snr"),
                   help="loss conditioning; default = each stage's measured "
                        "optimum (stage 1: eps-MSE for eps students, stage "
                        "2: the papers' truncated-SNR x0 loss; v students "
                        "always get the bounded x0_snr weighting — see "
                        "training/distill.py docstring)")
    p.add_argument("--student_pred", default=None, choices=("eps", "v"),
                   help="student output convention. 'v' with "
                        "--distill_guidance reparameterises the checkpoint "
                        "to v-prediction during stage 1 (Salimans & Ho "
                        "App. D — the stable choice for few-step students); "
                        "halving rounds then run natively in v-space")
    p.add_argument("--var_weight", type=float, default=None,
                   help="train the student's learned-variance head too "
                        "(stage 1: match the guided teacher's variance; "
                        "halving rounds: VLB on the student grid) so "
                        "distilled students can sample stochastic DDPM. "
                        "Try 1.0; default off")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--data", default=None)
    p.add_argument("--save_path", default="distilled.npz")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--prediction_type", type=str, default="eps",
                   choices=("eps", "v"),
                   help="model output convention of the teacher checkpoint")
    p.add_argument("--distill_guidance", type=float, nargs="?", const=-1.0,
                   default=None, metavar="W",
                   help="stage-1 guided distillation (arXiv:2210.03142): "
                        "first bake classifier-free guidance at strength W "
                        "into a single-forward student (halves the serving "
                        "cost per step), then run the halving rounds on it. "
                        "Bare flag uses the preset's guidance_strength; "
                        "requires a classifier-free checkpoint (null class "
                        "0). With --rounds 0, runs stage 1 alone.")
    p.add_argument("--num_classes", type=int, default=None,
                   help="override the preset's class count (the reference's "
                        "EMNIST trainer used 28 = 27 letters + CFG null "
                        "while its preset says 27 — README 'Deliberate "
                        "divergences' #5; checkpoints trained that way need "
                        "--num_classes 28 here, as in the sampling CLI)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("-w", "--wordy", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nicediffusion_tpu.models.unet import DiffusionModel
    from nicediffusion_tpu.training.distill import (
        GuidedDistiller,
        ProgressiveDistiller,
    )
    from nicediffusion_tpu.utils.checkpoint import load_params, save_params_npz
    from nicediffusion_tpu.utils.config import preset_for_path

    model_args, diff_args = preset_for_path(args.model_path)
    if args.num_classes is not None:
        model_args["num_classes"] = args.num_classes
    dtype = jnp.float32 if args.cpu else jnp.bfloat16
    model = DiffusionModel(**model_args, dtype=dtype)
    params = jax.tree.map(jnp.asarray, load_params(args.model_path))

    res, ch = model_args["resolution"], model_args["in_channels"]
    n_cls = model_args["num_classes"]
    rng = np.random.default_rng(args.seed)

    if args.data:
        blob = np.load(args.data)
        images = np.asarray(blob["images"], dtype=np.float32)
        if images.max() > 1.5:
            images = images / 127.5 - 1.0
        labels = np.asarray(blob["labels"]) if "labels" in blob else None
        if n_cls is not None and labels is None:
            sys.exit("error: conditional model needs 'labels' in --data")
    else:
        yy, xx = np.mgrid[0:res, 0:res] / res
        n = max(args.batch_size * 8, 256)
        phase = rng.uniform(0, 2 * np.pi, size=(n, 1, 1, ch))
        freq = rng.uniform(1, 3, size=(n, 1, 1, ch))
        images = (np.sin(2 * np.pi * freq * (yy + xx)[None, :, :, None] + phase)
                  * 0.8).astype(np.float32)
        labels = rng.integers(0, n_cls, size=(n,)) if n_cls is not None else None

    def loader():
        while True:
            idx = rng.integers(0, len(images), size=(args.batch_size,))
            yield images[idx], (labels[idx] if labels is not None else None)

    if args.rounds < 1 and args.distill_guidance is None:
        sys.exit("error: --rounds must be >= 1 (0 only with "
                 "--distill_guidance for a stage-1-only run)")
    steps = args.steps or diff_args["rescaled_num_steps"]
    student = None
    guided_w = None  # set when stage-1 guided distillation runs
    cur_pred = args.prediction_type  # the CURRENT weights' convention
    # round r's teacher grid: the preset/--steps even respacing for round 1,
    # then the PREVIOUS STUDENT'S exact nested grid — an even re-respacing
    # at N/2 would put later rounds on timesteps the student was never
    # trained on (grids do not nest across eq.-19 respacings)
    teacher_args = dict(diff_args, rescaled_num_steps=steps,
                        prediction_type=args.prediction_type)

    if args.distill_guidance is not None:
        # stage 1: bake CFG into a single conditional forward. The null
        # class (label 0) must exist, i.e. a classifier-free checkpoint.
        if n_cls is None:
            sys.exit("error: --distill_guidance needs a conditional model")
        if args.distill_guidance >= 0:
            w = args.distill_guidance
        elif diff_args.get("guidance_strength") is not None:
            w = diff_args["guidance_strength"]
        else:
            sys.exit("error: preset has no guidance_strength; pass an "
                     "explicit --distill_guidance W")
        if diff_args.get("guidance_method") != "classifier_free":
            print(
                "warning: preset is not classifier_free — label 0 will be "
                "treated as the CFG null class during stage 1"
            )
        if args.wordy:
            print(f"Stage 1: guided distillation at w={w} "
                  f"({args.iterations} iterations, {steps} steps)")
        gd = GuidedDistiller(
            model=model,
            teacher_params=params,
            diffusion_args=teacher_args,
            dataloader=loader(),
            iterations=args.iterations,
            guidance_strength=w,
            lr=args.lr,
            lr_schedule=args.lr_schedule,
            grad_clip=args.grad_clip or None,
            loss_space=args.loss_space,  # None -> per-stage default
            student_prediction_type=args.student_pred,
            var_weight=args.var_weight,
            seed=args.seed + 10_000,
        )
        params, student = gd.run(
            log_every=max(args.iterations // 10, 1) if args.wordy else None
        )
        guided_w = w
        cur_pred = args.student_pred or cur_pred
        teacher_args = dict(teacher_args, prediction_type=cur_pred)
    for r in range(args.rounds):
        if steps % 2:
            sys.exit(f"error: cannot halve odd step count {steps}")
        if args.wordy:
            print(f"Round {r + 1}/{args.rounds}: distilling {steps} -> "
                  f"{steps // 2} steps ({args.iterations} iterations)")
        distiller = ProgressiveDistiller(
            model=model,
            teacher_params=params,
            diffusion_args=teacher_args,
            dataloader=loader(),
            iterations=args.iterations,
            lr=args.lr,
            lr_schedule=args.lr_schedule,
            grad_clip=args.grad_clip or None,
            loss_space=args.loss_space,
            # cross-parameterise only if stage 1 did not already convert
            student_prediction_type=(
                args.student_pred
                if args.student_pred and args.student_pred != cur_pred
                else None
            ),
            var_weight=args.var_weight,
            seed=args.seed + r,
        )
        params, student = distiller.run(
            log_every=max(args.iterations // 10, 1) if args.wordy else None
        )
        steps = student.rescaled_num_steps
        cur_pred = args.student_pred or cur_pred
        teacher_args = dict(
            diff_args,
            rescaled_num_steps=steps,
            timestep_indices=np.asarray(student.timestep_map),
            prediction_type=cur_pred,
        )

    save_params_npz(params, args.save_path)
    # the student's grid is the nested odd-index subset, which an even
    # --rescaled_num_steps respacing does NOT reproduce — record the exact
    # original-chain indices for faithful sampling
    indices = "/".join(str(int(i)) for i in np.asarray(student.timestep_map))
    import json

    # guided=true means CFG is baked into the weights: sampling must NOT
    # re-apply guidance (presets default to classifier_free, which would
    # silently double-guide — hence the '--guidance_method none' hint)
    with open(args.save_path + ".distill.json", "w") as f:
        json.dump({"steps": steps,
                   "timestep_indices":
                   [int(i) for i in np.asarray(student.timestep_map)],
                   "guided": guided_w is not None,
                   "guidance_strength": guided_w,
                   "prediction_type": cur_pred}, f)
    pred_hint = " --prediction_type v" if cur_pred == "v" else ""
    if args.rounds == 0:
        # stage-1-only: the grid is the teacher's, so the learned-variance
        # head is still valid — any sampler works, including DDPM
        hint = (f"  --guidance_method none{pred_hint}"
                f"  # CFG (w={guided_w}) baked into the weights; any "
                "sampler works (stage 1 keeps the teacher's grid)")
    else:
        hint = f"  --sampler ddim --timestep_indices {indices}{pred_hint}"
        if guided_w is not None:
            hint += (" --guidance_method none"
                     f"  # CFG (w={guided_w}) is baked into the weights")
        if args.var_weight is not None:
            hint += ("\n  (variance head trained: stochastic --sampler "
                     "ddpm on the same indices also works)")
    print(f"Distilled to {steps} steps -> {args.save_path}. Sample with:\n"
          + hint)


if __name__ == "__main__":
    main()
