"""One-command verification harness for real torch checkpoints.

Usage:
  python tools/verify_checkpoint.py --pt <file.pt> [--preset auto]
      [--classifier] [--reference_path /root/reference] [--skip-sample]

Runs, against any real `.pt` (EMNIST, OpenAI 64/128/256 diffusion or
classifier checkpoints — VERDICT r1 #4/#7):

  1. torch load + key census
  2. preset dispatch (by filename substring, like the sampling CLI)
  3. conversion to a flax pytree (utils/convert) + structural match against
     the model's init shapes (missing/unexpected/mismatched leaves)
  4. parameter-count check against the preset's published count
  5. forward parity vs the PyTorch reference implementation at fixed
     (x, t, y), tolerance 1e-3 (skipped if the reference package is not
     importable or the checkpoint is a classifier — the reference has no
     classifier)
  6. a 2-step smoke sample through the Diffusion engine (diffusion
     checkpoints only)

Exit code 0 iff every executed check passes. No egress happens here; point
--pt at whatever checkpoint is available locally (the bundled reference
checkpoints are unhydrated git-LFS pointers).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import _env  # noqa: F401,E402  (make JAX_PLATFORMS authoritative before jax init)

import numpy as np

PUBLISHED_PARAM_COUNTS = {
    # reference default_args presets, verified by instantiation (SURVEY.md §2.2)
    "EMNIST": 17_989_442,
    "openai_64": 295_904_454,
    "openai_128": 421_529_606,
    "openai_256": 553_838_086,
}


class Report:
    def __init__(self):
        self.failures = 0

    def check(self, name: str, ok: bool, detail: str = ""):
        status = "PASS" if ok else "FAIL"
        if not ok:
            self.failures += 1
        print(f"[{status}] {name}" + (f": {detail}" if detail else ""))

    def skip(self, name: str, why: str):
        print(f"[SKIP] {name}: {why}")


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_shapes(v, path))
        else:
            out[path] = tuple(v.shape)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pt", required=True, help="torch checkpoint to verify")
    ap.add_argument("--preset", default="auto",
                    help="auto | EMNIST | openai_64 | openai_128 | openai_256")
    ap.add_argument("--classifier", action="store_true",
                    help="the checkpoint is a guided-diffusion classifier")
    ap.add_argument("--reference_path", default="/root/reference",
                    help="path to the PyTorch reference repo for forward parity")
    ap.add_argument("--skip-sample", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from nicediffusion_tpu.utils.config import (
        CLASSIFIER_PRESETS,
        DIFFUSION_PRESETS,
        MODEL_PRESETS,
        classifier_preset_for_path,
        preset_for_path,
    )
    from nicediffusion_tpu.utils.convert import convert_torch_state_dict

    r = Report()

    # 1. load
    sd = torch.load(args.pt, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    n_torch = sum(int(np.prod(t.shape)) for t in sd.values())
    r.check("torch load", True, f"{len(sd)} tensors, {n_torch:,} params")

    # 2. preset
    if args.classifier:
        if args.preset == "auto":
            cls_cfg = classifier_preset_for_path(args.pt)
            preset_key = "(classifier by path)"
        else:
            cls_cfg = dict(CLASSIFIER_PRESETS[args.preset])
            preset_key = args.preset
        r.check("preset dispatch", True, preset_key)
    else:
        if args.preset == "auto":
            model_args, diff_args = preset_for_path(args.pt)
            preset_key = next(
                k for k in PUBLISHED_PARAM_COUNTS
                if MODEL_PRESETS[k] == {
                    kk: vv for kk, vv in model_args.items()
                    if kk in MODEL_PRESETS[k]
                } or dict(MODEL_PRESETS[k]) == model_args
            )
        else:
            preset_key = args.preset
            model_args = dict(MODEL_PRESETS[preset_key])
            diff_args = dict(DIFFUSION_PRESETS[preset_key])
        r.check("preset dispatch", True, preset_key)

    # 3. conversion + structural match
    try:
        params = convert_torch_state_dict(sd)
        r.check("conversion", True)
    except Exception as e:  # noqa: BLE001 — report any conversion error
        r.check("conversion", False, repr(e))
        return 1

    if args.classifier:
        from nicediffusion_tpu.models.classifier import EncoderUNet

        model = EncoderUNet(**cls_cfg)
        res, in_ch = cls_cfg["resolution"], cls_cfg["in_channels"]
        init_args = (
            jnp.zeros((1, res, res, in_ch)), jnp.zeros((1,), jnp.int32),
        )
    else:
        from nicediffusion_tpu.models.unet import DiffusionModel

        model = DiffusionModel(**model_args)
        res, in_ch = model_args["resolution"], model_args["in_channels"]
        y0 = (
            jnp.zeros((1,), jnp.int32)
            if model_args.get("num_classes") is not None else None
        )
        init_args = (
            jnp.zeros((1, res, res, in_ch)), jnp.zeros((1,), jnp.int32), y0,
        )

    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *init_args)
    )["params"]
    exp_shapes = _tree_shapes(expected)
    got_shapes = _tree_shapes(params)
    missing = sorted(set(exp_shapes) - set(got_shapes))
    unexpected = sorted(set(got_shapes) - set(exp_shapes))
    mismatched = sorted(
        k for k in set(exp_shapes) & set(got_shapes)
        if exp_shapes[k] != got_shapes[k]
    )
    ok = not (missing or unexpected or mismatched)
    detail = []
    if missing:
        detail.append(f"missing {len(missing)} (e.g. {missing[:3]})")
    if unexpected:
        detail.append(f"unexpected {len(unexpected)} (e.g. {unexpected[:3]})")
    if mismatched:
        detail.append(
            f"mismatched {len(mismatched)} (e.g. "
            + ", ".join(
                f"{k}: ckpt{got_shapes[k]} vs model{exp_shapes[k]}"
                for k in mismatched[:3]
            )
            + ")"
        )
    r.check("structural match", ok, "; ".join(detail) or f"{len(exp_shapes)} leaves")
    if not ok:
        return 1

    # 4. param count
    if not args.classifier and preset_key in PUBLISHED_PARAM_COUNTS:
        want = PUBLISHED_PARAM_COUNTS[preset_key]
        r.check(
            "param count", n_torch == want, f"{n_torch:,} vs published {want:,}"
        )
    else:
        r.skip("param count", "no published count for this config")

    # 5. forward parity vs the torch reference
    if args.classifier:
        r.skip("reference forward parity", "reference has no classifier")
    else:
        if args.reference_path and os.path.isdir(args.reference_path):
            sys.path.insert(0, args.reference_path)
        try:
            from nicediffusion.model import DiffusionModel as TorchDiffusionModel
        except ImportError as e:
            r.skip("reference forward parity", f"reference not importable: {e}")
        else:
            tmodel = TorchDiffusionModel(
                resolution=model_args["resolution"],
                attention_resolutions=model_args["attention_resolutions"],
                channel_mult=model_args["channel_mult"],
                num_heads=model_args.get("num_heads", 1),
                in_channels=model_args["in_channels"],
                out_channels=model_args["out_channels"],
                model_channels=model_args["model_channels"],
                num_res_blocks=model_args["num_res_blocks"],
                num_classes=model_args.get("num_classes"),
                num_head_channels=model_args.get("num_head_channels"),
                split_qkv_first=model_args.get("split_qkv_first", True),
                dropout=model_args.get("dropout", 0.0),
                resblock_updown=model_args.get("resblock_updown", False),
                use_adaptive_gn=model_args.get("use_adaptive_gn", False),
            ).eval()
            tmodel.load_state_dict(sd, strict=True)
            rng = np.random.default_rng(0)
            x = rng.normal(size=(2, in_ch, res, res)).astype(np.float32)
            t = np.array([7, 500], dtype=np.int64)
            y = (
                np.array([1, 2], dtype=np.int64)
                if model_args.get("num_classes") is not None else None
            )
            with torch.no_grad():
                ref = tmodel(
                    torch.from_numpy(x), torch.from_numpy(t),
                    torch.from_numpy(y) if y is not None else None,
                ).numpy()
            out = model.apply(
                {"params": jax.tree.map(jnp.asarray, params)},
                jnp.asarray(x.transpose(0, 2, 3, 1)),
                jnp.asarray(t),
                jnp.asarray(y) if y is not None else None,
            )
            diff = float(
                np.max(np.abs(np.asarray(out).transpose(0, 3, 1, 2) - ref))
            )
            r.check("reference forward parity", diff <= 1e-3,
                    f"max |diff| = {diff:.2e} (tol 1e-3)")

    # 6. smoke sample
    if args.classifier or args.skip_sample:
        r.skip("2-step smoke sample", "classifier checkpoint" if args.classifier
               else "--skip-sample")
    else:
        from nicediffusion_tpu.diffusion.process import Diffusion

        smoke_args = dict(diff_args)
        smoke_args.pop("classifier", None)
        smoke_args["rescaled_num_steps"] = 2
        diff = Diffusion(model=model, **smoke_args)
        y = (
            jnp.zeros((1,), jnp.int32)
            if model_args.get("num_classes") is not None else None
        )
        out = diff.denoise(
            jax.tree.map(jnp.asarray, params), jax.random.PRNGKey(0),
            y=y, batch_size=1,
        )
        finite = bool(np.isfinite(np.asarray(out)).all())
        r.check("2-step smoke sample", finite,
                f"output {tuple(out.shape)}, finite={finite}")

    print(
        f"\n{'ALL CHECKS PASSED' if r.failures == 0 else f'{r.failures} FAILURE(S)'}"
    )
    return 0 if r.failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
