"""Checkpoint export/conversion CLI.

Converts between this framework's checkpoint formats (orbax train state /
flat .npz) and the reference's torch ``.pt`` state dicts (loadable by
/root/reference with strict=True), in either direction.

Usage:
  python scripts/export.py --input checkpoints/step_1500 --output model.pt \
      [--part ema_params]           # orbax -> torch
  python scripts/export.py --input 64x64_diffusion.pt --output model.npz
  python scripts/export.py --input model.npz --output model.pt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True,
                        help=".pt / .npz / orbax checkpoint directory")
    parser.add_argument("--output", required=True, help=".pt or .npz path")
    parser.add_argument(
        "--part", default="params", choices=["params", "ema_params"],
        help="which pytree to take from an orbax train-state checkpoint",
    )
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from nicediffusion_tpu.utils.checkpoint import load_params, save_params_npz
    from nicediffusion_tpu.utils.convert import export_torch_checkpoint

    if os.path.isdir(args.input):
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.input)
        )
        params = restored[args.part] if args.part in restored else restored
    else:
        params = load_params(args.input)

    if args.output.endswith(".npz"):
        save_params_npz(params, args.output)
    elif args.output.endswith((".pt", ".pth")):
        export_torch_checkpoint(params, args.output)
    else:
        raise ValueError("output must end in .npz or .pt/.pth")
    n = sum(p.size for p in jax.tree.leaves(params))
    print(f"Exported {n} parameters from {args.input} to {args.output}")


if __name__ == "__main__":
    main()
