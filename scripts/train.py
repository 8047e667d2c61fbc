"""EMNIST training driver.

Mirror of the reference driver (/root/reference/scripts/train.py): same
hard-coded recipe (EMNIST preset, batch 468, lr 1.6e-4, wd 1e-3, 1500
iterations, grad checkpointing, classifier-free null class) — but every
hyperparameter is overridable via the shared 'diff_train' CLI
(nicediffusion_tpu/utils/cli.py), data parallelism engages automatically
over all local devices, and a synthetic dataset stands in when the EMNIST
files are absent (this container has no egress).

NOTE on num_classes: the reference inconsistently trains with 28 classes
(train.py:39-40 adds the null class to 27) but samples with 27
(default_args.py:10). We train with the same 27+1=28 and document that
sampling such a checkpoint needs num_classes=28.

Usage: python scripts/train.py [--iterations N] [--batch_size B] ...
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# reference scripts/train.py:24-36 hard-coded recipe
DEFAULTS = dict(
    batch_size=468,
    lr=1.6e-4,
    weight_decay=1e-3,
    iterations=1500,
    save_every=100,
    print_every=10,
    grad_accumulation=1,
)


def main():
    from nicediffusion_tpu.utils.cli import make_argparser

    parser = make_argparser("diff_train")
    parser.set_defaults(
        batch_size=DEFAULTS["batch_size"],
        lr=DEFAULTS["lr"],
        weight_decay=DEFAULTS["weight_decay"],
        iterations=DEFAULTS["iterations"],
        save_every=DEFAULTS["save_every"],
        grad_accumulation=DEFAULTS["grad_accumulation"],
    )
    # the training parser marks these required; defaults satisfy them
    for action in parser._actions:
        if action.dest in DEFAULTS or action.dest in (
            "resolution", "model_channels", "channel_mult", "num_res_blocks",
            "attention_resolutions", "dropout", "rescaled_num_steps",
            "beta_schedule", "sampling_var_type", "loss_type",
        ):
            action.required = False
    parser.add_argument(
        "--synthetic", action="store_true", default=False,
        help="use the synthetic dataset instead of EMNIST",
    )
    parser.add_argument("--data_root", type=str, default="data/EMNIST/raw")
    parser.add_argument("--print_every", type=int,
                        default=DEFAULTS["print_every"])
    parser.add_argument(
        "--no_grad_checkpoint", action="store_true", default=False,
        help="disable activation rematerialisation (the reference trains "
             "with grad checkpointing, train.py:42; disabling is ~10%% "
             "faster when the batch fits memory)",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from nicediffusion_tpu.parallel.multihost import (
        maybe_initialize_distributed,
        process_local_batch_size,
    )

    # multi-host: one process per TPU host, enabled by JAX_COORDINATOR
    # (parallel/multihost.py documents the env + data contract)
    maybe_initialize_distributed()

    from nicediffusion_tpu.models.unet import DiffusionModel
    from nicediffusion_tpu.parallel.mesh import make_mesh
    from nicediffusion_tpu.training.data import emnist_batches, synthetic_batches
    from nicediffusion_tpu.training.trainer import Trainer
    from nicediffusion_tpu.utils.config import (
        DIFFUSION_PRESETS,
        MODEL_PRESETS,
    )
    from nicediffusion_tpu.utils.image import save_image

    model_args = dict(MODEL_PRESETS["EMNIST"])
    diff_args = dict(DIFFUSION_PRESETS["EMNIST"])
    # diffusion-group flags the EMNIST recipe honours beyond the preset
    # (the reference's train.py ignores its CLI entirely — hard-coded
    # recipe, reference scripts/train.py:24-36)
    if args.prediction_type != "eps":
        diff_args["prediction_type"] = args.prediction_type
    # user-explicit model-group flags override the preset, so small custom
    # models can be trained through the same driver (also keeps the
    # default-suite CLI smoke cheap — tests/test_end_to_end.py). Flags
    # whose parser default is None are "explicit iff given"; the boolean
    # store_true flags keep the preset's values (they cannot distinguish
    # explicit-False from default).
    for key in ("resolution", "model_channels", "num_res_blocks",
                "num_classes", "num_head_channels"):
        v = getattr(args, key)
        if v is not None:
            model_args[key] = v
    if args.channel_mult is not None:
        model_args["channel_mult"] = tuple(
            int(c) for c in args.channel_mult.split("/")
        )
    if args.attention_resolutions is not None:
        s = args.attention_resolutions
        model_args["attention_resolutions"] = (
            tuple(int(c) for c in s.split("/")) if s else ()
        )

    # null class for classifier-free guidance (reference train.py:39-40)
    if diff_args["guidance_method"] == "classifier_free":
        model_args["num_classes"] += 1

    model = DiffusionModel(
        **model_args,
        # reference train.py:42 trains with grad checkpointing
        use_remat=not args.no_grad_checkpoint,
        dtype=jnp.bfloat16 if args.use_fp16 else None,
    )

    # each process loads its local share of the global batch
    local_batch = process_local_batch_size(args.batch_size)
    if args.synthetic:
        loader = synthetic_batches(
            batch_size=local_batch,
            resolution=model_args["resolution"],
            channels=model_args["in_channels"],
            num_classes=model_args["num_classes"],
            seed=jax.process_index(),
        )
    else:
        try:
            # prefer the native C++ prefetching loader; fall back to numpy
            from nicediffusion_tpu.training.native_loader import (
                is_available,
                native_emnist_batches,
            )

            if is_available():
                loader = native_emnist_batches(
                    local_batch, root=args.data_root,
                    seed=jax.process_index(),
                )
            else:
                loader = emnist_batches(
                    local_batch, root=args.data_root,
                    seed=jax.process_index(),
                )
        except FileNotFoundError as e:
            print(f"{e}\nFalling back to --synthetic data.")
            loader = synthetic_batches(
                batch_size=local_batch,
                resolution=model_args["resolution"],
                channels=model_args["in_channels"],
                num_classes=model_args["num_classes"],
                seed=jax.process_index(),
            )

    os.makedirs("samples", exist_ok=True)

    def save_samples(imgs, labels):
        for i in range(len(imgs)):
            label = int(labels[i]) if labels is not None else i
            save_image(imgs[i], f"samples/train_sample_{label}_{i}.png")

    # data-parallel over all local devices; shrink the mesh to the largest
    # device count that divides the batch
    import math

    n_dev = len(jax.devices())
    n_data = math.gcd(n_dev, args.batch_size)
    mesh = make_mesh(num_data=n_data) if n_data > 1 else None
    trainer = Trainer(
        model=model,
        diffusion_args=diff_args,
        dataloader=loader,
        iterations=args.iterations,
        batch_size=args.batch_size,
        lr=args.lr,
        weight_decay=args.weight_decay,
        ema_rate=args.ema_rate,
        grad_accumulation=args.grad_accumulation,
        resume_step=args.resume_step,
        print_every=args.print_every if args.wordy else None,
        sample_every=args.sample_every,
        save_every=args.save_every,
        mesh=mesh,
        seed=args.seed if args.seed is not None else 0,
        metrics_path="metrics.jsonl",
        sample_callback=save_samples,
    )
    trainer.train()


if __name__ == "__main__":
    main()
