"""Sampling CLI — the main user entry point.

Behavioural mirror of the reference script (/root/reference/scripts/sample.py):
same flags (nicediffusion_tpu/utils/cli.py), default-preset dispatch by
model-path substring, start-image partial denoising, label handling,
grayscale inversion, optional Real-ESRGAN 4x upsampling stage, display or
per-class-counter save naming. TPU-native differences: the whole denoising
chain runs as one jitted scan (no per-step host sync), batches are NHWC, and
checkpoints may be torch .pt (converted on load), .npz, or orbax dirs.

Usage:
  python scripts/sample.py --model_path 64x64_diffusion.pt --batch_size 8 \
      --num_samples 2 [--labels 3/7] [--save_path out/] [--upsample] [-w]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    # argv re-split (reference sample.py:18-21 accepts space-joined args)
    argv = []
    for chunk in sys.argv[1:]:
        argv.extend(chunk.split(" ")) if " " in chunk else argv.append(chunk)
    sys.argv = [sys.argv[0]] + argv

    from nicediffusion_tpu.utils.cli import get_dicts_from_args, make_argparser

    parser = make_argparser("diff_sample")
    parser.add_argument(
        "--data_parallel", action="store_true", default=False,
        help="shard each batch over all local TPU devices (batch_size must "
             "divide by the device count); TPU-native addition",
    )
    args = parser.parse_args()
    other_args, model_args, diff_args = get_dicts_from_args(args)

    import jax

    from nicediffusion_tpu.parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()
    if other_args["cpu"]:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nicediffusion_tpu.diffusion.process import Diffusion
    from nicediffusion_tpu.models.unet import DiffusionModel
    from nicediffusion_tpu.utils.checkpoint import load_params
    from nicediffusion_tpu.utils.image import (
        grayscale_to_rgb,
        load_start_image,
        save_image,
        to_uint8,
    )

    rng = jax.random.PRNGKey(
        other_args["seed"] if other_args["seed"] is not None else 0
    )
    WORDY = other_args["wordy"]
    NUM_SAMPLES = other_args["num_samples"]
    BATCH_SIZE = other_args["batch_size"]
    UPSAMPLE = other_args["upsample"]
    START_IMG, STEPS_TO_DO = other_args["start_img"], other_args["steps_to_do"]
    LABELS = other_args["labels"]
    CONDITIONAL = model_args["num_classes"] is not None
    SAVE_PATH = other_args["save_path"]

    # compute dtype: bf16 is the benchmarked TPU fast path (~2x the f32
    # sampler throughput); f32 preserved for CPU / --cpu numerical parity;
    # int8 = quantized conv serving path (bf16 elsewhere, slightly lossy)
    dtype_flag = other_args.get("dtype", "auto")
    quantized = dtype_flag == "int8"
    if dtype_flag == "auto":
        on_tpu = not other_args["cpu"] and jax.default_backend() == "tpu"
        dtype = jnp.bfloat16 if on_tpu else jnp.float32
    elif quantized:
        dtype = jnp.bfloat16
    else:
        dtype = jnp.dtype(dtype_flag)
    if WORDY:
        print(f"Computing in {'int8/' if quantized else ''}{jnp.dtype(dtype).name}")

    model = DiffusionModel(**model_args, dtype=dtype, quantized=quantized)
    params = load_params(other_args["model_path"])
    params = jax.tree.map(jnp.asarray, params)

    # noisy-classifier guidance (capability extension — the reference raises
    # NotImplementedError here, utils.py:168-172): load a guided-diffusion
    # EncoderUNet classifier and wire grad(log p(y|x_t)) into the sampler
    if other_args.get("classifier_path"):
        from nicediffusion_tpu.models.classifier import EncoderUNet
        from nicediffusion_tpu.utils.config import classifier_preset_for_path

        cls_cfg = classifier_preset_for_path(other_args["classifier_path"])
        cls_model = EncoderUNet(**cls_cfg, dtype=dtype)
        cls_params = jax.tree.map(
            jnp.asarray, load_params(other_args["classifier_path"])
        )
        if WORDY:
            n_cls = sum(p.size for p in jax.tree.leaves(cls_params))
            print(
                f"Classifier made from {other_args['classifier_path']} with "
                f"{n_cls} parameters! :)"
            )

        def classifier_fn(x, t):
            return cls_model.apply({"params": cls_params}, x, t)

        diff_args["classifier"] = classifier_fn

    mesh = None
    if other_args.get("data_parallel") and len(jax.devices()) > 1:
        from nicediffusion_tpu.parallel.mesh import make_mesh, replicated

        mesh = make_mesh()
        assert BATCH_SIZE % mesh.shape["data"] == 0, (
            "batch_size must divide the device count for --data_parallel"
        )
        params = jax.device_put(params, replicated(mesh))
        if WORDY:
            print(f"Sharding batches over {mesh.shape['data']} devices")

    if WORDY:
        n_params = sum(p.size for p in jax.tree.leaves(params))
        print(
            f"Model made from {other_args['model_path']} with "
            f"{n_params} parameters! :)"
        )
        print(
            f"Starting Diffusion! There are {NUM_SAMPLES} samples of "
            f"{BATCH_SIZE} images each"
        )

    diffusion = Diffusion(model=model, **diff_args)

    if quantized:
        # int8 serving setup (ops/quant.py): draw a calibration batch with
        # the dynamic-quant path, record per-conv activation ranges over
        # the chain, freeze pre-quantized weights + static scales. The
        # serving variables dict rides wherever the params pytree went.
        # --int8_calibration persists the tiny absmax tree so subsequent
        # invocations skip the calibration chain entirely.
        from nicediffusion_tpu.ops.quant import (
            calibration_inputs,
            collect_calibration,
            freeze_int8,
        )

        calib_path = other_args.get("int8_calibration")
        if calib_path and os.path.exists(calib_path):
            from nicediffusion_tpu.utils.checkpoint import load_params

            if WORDY:
                print(f"Loading int8 calibration from {calib_path}")
            params = freeze_int8(model, params, load_params(calib_path))
        else:
            rng, calib_rng, cy_rng = jax.random.split(rng, 3)
            calib_batch = min(BATCH_SIZE, 8)
            calib_y = (
                jax.random.randint(
                    cy_rng, (calib_batch,), 0, model_args["num_classes"]
                )
                if CONDITIONAL else None
            )
            if WORDY:
                print("Calibrating int8 activation scales on one chain...")
            inputs = calibration_inputs(
                diffusion, params, calib_rng, y=calib_y,
                batch_size=calib_batch,
            )
            calib = collect_calibration(model, params, inputs)
            if calib_path:
                from nicediffusion_tpu.utils.checkpoint import save_params_npz

                save_params_npz(calib, calib_path)
                if WORDY:
                    print(f"Saved int8 calibration to {calib_path}")
            params = freeze_int8(model, params, calib, inputs[0])
        if mesh is not None:
            from nicediffusion_tpu.parallel.mesh import replicated

            params = jax.device_put(params, replicated(mesh))

    start_batch = None
    if START_IMG is not None and STEPS_TO_DO is not None:
        img = load_start_image(START_IMG, model_args["resolution"])
        if model_args["in_channels"] == 1:
            img = img.mean(axis=-1, keepdims=True)
        start_batch = jnp.asarray(
            np.repeat(img[None], BATCH_SIZE, axis=0), dtype=jnp.float32
        )

    if CONDITIONAL and LABELS:
        assert len(LABELS) == NUM_SAMPLES, (
            f"please provide NUM_SAMPLES={NUM_SAMPLES} labels"
        )

    samples = []
    for i_sample in range(NUM_SAMPLES):
        rng, data_rng, label_rng, denoise_rng = jax.random.split(rng, 4)
        if start_batch is None:
            data = jax.random.normal(
                data_rng,
                (BATCH_SIZE, model_args["resolution"], model_args["resolution"],
                 model_args["in_channels"]),
                dtype=jnp.float32,
            )
            # the ACTUAL chain length — diff_args' requested count can
            # differ (eq.-19 rounding, karras dedup, --timestep_indices)
            steps = diffusion.rescaled_num_steps
            denoise_input = data
        else:
            # original-chain steps -> rescaled steps (reference sample.py:77),
            # on the actual chain length
            steps = (
                STEPS_TO_DO
                * diffusion.rescaled_num_steps
                // diffusion.original_num_steps
            )
            denoise_input = diffusion.diffuse(
                start_batch, rng=data_rng, steps_to_do=steps
            )
            data = denoise_input

        if CONDITIONAL:
            if not LABELS:
                labels = jax.random.randint(
                    label_rng, (BATCH_SIZE,), 0, model_args["num_classes"]
                )
            else:
                labels = jnp.full((BATCH_SIZE,), LABELS[i_sample], dtype=jnp.int32)
        else:
            labels = None

        if mesh is not None:
            from nicediffusion_tpu.parallel.mesh import shard_batch

            denoise_input = shard_batch(mesh, denoise_input)
            if labels is not None:
                labels = shard_batch(mesh, labels)

        if WORDY:
            print(f"Denoising sample {i_sample + 1}! :)")
        out = diffusion.denoise(
            params,
            denoise_rng,
            x=denoise_input,
            y=labels,
            start_step=steps if start_batch is not None else None,
            steps_to_do=steps,
            progress=WORDY,
            encoder_cache=other_args.get("encoder_cache"),
            guidance_interval=(
                tuple(gi) if (gi := other_args.get("guidance_interval"))
                else None
            ),
        )

        out = to_uint8(np.asarray(out))
        shown_input = to_uint8(
            np.asarray(start_batch if start_batch is not None else data)
        )
        if model_args["in_channels"] == 1:
            out = grayscale_to_rgb(out)
            shown_input = grayscale_to_rgb(shown_input)
        samples.append(
            (shown_input, out, np.asarray(labels) if labels is not None else None)
        )

    if WORDY:
        what = "Displaying" if SAVE_PATH is None else f"Saving to '{SAVE_PATH}'"
        print(f"{what} {NUM_SAMPLES * BATCH_SIZE} generated images!")

    if UPSAMPLE:
        from nicediffusion_tpu.models.rrdb import esrgan_upsample_batches

        if WORDY:
            r4 = model_args["resolution"] * 4
            print(f"Upsampling to {r4}x{r4} resolution!")
        try:
            samples = esrgan_upsample_batches(samples)
        except FileNotFoundError as e:
            print(
                f"Skipping --upsample: Real-ESRGAN weights not found ({e}).\n"
                "Download RealESRGAN_x4plus.pth into models/ to enable it."
            )

    if SAVE_PATH is None:  # display
        import matplotlib.pyplot as plt

        for data, out, labels in samples:
            for b in range(BATCH_SIZE):
                plt.close("all")
                fig = plt.figure(figsize=(7, 3))
                fig.add_subplot(1, 2, 1)
                plt.imshow(data[b])
                plt.title("Denoising Input")
                fig.add_subplot(1, 2, 2)
                plt.imshow(out[b])
                plt.title(
                    f"Output Image, Label={labels[b]}"
                    if labels is not None
                    else "Output Image"
                )
                plt.pause(0.001)
                plt.waitforbuttonpress()
    else:  # save with per-class counters (reference sample.py:161-180)
        if CONDITIONAL:
            counts = np.zeros((model_args["num_classes"],), dtype=int)
        else:
            counts = 0
        for _, out, labels in samples:
            if model_args["in_channels"] == 1:
                out = (255 - out[..., :1])  # back to 1-channel
            for b in range(BATCH_SIZE):
                if labels is not None:
                    label = int(labels[b])
                    filename = f"{label}_sample{counts[label]}.jpg"
                    counts[label] += 1
                else:
                    filename = f"sample{counts}.jpg"
                    counts += 1
                save_image(out[b], SAVE_PATH + filename)

    if WORDY:
        print("Done! have a nice day")


if __name__ == "__main__":
    main()
