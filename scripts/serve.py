"""Serving daemon — long-lived batched sampling over HTTP.

The TPU-native production counterpart of the one-shot sampling CLI: build
the model/diffusion exactly as scripts/sample.py does (same flags, same
preset dispatch, same int8 calibrate->freeze path), warm-compile the
reverse chain once at the fixed serving batch shape, then micro-batch
concurrent HTTP requests into it (nicediffusion_tpu/serving/). The
reference has no serving analogue (its only entry point is the one-shot
scripts/sample.py).

Usage:
  python scripts/serve.py --model_path 64x64_diffusion.npz --batch_size 32 \
      [--dtype int8] [--encoder_cache 2] [--guidance_interval 0.1 0.7] \
      [--port 8000] [--linger_ms 5] [-w]

Then:
  curl -s localhost:8000/healthz
  curl -s -X POST localhost:8000/sample \
      -d '{"labels": [3], "seed": 0, "encoding": "list"}'
  curl -s localhost:8000/stats

--batch_size is the compiled serving batch (requests are packed into it);
--num_samples is not used by the daemon (any value is accepted for CLI
compatibility and ignored).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_service(argv=None):
    """Parse argv (sample.py flag surface + serving flags) and return a
    warm `SamplerService` plus the parsed serving options."""
    from nicediffusion_tpu.utils.cli import get_dicts_from_args, make_argparser

    parser = make_argparser("diff_sample")
    parser.add_argument("--port", type=int, default=8000,
                        help="HTTP port (0 = ephemeral)")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--linger_ms", type=float, default=5.0,
                        help="micro-batching window: max ms a request waits "
                             "for co-batched requests before a partial "
                             "batch is flushed")
    parser.add_argument("--no_warmup", action="store_true", default=False,
                        help="skip the startup compile (first request pays it)")
    parser.add_argument("--request_timeout", type=float, default=600.0,
                        help="seconds an HTTP handler waits on its batch "
                             "before failing the request with a 500 (bounds "
                             "handler-thread pileup if the worker dies; "
                             "default 600 — several chain durations)")
    parser.add_argument("--serve_data_parallel", action="store_true",
                        default=False,
                        help="compile the serving chain data-parallel over "
                             "all devices (serve batch sharded over the "
                             "mesh 'data' axis, params replicated) — on a "
                             "multi-chip host the daemon otherwise leaves "
                             "every chip but the default one idle")
    # the daemon serves forever; --num_samples is meaningless but required
    # by the shared parser — accept it if given, default it otherwise
    args_in = list(sys.argv[1:] if argv is None else argv)
    if "--num_samples" not in args_in:
        args_in += ["--num_samples", "0"]
    args = parser.parse_args(args_in)
    other_args, model_args, diff_args = get_dicts_from_args(args)

    import jax

    if other_args["cpu"]:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nicediffusion_tpu.diffusion.process import Diffusion
    from nicediffusion_tpu.models.unet import DiffusionModel
    from nicediffusion_tpu.serving import SamplerService, ServingConfig
    from nicediffusion_tpu.utils.checkpoint import load_params

    wordy = other_args["wordy"]
    dtype_flag = other_args.get("dtype", "auto")
    quantized = dtype_flag == "int8"
    if dtype_flag == "auto":
        on_tpu = not other_args["cpu"] and jax.default_backend() == "tpu"
        dtype = jnp.bfloat16 if on_tpu else jnp.float32
    elif quantized:
        dtype = jnp.bfloat16
    else:
        dtype = jnp.dtype(dtype_flag)

    model = DiffusionModel(**model_args, dtype=dtype, quantized=quantized)
    params = jax.tree.map(jnp.asarray, load_params(other_args["model_path"]))
    diffusion = Diffusion(model=model, **diff_args)

    if quantized:
        from nicediffusion_tpu.ops.quant import (
            calibration_inputs,
            collect_calibration,
            freeze_int8,
        )

        calib_path = other_args.get("int8_calibration")
        if calib_path and os.path.exists(calib_path):
            if wordy:
                print(f"Loading int8 calibration from {calib_path}")
            params = freeze_int8(model, params, load_params(calib_path))
        else:
            rng = jax.random.PRNGKey(other_args["seed"] or 0)
            rng, calib_rng, cy_rng = jax.random.split(rng, 3)
            calib_batch = min(args.batch_size, 8)
            calib_y = (
                jax.random.randint(
                    cy_rng, (calib_batch,), 0, model_args["num_classes"]
                )
                if model_args["num_classes"] else None
            )
            if wordy:
                print("Calibrating int8 activation scales on one chain...")
            inputs = calibration_inputs(
                diffusion, params, calib_rng, y=calib_y,
                batch_size=calib_batch,
            )
            calib = collect_calibration(model, params, inputs)
            if calib_path:
                from nicediffusion_tpu.utils.checkpoint import save_params_npz

                save_params_npz(calib, calib_path)
            params = freeze_int8(model, params, calib, inputs[0])

    mesh = None
    if args.serve_data_parallel and len(jax.devices()) > 1:
        from nicediffusion_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        if wordy:
            print(f"Serving data-parallel over {mesh.shape['data']} devices")

    gi = other_args.get("guidance_interval")
    service = SamplerService(
        diffusion, params,
        ServingConfig(
            serve_batch=args.batch_size,
            linger_ms=args.linger_ms,
            encoder_cache=other_args.get("encoder_cache"),
            guidance_interval=tuple(gi) if gi else None,
            rng_seed=other_args["seed"] or 0,
        ),
        mesh=mesh,
    )
    if not args.no_warmup:
        if wordy:
            print(f"Warm-compiling the chain at batch {args.batch_size}...")
        service.warmup()
    return service, args


def main():
    from nicediffusion_tpu.serving import make_server

    service, args = build_service()
    server = make_server(service, host=args.host, port=args.port,
                         request_timeout=args.request_timeout)
    host, port = server.server_address
    print(f"serving on http://{host}:{port} "
          f"(batch {args.batch_size}, linger {args.linger_ms} ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
