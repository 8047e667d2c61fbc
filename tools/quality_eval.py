"""Self-contained sample-quality measurement for the lossy serving modes.

No egress means no FID (no Inception weights), so this builds the whole
measurement loop locally (VERDICT.md round-2 item 4):

  1. train the EMNIST-scale UNet (reference default_args.py:4-10 shapes:
     28x28x1, ch 64, mult 1/2/4, attn@7/14, AdaGN, 18.0M params) on the
     deterministic synthetic pipeline (training/data.py) with CFG label
     drop — labels live in 1..27, 0 is the null class;
  2. train an EncoderUNet classifier (models/classifier.py, adaptive pool)
     on clean synthetic images;
  3. sample N images per serving mode — exact bf16, encoder_cache 2/3,
     int8-static (calibrated), optionally 1-round progressive distillation
     — conditioned on cycling labels with IDENTICAL rngs;
  4. report per mode: classifier accuracy vs the conditioning label,
     Frechet distance between classifier-logit distributions of samples vs
     real data (a local stand-in for FID), and max/mean pixel deviation
     from the exact chain.

Usage:
  python tools/quality_eval.py            # full run (TPU, ~10-20 min)
  QE_TRAIN_STEPS=200 QE_EVAL_N=64 python tools/quality_eval.py  # smoke
  QE_CKPT=/tmp/qe.msgpack ...             # cache/reuse the trained params
                                          # (training dominates wall-clock;
                                          # reruns then only re-sample)
  QE_MODES=enc,gi ...                     # restrict which lossy modes run
                                          # (exact always runs; choices:
                                          # enc, ddimctl, gi, int8, distill,
                                          # gdistill, pgdistill; ddimctl =
                                          # deterministic/eta=1 DDIM rows on
                                          # the exact CFG teacher, the
                                          # sampler-regime control for the
                                          # distillation rows; dpmctl =
                                          # DPM-Solver++(2M) rows on the
                                          # exact teacher at QE_DPM_STEPS
                                          # (default 250,50,25); the
                                          # int8+enc2+gi max-stack row runs
                                          # when int8 and gi/stack are on;
                                          # pgdistill — stage-2 halving of
                                          # the guided student — needs
                                          # gdistill on)
  QE_EVAL_N=2048 QE_CHUNK=256 ...         # statistical power: accuracies
                                          # are reported as mean +/- s.e.
                                          # over eval_n/chunk independent
                                          # chunks (distinct rng folds),
                                          # Frechet with a jackknife s.e.
  QE_GI_W=1.0,1.2,1.5 ...                 # guidance-strength re-tune inside
                                          # the limited interval
                                          # (arXiv:2404.07724 re-tunes w;
                                          # adds gi and stack rows per W)
  QE_ARCH=im64 ...                        # 64x64 config with attn@8/16/32
                                          # (the benched preset's shape,
                                          # reference default_args.py:15-21)
                                          # instead of the 28x28 EMNIST one
  QE_ENC_KS=2 ...                         # trim the encoder-cache sweep
                                          # (default 2,3)
  QE_GI_BASE=0 ...                        # skip the preset-strength gi and
                                          # stack rows, keeping only the
                                          # QE_GI_W re-tuned ones (the
                                          # expensive im64 column tests the
                                          # shipped w=1.5 operating point)
  QE_GDISTILL_SAMPLE=0 ...                # keep gdistill as pgdistill's
                                          # teacher but skip re-sampling
                                          # its two (already recorded) rows
  QE_PGDISTILL_ROUNDS=2 QE_SAMPLE_STEPS=256 ...
                                          # chain halving rounds on the
                                          # guided student (256 -> 128 ->
                                          # 64; the base step count must be
                                          # divisible by 2**rounds — grids
                                          # nest via timestep_indices, so
                                          # later rounds stay on points the
                                          # student was trained on). One
                                          # sampled row per round; _enc2
                                          # only for the final student.
                                          # QE_PGDISTILL_ETA1=1 (default)
                                          # adds stochastic-DDIM (eta=1)
                                          # rows + matched unhalved control;
                                          # QE_PGDISTILL_DDPM=1 adds the
                                          # learned-variance DDPM rows
                                          # (measured non-viable with the
                                          # stale inherited head — see the
                                          # code comment; auto-on when
                                          # QE_PGDISTILL_VARW trains it)
  QE_GDISTILL_PRED=v ...                  # stage 1 reparameterises the
                                          # student to v-prediction
                                          # (Salimans & Ho App. D); halving
                                          # then runs natively in v-space;
                                          # distill row names gain a 'v'
  QE_GDISTILL_VARW=1.0 ...                # stage-1 variance distillation
                                          # (match the guided teacher's
                                          # log-variance)
  QE_PGDISTILL_VARW=1.0 ...               # stage-2 variance-head training
                                          # (VLB on the halved grid) —
                                          # unlocks the stochastic DDPM
                                          # rows for halved students

Results land in BASELINE.md's "Measured sample quality" table.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import _env  # noqa: F401,E402  (make JAX_PLATFORMS authoritative before jax init)

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nicediffusion_tpu.diffusion.process import Diffusion
from nicediffusion_tpu.models.classifier import EncoderUNet
from nicediffusion_tpu.models.unet import DiffusionModel
from nicediffusion_tpu.training.data import synthetic_batches
from nicediffusion_tpu.training.trainer import Trainer

NUM_CLASSES = 28  # 27 letter classes + null class 0 (reference default_args)

# QE_ARCH selects the harness architecture:
#   emnist (default) — the reference EMNIST shapes (default_args.py:4-10).
#   im64 — 64x64 with attention at 8/16/32 like the benched ImageNet-64
#     preset (reference default_args.py:15-21: mult 1/2/3/4, head_ch 64,
#     3 res blocks), scaled to a harness-trainable width (ch 64, 2 blocks)
#     so the lossy-mode neutrality deltas are measured at the headline
#     model's RESOLUTION/attention structure instead of extrapolated
#     from 28x28 (VERDICT r3 #8).
ARCH = os.environ.get("QE_ARCH", "emnist")
if ARCH == "emnist":
    RESOLUTION = 28
    MODEL_CFG = dict(
        resolution=28, in_channels=1, model_channels=64, out_channels=2,
        num_res_blocks=2, attention_resolutions=(7, 14), channel_mult=(1, 2, 4),
        num_heads=4, num_classes=NUM_CLASSES, dropout=0.05,
        use_adaptive_gn=True, resblock_updown=True, split_qkv_first=True,
    )
elif ARCH == "im64":
    RESOLUTION = 64
    MODEL_CFG = dict(
        resolution=64, in_channels=1, model_channels=64, out_channels=2,
        num_res_blocks=2, attention_resolutions=(8, 16, 32),
        channel_mult=(1, 2, 3, 4), num_head_channels=32,
        num_classes=NUM_CLASSES, dropout=0.0,
        use_adaptive_gn=True, resblock_updown=True, split_qkv_first=False,
    )
else:
    sys.exit(f"unknown QE_ARCH {ARCH!r} (emnist | im64)")

DIFF_TRAIN_ARGS = dict(
    original_num_steps=1000, rescaled_num_steps=1000,
    beta_schedule="cosine", sampling_var_type="learned_interpolation",
    loss_type="hybrid", guidance_method="classifier_free",
    guidance_strength=0.8,
)


def shifted_synthetic(batch_size, seed=0):
    """Synthetic batches with labels shifted to 1..27 (0 = CFG null).

    num_distinct=512 (vs the trainer-test default 64) gives ~19 images per
    class so the classifier learns the class signatures rather than the
    individual pool images (it is evaluated on a different seed's pool).
    """
    gen = synthetic_batches(
        batch_size=batch_size, resolution=RESOLUTION, channels=1,
        num_classes=27, seed=seed, num_distinct=512,
    )
    for x, y in gen:
        yield x, y + 1


def train_unet(steps, batch, dtype):
    model = DiffusionModel(**MODEL_CFG, dtype=dtype)
    trainer = Trainer(
        model=model,
        diffusion_args=dict(DIFF_TRAIN_ARGS),
        dataloader=shifted_synthetic(batch),
        iterations=steps,
        batch_size=batch,
        lr=1.6e-4,
        weight_decay=1e-3,
        checkpoint_dir="/tmp/qe_ckpts",
        save_every=None,
        print_every=max(steps // 5, 1),
        label_drop_prob=0.02,
    )
    loader = trainer.loader
    for step in range(steps):
        b, y = next(loader)
        b, y = trainer._shard_batch(b, y)
        trainer.rng, step_rng = jax.random.split(trainer.rng)
        trainer.state, metrics = trainer._train_step(
            trainer.state, b, y, step_rng
        )
        if step % max(steps // 5, 1) == 0:
            print(f"  unet step {step}: loss={float(metrics['loss']):.4f}")
    return model, trainer.state.ema_params


CLS_CFG = dict(
    resolution=RESOLUTION, in_channels=1, model_channels=32,
    out_channels=NUM_CLASSES, num_res_blocks=1,
    attention_resolutions=(7,) if ARCH == "emnist" else (8,),
    channel_mult=(1, 2), num_heads=2, pool="adaptive",
)


def train_classifier(steps, batch, rng):
    model = EncoderUNet(**CLS_CFG)
    gen = shifted_synthetic(batch, seed=1)
    x0, _ = next(gen)
    params = model.init(
        rng, jnp.asarray(x0), jnp.zeros((batch,), jnp.int32)
    )["params"]
    # lr 1e-3 / >=1200 steps: measured 0.85 held-out (cross-seed) accuracy
    # on the synthetic classes; 3e-4/600 plateaued near chance
    tx = optax.adamw(1e-3, weight_decay=1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(
                {"params": p}, x, jnp.zeros((x.shape[0],), jnp.int32)
            )
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean(), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = (logits.argmax(-1) == y).mean()
        return params, opt_state, loss, acc

    for i in range(steps):
        x, y = next(gen)
        params, opt_state, loss, acc = step_fn(
            params, opt_state, jnp.asarray(x), jnp.asarray(y)
        )
        if i % max(steps // 5, 1) == 0:
            print(f"  cls step {i}: loss={float(loss):.4f} acc={float(acc):.3f}")
    print(f"  cls final train acc={float(acc):.3f}")
    return model, params


def frechet(feat_a, feat_b):
    """Frechet distance between Gaussians fit to two feature sets."""
    mu_a, mu_b = feat_a.mean(0), feat_b.mean(0)
    cov_a = np.cov(feat_a, rowvar=False)
    cov_b = np.cov(feat_b, rowvar=False)
    diff = mu_a - mu_b
    # sqrtm via eigendecomposition of the symmetrized product
    prod = cov_a @ cov_b
    eigs = np.linalg.eigvals(prod)
    covmean_tr = np.sqrt(np.clip(eigs.real, 0, None)).sum()
    return float(diff @ diff + np.trace(cov_a) + np.trace(cov_b)
                 - 2.0 * covmean_tr)


def main():
    train_steps = int(os.environ.get("QE_TRAIN_STEPS", 1500))
    cls_steps = int(os.environ.get("QE_CLS_STEPS", 1500))
    eval_n = int(os.environ.get("QE_EVAL_N", 256))
    batch = int(os.environ.get("QE_BATCH", 256))
    sample_steps = int(os.environ.get("QE_SAMPLE_STEPS", 250))
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    print(f"backend={jax.default_backend()} train_steps={train_steps} "
          f"eval_n={eval_n}")

    ckpt_path = os.environ.get("QE_CKPT")
    if ckpt_path and os.path.exists(ckpt_path):
        import flax.serialization

        print(f"reusing trained params from {ckpt_path}...")
        model = DiffusionModel(**MODEL_CFG, dtype=dtype)
        cls_model = EncoderUNet(**CLS_CFG)
        ex_x = jnp.zeros((1, RESOLUTION, RESOLUTION, 1), dtype)
        ex_t = jnp.zeros((1,), jnp.int32)
        tmpl = {
            "ema": model.init(jax.random.PRNGKey(0), ex_x, ex_t, ex_t)[
                "params"
            ],
            "cls": cls_model.init(jax.random.PRNGKey(0), ex_x, ex_t)[
                "params"
            ],
        }
        with open(ckpt_path, "rb") as f:
            restored = flax.serialization.from_bytes(tmpl, f.read())
        # device-resident, NOT numpy: numpy params are re-serialized and
        # re-shipped through the TPU relay on EVERY jitted call that takes
        # them as an argument — a restored 8000-step distillation run
        # ground to ~10x slower with 60 GB host RSS before this asarray
        # (observed 2026-08-20; in-process-trained params never hit it
        # because they are already jax.Arrays)
        ema_params = jax.tree.map(jnp.asarray, restored["ema"])
        cls_params = jax.tree.map(jnp.asarray, restored["cls"])
    else:
        print("training UNet on synthetic data...")
        model, ema_params = train_unet(train_steps, batch, dtype)
        print("training classifier...")
        cls_model, cls_params = train_classifier(
            cls_steps, batch, jax.random.PRNGKey(5)
        )
        if ckpt_path:
            import flax.serialization

            with open(ckpt_path, "wb") as f:
                f.write(flax.serialization.to_bytes(
                    {"ema": ema_params, "cls": cls_params}
                ))
            print(f"saved trained params to {ckpt_path}")

    @jax.jit
    def logits_of(x):
        return cls_model.apply(
            {"params": cls_params}, x, jnp.zeros((x.shape[0],), jnp.int32)
        )

    def logits_np(images, per=256):
        """Classifier logits in fixed-size chunks (one compiled shape; a
        single eval_n=2048 batch at 64x64 would be a pointlessly large
        one-shot program). The tail chunk is zero-padded to `per`."""
        images = np.asarray(images, dtype=np.float32)
        out = []
        for i in range(0, len(images), per):
            part = images[i:i + per]
            n = len(part)
            if n < per:
                part = np.concatenate(
                    [part, np.zeros((per - n, *part.shape[1:]), part.dtype)]
                )
            out.append(np.asarray(logits_of(jnp.asarray(part)))[:n])
        return np.concatenate(out, 0)

    # sampling diffusion: forced 250-step DDPM like Trainer.sample
    samp_args = dict(
        DIFF_TRAIN_ARGS, rescaled_num_steps=min(sample_steps, 1000)
    )
    y_eval = jnp.asarray((np.arange(eval_n) % 27) + 1, jnp.int32)
    rng = jax.random.PRNGKey(123)

    def sample_mode(diffusion, params, enc_cache=None, gi=None):
        outs = []
        per = min(eval_n, 128)
        for i in range(0, eval_n, per):
            labels = y_eval[i : i + per]  # final slice may be short
            outs.append(np.asarray(
                diffusion.denoise(
                    params, jax.random.fold_in(rng, i),
                    y=labels, batch_size=int(labels.shape[0]),
                    encoder_cache=enc_cache, guidance_interval=gi,
                )
            ))
        return np.concatenate(outs, 0)

    wanted = set(
        os.environ.get(
            "QE_MODES", "enc,gi,int8,distill,gdistill,pgdistill"
        ).split(",")
    )
    modes = {}
    exact_diff = Diffusion(model=model, **samp_args)
    print("sampling: exact...")
    modes["exact"] = sample_mode(exact_diff, ema_params)
    if "enc" in wanted:
        # QE_ENC_KS trims the cache-interval sweep (the expensive 64x64
        # column only needs the shipped k=2)
        enc_ks = [
            int(k)
            for k in os.environ.get("QE_ENC_KS", "2,3").split(",") if k
        ]
        print(f"sampling: encoder_cache {enc_ks}...")
        for k in enc_ks:
            modes[f"enc{k}"] = sample_mode(
                exact_diff, ema_params, enc_cache=k
            )
    if "ddimctl" in wanted:
        # Deterministic-DDIM controls on the EXACT teacher, CFG intact.
        # These separate "deterministic DDIM costs quality at this harness
        # scale" from "distillation costs quality": the pgdistill students
        # sample deterministic DDIM, and their matched gdistill*_ddim
        # control already shows the sampler switch (not the halving)
        # carries the loss — these rows test whether the UNDISTILLED model
        # pays the same price under the same sampler regime.
        #   exact_ddim<N>       — eta=0 DDIM on the teacher's full grid
        #   exact_ddim<N/2>     — naive step halving (the baseline stage-2
        #                         distillation must beat; 2 fwd/step CFG)
        #   exact_ddim<N>_eta1  — stochastic DDIM, schedule-derived noise
        #                         (does noise alone close the gap?)
        n_full = samp_args["rescaled_num_steps"]
        for name, over in (
            (f"exact_ddim{n_full}",
             dict(use_ddim=True, ddim_eta=0.0)),
            (f"exact_ddim{n_full // 2}",
             dict(use_ddim=True, ddim_eta=0.0,
                  rescaled_num_steps=n_full // 2)),
            (f"exact_ddim{n_full}_eta1",
             dict(use_ddim=True, ddim_eta=1.0)),
        ):
            print(f"sampling: {name} (CFG teacher, DDIM control)...")
            d_ctl = Diffusion(model=model, **dict(samp_args, **over))
            modes[name] = sample_mode(d_ctl, ema_params)

    if "dpmctl" in wanted:
        # DPM-Solver++(2M) rows on the exact CFG teacher. At production
        # scale dpm++ matches the 250-step ancestral chain in 25-50 steps
        # (arXiv:2211.01095) — if that holds on this harness it is a
        # training-free 5-10x step reduction; if it does not, it pins the
        # same deterministic-ODE quality ceiling the ddimctl rows measure.
        # QE_DPM_STEPS sets the swept step counts.
        dpm_steps = [
            int(s)
            for s in os.environ.get("QE_DPM_STEPS", "250,50,25").split(",")
            if s
        ]
        for n_dpm in dpm_steps:
            name = f"exact_dpmpp{n_dpm}"
            print(f"sampling: {name} (CFG teacher, DPM-Solver++ 2M)...")
            d_ctl = Diffusion(model=model, **dict(
                samp_args, sampler="dpm++", rescaled_num_steps=n_dpm,
            ))
            modes[name] = sample_mode(d_ctl, ema_params)

    gi_w = [
        float(w) for w in os.environ.get("QE_GI_W", "").split(",") if w
    ]
    if "gi" in wanted:
        if os.environ.get("QE_GI_BASE", "1") == "1":
            # the preset-strength interval rows (QE_GI_BASE=0 skips them
            # when only the re-tuned operating point is under test)
            print("sampling: guidance_interval (0.1, 0.7) / (0.15, 0.55)...")
            modes["gi_0.1-0.7"] = sample_mode(
                exact_diff, ema_params, gi=(0.1, 0.7)
            )
            modes["gi_0.15-0.55"] = sample_mode(
                exact_diff, ema_params, gi=(0.15, 0.55)
            )
        # guidance-strength re-tune INSIDE the interval: the interval paper
        # (arXiv:2404.07724) reaches its FID-improving operating point by
        # raising w when guidance only acts mid-chain; holding the
        # always-on w fixed under-drives the conditioning (VERDICT r3 #1)
        for w in gi_w:
            print(f"sampling: gi (0.1, 0.7) at re-tuned w={w}...")
            dw = Diffusion(
                model=model, **dict(samp_args, guidance_strength=w)
            )
            modes[f"gi_0.1-0.7_w{w}"] = sample_mode(
                dw, ema_params, gi=(0.1, 0.7)
            )

    if "int8" in wanted:
        print("sampling: int8-static (calibrated)...")
        from nicediffusion_tpu.ops.quant import (
            build_int8_variables, calibration_inputs,
        )

        model_q = DiffusionModel(**MODEL_CFG, dtype=dtype, quantized=True)
        diff_q = Diffusion(model=model_q, **samp_args)
        serving = build_int8_variables(
            model_q, ema_params,
            calibration_inputs(
                diff_q, ema_params, jax.random.PRNGKey(77), y=y_eval[:8],
                batch_size=8,
            ),
        )
        modes["int8"] = sample_mode(diff_q, serving)
        if "stack" in wanted or "gi" in wanted:
            # the bench.py max-stack serving config: every lossy lever
            # composed (int8 static + encoder_cache 2 + limited-interval
            # guidance 0.1-0.7)
            if os.environ.get("QE_GI_BASE", "1") == "1":
                print("sampling: max stack (int8 + enc_cache 2 + "
                      "gi 0.1-0.7)...")
                modes["stack_int8_enc2_gi"] = sample_mode(
                    diff_q, serving, enc_cache=2, gi=(0.1, 0.7)
                )
            for w in gi_w:
                print(f"sampling: max stack at re-tuned w={w}...")
                dqw = Diffusion(
                    model=model_q, **dict(samp_args, guidance_strength=w)
                )
                modes[f"stack_int8_enc2_gi_w{w}"] = sample_mode(
                    dqw, serving, enc_cache=2, gi=(0.1, 0.7)
                )

    if "distill" in wanted and os.environ.get("QE_DISTILL", "1") == "1":
        # one progressive-distillation halving round: 250-step DDIM teacher
        # -> 125-step student initialised from the teacher. NOTE the
        # distillation pipeline strips guidance (training/distill.py), so
        # this row is unguided sampling — not directly comparable to the
        # CFG rows above; it measures the distilled student's own fidelity.
        from nicediffusion_tpu.training.distill import ProgressiveDistiller

        print("distilling one round (250 -> 125, unguided)...")
        distiller = ProgressiveDistiller(
            model, ema_params,
            dict(DIFF_TRAIN_ARGS, rescaled_num_steps=250),
            shifted_synthetic(batch, seed=3),
            iterations=int(os.environ.get("QE_DISTILL_STEPS", 400)),
            lr=1e-4, lr_schedule="warmup_cosine",
        )
        student_params, student_diff = distiller.run(
            log_every=max(int(os.environ.get("QE_DISTILL_STEPS", 400)) // 4, 1)
        )
        modes["distill125_unguided"] = sample_mode(student_diff, student_params)

    if "gdistill" in wanted:
        # stage-1 GUIDED distillation (arXiv:2210.03142): bake w=0.8 CFG
        # into a single conditional forward, then sample the SAME 250-step
        # DDPM chain as the exact row, unguided and with identical rngs —
        # stage 1 keeps the teacher's grid, so the learned-variance head
        # stays valid and the student is directly comparable to the CFG
        # rows (same chain, same conditioning target, half the model
        # calls; pixel dev vs exact is meaningful here).
        from nicediffusion_tpu.training.distill import GuidedDistiller

        gsteps = int(os.environ.get("QE_GDISTILL_STEPS",
                                    os.environ.get("QE_DISTILL_STEPS", 400)))
        base_steps = samp_args["rescaled_num_steps"]
        g_ckpt = os.environ.get("QE_GDISTILL_CKPT")
        # QE_GDISTILL_PRED=v: stage 1 also REPARAMETERISES the student to
        # v-prediction (Salimans & Ho App. D; VERDICT r4 #3) — the halving
        # stage then runs natively in v-space. Row names gain a 'v'.
        # QE_GDISTILL_VARW / QE_PGDISTILL_VARW: variance-head distillation
        # weights (VERDICT r4 #4) — stage 1 matches the guided teacher's
        # log-variance, stage 2 trains the head by VLB on the halved grid,
        # unlocking the stochastic DDPM rows for halved students.
        g_pred = os.environ.get("QE_GDISTILL_PRED", "eps")
        g_tag = "v" if g_pred == "v" else ""
        g_varw = os.environ.get("QE_GDISTILL_VARW")
        g_varw = float(g_varw) if g_varw else None
        gd = GuidedDistiller(
            model, ema_params,
            dict(DIFF_TRAIN_ARGS, rescaled_num_steps=base_steps),
            shifted_synthetic(batch, seed=4),
            iterations=gsteps,
            guidance_strength=0.8,
            lr=1e-4, lr_schedule="warmup_cosine",
            student_prediction_type="v" if g_pred == "v" else None,
            var_weight=g_varw,
        )
        if g_ckpt and os.path.exists(g_ckpt):
            import flax.serialization

            print(f"reusing guided-distilled student from {g_ckpt}...")
            with open(g_ckpt, "rb") as f:
                g_params = jax.tree.map(
                    jnp.asarray,
                    flax.serialization.from_bytes(gd.state.params, f.read()),
                )  # device-resident (see the QE_CKPT restore note)
            g_diff = gd.student
        else:
            print(f"guided distillation ({gsteps} steps, w=0.8 -> "
                  "1 fwd/step)...")
            g_params, g_diff = gd.run(log_every=max(gsteps // 8, 1))
            if g_ckpt:
                import flax.serialization

                with open(g_ckpt, "wb") as f:
                    f.write(flax.serialization.to_bytes(g_params))
                print(f"saved guided-distilled student to {g_ckpt}")
        if os.environ.get("QE_GDISTILL_SAMPLE", "1") == "1":
            modes[f"gdistill{g_tag}{base_steps}_1fwd"] = sample_mode(
                g_diff, g_params
            )
            # the student composed with the other quality-neutral serving
            # lever: if both are neutral, distilled + enc_cache 2 (+ int8,
            # whose noise the int8 row bounds) is the fastest
            # quality-credible serving stack (bench.py distilled_value
            # path). QE_GDISTILL_SAMPLE=0 skips these two rows when the
            # cached student's numbers are already recorded and gdistill
            # is wanted only as the pgdistill stage's teacher.
            modes[f"gdistill{g_tag}{base_steps}_1fwd_enc2"] = sample_mode(
                g_diff, g_params, enc_cache=2
            )

    if "pgdistill" in wanted:
        # stage 2 ON stage 1 (Meng et al. 2210.03142 pipeline order):
        # progressively halve the GUIDED student 250 -> 125. The guided
        # student is already unguided, so ProgressiveDistiller's guidance
        # stripping is exact here — this measures the full two-stage
        # pipeline's quality at 125 DDIM steps / 1 forward each (4x fewer
        # model calls than the exact 250-step doubled-batch CFG chain).
        # The student's variance head gets no training signal, so it
        # samples deterministic DDIM; `gdistill250_ddim` is the matched
        # control (same guided weights, DDIM eta=0 at 250) separating the
        # DDPM-vs-DDIM sampler change from the halving loss itself.
        if "gdistill" not in wanted:
            print("pgdistill needs gdistill in QE_MODES; skipping")
        else:
            from nicediffusion_tpu.training.distill import (
                ProgressiveDistiller,
            )

            gd_ddim = Diffusion(model=model, **dict(
                samp_args, guidance_method=None, guidance_strength=None,
                use_ddim=True, ddim_eta=0.0, prediction_type=g_pred,
            ))
            print(f"sampling: gdistill{g_tag}{base_steps}_ddim control...")
            modes[f"gdistill{g_tag}{base_steps}_ddim"] = sample_mode(
                gd_ddim, g_params
            )

            psteps = int(os.environ.get("QE_PGDISTILL_STEPS", gsteps))
            p_ckpt = os.environ.get("QE_PGDISTILL_CKPT")
            rounds = int(os.environ.get("QE_PGDISTILL_ROUNDS", 1))
            p_varw = os.environ.get("QE_PGDISTILL_VARW")
            p_varw = float(p_varw) if p_varw else None
            p_params = p_diff = None
            # chained halving rounds (scripts/distill.py order): round
            # r+1's teacher grid is the PREVIOUS student's exact nested
            # grid via timestep_indices — an even re-respacing at N/2
            # would land on timesteps the student was never trained on
            t_params, t_args = g_params, dict(
                DIFF_TRAIN_ARGS, rescaled_num_steps=base_steps,
                prediction_type=g_pred,
            )
            for r in range(1, rounds + 1):
                n_t = t_args["rescaled_num_steps"]
                if n_t % 2:
                    print(f"pgdistill round {r}: cannot halve odd "
                          f"step count {n_t}; stopping at round {r - 1}")
                    break
                pd = ProgressiveDistiller(
                    model, t_params, t_args,
                    shifted_synthetic(batch, seed=4 + r),
                    iterations=psteps,
                    lr=1e-4, lr_schedule="warmup_cosine",
                    var_weight=p_varw,
                )
                # round 1 keeps the bare QE_PGDISTILL_CKPT path
                # (backward-compatible); later rounds suffix .r{r}
                ck = p_ckpt if (p_ckpt and r == 1) else (
                    f"{p_ckpt}.r{r}" if p_ckpt else None
                )
                if ck and os.path.exists(ck):
                    import flax.serialization

                    print(f"reusing round-{r} progressive student "
                          f"from {ck}...")
                    with open(ck, "rb") as f:
                        p_params = jax.tree.map(
                            jnp.asarray,
                            flax.serialization.from_bytes(
                                pd.state.params, f.read()
                            ),
                        )  # device-resident (QE_CKPT restore note)
                    p_diff = pd.student
                else:
                    print(f"progressive distillation round {r}/{rounds} "
                          f"({psteps} steps, {n_t} -> {n_t // 2})...")
                    p_params, p_diff = pd.run(
                        log_every=max(psteps // 8, 1)
                    )
                    if ck:
                        import flax.serialization

                        with open(ck, "wb") as f:
                            f.write(flax.serialization.to_bytes(p_params))
                        print(f"saved round-{r} progressive student "
                              f"to {ck}")
                n_s = p_diff.rescaled_num_steps
                modes[f"pgdistill{g_tag}{n_s}_1fwd"] = sample_mode(
                    p_diff, p_params
                )
                if r == rounds:
                    # serving-stack bound only for the final student
                    modes[f"pgdistill{g_tag}{n_s}_1fwd_enc2"] = sample_mode(
                        p_diff, p_params, enc_cache=2
                    )
                t_params = p_params
                t_args = dict(
                    DIFF_TRAIN_ARGS, rescaled_num_steps=n_s,
                    timestep_indices=np.asarray(p_diff.timestep_map),
                    prediction_type=g_pred,
                )
            if (p_diff is not None
                    and os.environ.get(
                        "QE_PGDISTILL_DDPM",
                        "1" if p_varw is not None else "0") == "1"):
                # Stochastic DDPM on the student's nested grid. With the
                # TEACHER-INHERITED variance head this was measured
                # non-viable at the 8000-step budget (2026-08-20,
                # BASELINE.md: the shared trunk drifts during halving and
                # the stale head mis-calibrates — Fréchet 715 vs 340 for
                # eta=0 DDIM), so it defaults off — EXCEPT when
                # QE_PGDISTILL_VARW trained the head (VLB on the halved
                # grid), which is exactly what these rows then measure.
                n_s = p_diff.rescaled_num_steps
                pd_ddpm = Diffusion(model=model, **dict(
                    samp_args, guidance_method=None, guidance_strength=None,
                    rescaled_num_steps=n_s,
                    timestep_indices=np.asarray(p_diff.timestep_map),
                    prediction_type=g_pred,
                ))
                var_src = ("vlb-trained" if p_varw is not None
                           else "teacher-inherited")
                print(f"sampling: pgdistill{g_tag}{n_s}_ddpm (stochastic, "
                      f"{var_src} variance head)...")
                modes[f"pgdistill{g_tag}{n_s}_ddpm"] = sample_mode(
                    pd_ddpm, p_params
                )
                modes[f"pgdistill{g_tag}{n_s}_ddpm_enc2"] = sample_mode(
                    pd_ddpm, p_params, enc_cache=2
                )
            if (p_diff is not None
                    and os.environ.get("QE_PGDISTILL_ETA1", "1") == "1"):
                # Stochastic DDIM (eta=1): the noise scale is SCHEDULE-
                # derived (sigma^2 = (1-acp_prev)/(1-acp)*(1-acp/acp_prev)),
                # so it needs no learned variance at all — immune to the
                # trunk drift that breaks the DDPM row above, at identical
                # per-step cost to eta=0. If the eta=0 quality deficit is
                # the determinism (the harness-scale hypothesis), these
                # rows recover it. gdistill*_eta1 is the matched unhalved
                # control.
                g_eta1 = Diffusion(model=model, **dict(
                    samp_args, guidance_method=None, guidance_strength=None,
                    use_ddim=True, ddim_eta=1.0, prediction_type=g_pred,
                ))
                print(f"sampling: gdistill{g_tag}{base_steps}_eta1 "
                      "control...")
                modes[f"gdistill{g_tag}{base_steps}_eta1"] = sample_mode(
                    g_eta1, g_params
                )
                n_s = p_diff.rescaled_num_steps
                pd_eta1 = Diffusion(model=model, **dict(
                    samp_args, guidance_method=None, guidance_strength=None,
                    use_ddim=True, ddim_eta=1.0,
                    rescaled_num_steps=n_s,
                    timestep_indices=np.asarray(p_diff.timestep_map),
                    prediction_type=g_pred,
                ))
                print(f"sampling: pgdistill{g_tag}{n_s}_eta1 (stochastic "
                      "DDIM, schedule-derived noise)...")
                modes[f"pgdistill{g_tag}{n_s}_eta1"] = sample_mode(
                    pd_eta1, p_params
                )
                modes[f"pgdistill{g_tag}{n_s}_eta1_enc2"] = sample_mode(
                    pd_eta1, p_params, enc_cache=2
                )

    # real-data reference features
    gen = shifted_synthetic(eval_n, seed=9)
    x_real, y_real = next(gen)
    real_logits = logits_np(x_real)

    # pixel-space class prototypes from real data (diagnostic secondary
    # metric: nearest-prototype accuracy is classifier-free evidence of
    # whether conditioning carries through sampling)
    protos = np.stack([
        x_real[np.asarray(y_real) == c].mean(0).ravel()
        if (np.asarray(y_real) == c).any() else np.zeros(x_real[0].size)
        for c in range(1, 28)
    ])

    def proto_dists(images):
        """[N, 27] squared distances to the class prototypes, via the
        matmul identity (the naive [N, 27, pixels] broadcast is ~1 GB at
        eval_n=2048 on the 64x64 arch)."""
        flat = images.reshape(len(images), -1).astype(np.float64)
        return (
            (flat ** 2).sum(1)[:, None]
            - 2.0 * flat @ protos.T
            + (protos ** 2).sum(1)[None]
        )

    # ---- statistics (VERDICT r3 #3: error bars, not point estimates) ----
    # eval_n samples split into k = eval_n // chunk independent chunks
    # (each chunk was sampled under its own rng fold in sample_mode); a
    # mean +/- s.e. over chunks makes the mode-vs-mode deltas testable
    # against sampling noise instead of single 256-sample point reads.
    chunk = min(int(os.environ.get("QE_CHUNK", 256)), eval_n)
    k = eval_n // chunk
    n_stat = k * chunk  # chunk statistics ignore any ragged remainder

    def acc_stats(correct):
        """(full-set acc, s.e. of the mean over k chunks)."""
        full = float(correct.mean())
        if k < 2:
            return full, None
        accs = np.asarray([
            correct[i * chunk:(i + 1) * chunk].mean() for i in range(k)
        ])
        se = float(accs.std(ddof=1) / np.sqrt(k))
        return full, se

    def frechet_jackknife(lg):
        """(full-set Frechet, leave-one-chunk-out jackknife s.e.)."""
        fd = frechet(lg, real_logits)
        if k < 2:
            return fd, None
        fds = []
        for i in range(k):
            mask = np.ones(len(lg), bool)
            mask[i * chunk:(i + 1) * chunk] = False
            fds.append(frechet(lg[mask], real_logits))
        fds = np.asarray(fds)
        se = float(np.sqrt((k - 1) / k * ((fds - fds.mean()) ** 2).sum()))
        return fd, se

    def rounded(x, nd=4):
        return None if x is None else round(x, nd)

    results = {}
    for name, samples in modes.items():
        # A numerically diverged mode (NaN/inf samples — e.g. an unstable
        # stochastic chain) must not abort the whole report: record its
        # non-finite fraction and skip the stats that require finiteness
        # instead of letting np.linalg raise mid-loop (observed with the
        # var-trained halved student's DDPM row, 2026-08-20).
        finite = np.isfinite(samples).all(axis=tuple(range(1, samples.ndim)))
        nonfinite_frac = float(1.0 - finite.mean())
        if nonfinite_frac > 0:
            print(json.dumps({
                "mode": name, "nonfinite_sample_frac": round(nonfinite_frac, 4),
                "note": "samples diverged; finiteness-requiring stats skipped",
            }))
            results[name] = {"nonfinite_sample_frac": nonfinite_frac}
            continue
        lg = logits_np(samples)
        acc, acc_se = acc_stats(lg.argmax(-1) == np.asarray(y_eval))
        fd, fd_se = frechet_jackknife(lg)
        d = proto_dists(samples)
        p_acc, p_se = acc_stats(d.argmin(1) + 1 == np.asarray(y_eval))
        dev = np.abs(samples - modes["exact"])
        results[name] = {
            "classifier_acc": round(acc, 4),
            "classifier_acc_se": rounded(acc_se),
            "proto_acc": round(p_acc, 4),
            "proto_acc_se": rounded(p_se),
            "logit_frechet_vs_real": round(fd, 4),
            "logit_frechet_se": rounded(fd_se, 2),
            "max_pixel_dev_vs_exact": round(float(dev.max()), 4),
            "mean_pixel_dev_vs_exact": round(float(dev.mean()), 5),
        }
        print(json.dumps({"mode": name, **results[name]}))
    if k >= 2:
        print(json.dumps({
            "stats": {"eval_n": eval_n, "chunks": k, "chunk_size": chunk,
                      "n_in_chunk_stats": n_stat}
        }))

    real_acc = float((real_logits.argmax(-1) == np.asarray(y_real)).mean())
    d_real = proto_dists(x_real)
    real_proto = float((d_real.argmin(1) + 1 == np.asarray(y_real)).mean())
    print(json.dumps({"mode": "real_data", "classifier_acc": round(real_acc, 4),
                      "proto_acc": round(real_proto, 4),
                      "logit_frechet_vs_real": 0.0}))


if __name__ == "__main__":
    main()
