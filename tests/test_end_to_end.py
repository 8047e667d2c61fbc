"""End-to-end integration: train -> checkpoint -> export -> sample, through
the real CLIs and the library, on synthetic data (slow tests)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax


REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run(args, cwd, timeout=900):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env, timeout=timeout,
        capture_output=True, text=True,
    )


@pytest.mark.slow
def test_train_cli_then_export_then_sample_cli(tmp_path):
    """train.py (synthetic) -> orbax checkpoint -> export.py -> .npz ->
    sample.py loads it via the EMNIST preset and writes images."""
    r = _run(
        [f"{REPO}/scripts/train.py", "--synthetic", "--iterations", "3",
         "--batch_size", "4", "--save_every", "100"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "checkpoints" / "step_3").is_dir()
    assert (tmp_path / "metrics.jsonl").exists()
    metrics = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert metrics and "loss" in metrics[0]

    r = _run(
        [f"{REPO}/scripts/export.py", "--input", "checkpoints/step_3",
         "--output", "EMNIST_trained.npz", "--part", "ema_params"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    # train.py adds the CFG null class (num_classes 28); sampling via the
    # default EMNIST preset (27) must fail the shape check, matching the
    # documented reference inconsistency (README divergence #5)...
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    r = _run(
        [f"{REPO}/scripts/sample.py", "--model_path", "EMNIST_trained.npz",
         "--batch_size", "2", "--num_samples", "1", "--save_path",
         f"{out_dir}/", "--cpu", "--custom",
         "--resolution", "28", "--model_channels", "64",
         "--channel_mult", "1/2/4", "--num_res_blocks", "2",
         "--attention_resolutions", "7/14", "--num_classes", "27",
         "--num_heads", "4", "--in_channels", "1", "--dropout", "0.05",
         "--split_qkv_first", "--resblock_updown", "--use_adaptive_gn",
         "--rescaled_num_steps", "10", "--original_num_steps", "1000",
         "--beta_schedule", "cosine",
         "--sampling_var_type", "learned_interpolation",
         "--guidance_method", "classifier_free", "--guidance_strength", "0.8",
         "--labels", "3", "--seed", "0"],
        cwd=tmp_path,
    )
    # ... with --num_classes 27 + classifier_free the derivation gives 28,
    # exactly the trained shape, so this succeeds end-to-end.
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    files = list(out_dir.iterdir())
    assert files, "sample.py wrote no images"

    # the composed max serving stack through the CLI: int8 calibration +
    # encoder cache + limited-interval guidance in ONE invocation (the
    # bench.py max_stack configuration; README serving example)
    stack_dir = tmp_path / "out_stack"
    stack_dir.mkdir()
    r = _run(
        [f"{REPO}/scripts/sample.py", "--model_path", "EMNIST_trained.npz",
         "--batch_size", "2", "--num_samples", "1", "--save_path",
         f"{stack_dir}/", "--cpu", "--custom",
         "--dtype", "int8", "--encoder_cache", "2",
         "--guidance_interval", "0.1", "0.7",
         "--resolution", "28", "--model_channels", "64",
         "--channel_mult", "1/2/4", "--num_res_blocks", "2",
         "--attention_resolutions", "7/14", "--num_classes", "27",
         "--num_heads", "4", "--in_channels", "1", "--dropout", "0.05",
         "--split_qkv_first", "--resblock_updown", "--use_adaptive_gn",
         "--rescaled_num_steps", "10", "--original_num_steps", "1000",
         "--beta_schedule", "cosine",
         "--sampling_var_type", "learned_interpolation",
         "--guidance_method", "classifier_free", "--guidance_strength", "0.8",
         "--labels", "3", "--seed", "0"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    assert list(stack_dir.iterdir()), "stacked sample.py wrote no images"


@pytest.mark.slow
def test_training_learns_data_distribution(tmp_path):
    """A tiny model trained on an off-centre synthetic distribution must
    produce samples pulled toward it — validates the full learning loop
    (loss -> grads -> optimizer -> live params -> sampler) beyond loss
    descent."""
    from nicediffusion_tpu.diffusion.process import Diffusion
    from nicediffusion_tpu.models.unet import DiffusionModel
    from nicediffusion_tpu.training.trainer import Trainer

    def batches(batch, res=8, seed=0):
        rng = np.random.default_rng(seed)
        while True:
            x = rng.normal(size=(batch, res, res, 1)) * 0.05 + 0.6
            yield np.clip(x, -1, 1).astype(np.float32), None

    model = DiffusionModel(
        resolution=8, in_channels=1, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        num_heads=2, num_classes=None, dropout=0.0, resblock_updown=True,
        use_adaptive_gn=True, split_qkv_first=True,
    )
    diff_args = dict(
        original_num_steps=50, rescaled_num_steps=50,
        sampling_var_type="learned_interpolation", loss_type="hybrid",
        beta_schedule="cosine", guidance_method=None, guidance_strength=None,
    )
    trainer = Trainer(
        model=model, diffusion_args=dict(diff_args),
        dataloader=batches(32), iterations=0, batch_size=32,
        lr=3e-3, weight_decay=1e-5, checkpoint_dir=str(tmp_path), seed=0,
        label_drop_prob=0.0,
    )
    for _ in range(250):
        batch, labels = next(trainer.loader)
        batch, labels = trainer._shard_batch(batch, labels)
        trainer.rng, step_rng = jax.random.split(trainer.rng)
        trainer.state, m = trainer._train_step(
            trainer.state, batch, labels, step_rng
        )

    sampler = Diffusion(model=model, **diff_args)
    # live params (EMA at rate 0.9999 barely moves in 250 steps)
    out = sampler.denoise(
        trainer.state.params, jax.random.PRNGKey(42), batch_size=16
    )
    sample_mean = float(out.mean())
    # untrained output mean is ~0; data mean is +0.6
    assert sample_mean > 0.3, sample_mean


def test_cli_smoke_train_export_sample(tmp_path):
    """Default-suite (non-slow) CLI wiring smoke (VERDICT r3 #9): a tiny
    model through the REAL CLIs — train.py (2 synthetic iterations, model
    shrunk via the model-group overrides) -> orbax checkpoint ->
    export.py -> .npz -> sample.py (--custom, 2-step chain) -> image file.
    The full-size EMNIST variants stay in the slow tests above."""
    tiny = [
        "--model_channels", "32", "--channel_mult", "1/2",
        "--num_res_blocks", "1", "--attention_resolutions", "7",
    ]
    r = _run(
        [f"{REPO}/scripts/train.py", "--synthetic", "--iterations", "2",
         "--batch_size", "4", "--save_every", "100", "--no_grad_checkpoint",
         *tiny],
        cwd=tmp_path, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "checkpoints" / "step_2").is_dir()
    metrics = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert metrics and np.isfinite(metrics[0]["loss"])

    r = _run(
        [f"{REPO}/scripts/export.py", "--input", "checkpoints/step_2",
         "--output", "tiny.npz", "--part", "ema_params"],
        cwd=tmp_path, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    out_dir = tmp_path / "out"
    out_dir.mkdir()
    r = _run(
        [f"{REPO}/scripts/sample.py", "--model_path", "tiny.npz",
         "--batch_size", "2", "--num_samples", "1", "--save_path",
         f"{out_dir}/", "--cpu", "--custom",
         "--resolution", "28", "--model_channels", "32",
         "--channel_mult", "1/2", "--num_res_blocks", "1",
         "--attention_resolutions", "7", "--num_classes", "27",
         "--num_heads", "4", "--in_channels", "1", "--dropout", "0.05",
         "--split_qkv_first", "--resblock_updown", "--use_adaptive_gn",
         "--rescaled_num_steps", "2", "--original_num_steps", "1000",
         "--beta_schedule", "cosine",
         "--sampling_var_type", "learned_interpolation",
         "--guidance_method", "classifier_free", "--guidance_strength", "0.8",
         "--labels", "3", "--seed", "0"],
        cwd=tmp_path, timeout=600,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    assert list(out_dir.iterdir()), "sample.py wrote no images"
