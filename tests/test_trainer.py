"""Trainer integration tests (SURVEY.md §4.6): loss decreases on a tiny
synthetic dataset, EMA updates, checkpoint save -> resume round-trips
bitwise, and gradient accumulation accumulates (unlike the reference bug,
trainer.py:92-96)."""

import numpy as np


import jax


from nicediffusion_tpu.models.unet import DiffusionModel
from nicediffusion_tpu.training.data import synthetic_batches
from nicediffusion_tpu.training.trainer import Trainer

TINY_MODEL = dict(
    resolution=8,
    in_channels=1,
    model_channels=32,
    out_channels=2,
    num_res_blocks=1,
    attention_resolutions=(4,),
    channel_mult=(1, 2),
    num_heads=2,
    num_classes=4,
    dropout=0.0,
    resblock_updown=True,
    use_adaptive_gn=True,
    split_qkv_first=True,
)

DIFF_ARGS = dict(
    original_num_steps=100,
    rescaled_num_steps=100,
    sampling_var_type="learned_interpolation",
    loss_type="hybrid",
    beta_schedule="cosine",
    guidance_method="classifier_free",
    guidance_strength=0.8,
)


def _make_trainer(tmp_path, iterations=12, **overrides):
    model = DiffusionModel(**TINY_MODEL)
    loader = synthetic_batches(
        batch_size=8, resolution=8, channels=1, num_classes=4, seed=1
    )
    kwargs = dict(
        model=model,
        diffusion_args=dict(DIFF_ARGS),
        dataloader=loader,
        iterations=iterations,
        batch_size=8,
        lr=2e-3,
        weight_decay=1e-4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        seed=0,
    )
    kwargs.update(overrides)
    return Trainer(**kwargs)


def test_loss_decreases_and_ema_moves(tmp_path):
    trainer = _make_trainer(tmp_path, iterations=0)
    model = trainer.model

    ema_before = jax.tree.map(np.asarray, trainer.state.ema_params)

    losses = []
    loader = trainer.loader
    for _ in range(30):
        batch, labels = next(loader)
        batch, labels = trainer._shard_batch(batch, labels)
        trainer.rng, step_rng = jax.random.split(trainer.rng)
        trainer.state, metrics = trainer._train_step(
            trainer.state, batch, labels, step_rng
        )
        losses.append(float(metrics["loss"]))

    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    assert int(trainer.state.step) == 30

    # EMA moved away from init (the reference's aliasing bug would make it
    # track the live params exactly; ours is a true EMA)
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        trainer.state.ema_params, ema_before,
    )
    assert max(jax.tree.leaves(moved)) > 0
    # ... but only slightly (rate=0.9999), so it must differ from live params
    diff = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        trainer.state.ema_params, trainer.state.params,
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_checkpoint_round_trip(tmp_path):
    trainer = _make_trainer(tmp_path, iterations=3, save_every=None)
    trainer.train()  # trains 3 steps then saves step_3

    restored = _make_trainer(tmp_path, iterations=0, resume_step=3)
    for name in ("params", "ema_params", "opt_state"):
        a = getattr(trainer.state, name)
        b = getattr(restored.state, name)
        jax.tree.map(
            lambda x, y: np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y)
            ),
            a, b,
        )
    assert int(restored.state.step) == int(trainer.state.step)


def test_grad_accumulation_applies_every_k(tmp_path):
    """With optax.MultiSteps(k=2), params change only on every 2nd step but
    all microbatch gradients contribute (fixing reference trainer.py:92-96)."""
    trainer = _make_trainer(tmp_path, iterations=0, grad_accumulation=2)
    p0 = jax.tree.map(np.asarray, trainer.state.params)

    batch, labels = next(trainer.loader)
    batch, labels = trainer._shard_batch(batch, labels)

    trainer.rng, k1 = jax.random.split(trainer.rng)
    trainer.state, _ = trainer._train_step(trainer.state, batch, labels, k1)
    p1 = jax.tree.map(np.asarray, trainer.state.params)
    # first microbatch: accumulate only, no update
    assert all(
        np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1))
    )

    trainer.rng, k2 = jax.random.split(trainer.rng)
    trainer.state, _ = trainer._train_step(trainer.state, batch, labels, k2)
    p2 = jax.tree.map(np.asarray, trainer.state.params)
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2))
    )


def test_in_training_sampling(tmp_path):
    """Trainer.sample returns uint8 NHWC images through the forced 250-step
    DDPM chain (reference trainer.py:34-36, 117-134)."""
    trainer = _make_trainer(tmp_path, iterations=0)
    assert trainer.sampling_diffusion.rescaled_num_steps == 100  # min(250, T)
    out = trainer.sample(2)
    assert out.shape == (2, 8, 8, 1)
    assert out.dtype == np.uint8


def test_synthetic_labels_match_content_across_seeds():
    """The synthetic pipeline's labels must reflect image content with
    class signatures SHARED across seeds — the sample-quality harness
    (tools/quality_eval.py) trains its UNet, classifier, and eval
    reference on different seeds. Regression: an earlier version drew
    labels independently of the per-image class index, making conditional
    labels pure noise."""
    from nicediffusion_tpu.training.data import synthetic_batches

    def pool(seed):
        return next(synthetic_batches(
            batch_size=512, resolution=16, channels=1, num_classes=8,
            seed=seed, num_distinct=256,
        ))

    xa, ya = pool(0)
    xb, yb = pool(9)
    cors = []
    for c in range(8):
        if (ya == c).any() and (yb == c).any():
            ma = xa[ya == c].mean(0).ravel()
            mb = xb[yb == c].mean(0).ravel()
            cors.append(np.corrcoef(ma, mb)[0, 1])
    assert len(cors) >= 6
    # same-class mean images agree across seeds...
    assert min(cors) > 0.3, cors
    # ...and labels are informative within a seed: nearest-class-mean on
    # held-out images from the same generator beats chance comfortably
    protos = np.stack([xa[ya == c].mean(0).ravel() for c in range(8)])
    xh, yh = pool(3)
    d = ((xh.reshape(len(xh), -1)[:, None, :] - protos[None]) ** 2).sum(-1)
    acc = (d.argmin(1) == yh).mean()
    assert acc > 0.5, acc
