"""Constructor/enum validation parity with the reference
(diffusion.py:67-91, 552-595) and partial-denoise semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nicediffusion_tpu.diffusion.process import Diffusion, LossType, VarType
from nicediffusion_tpu.models.unet import DiffusionModel

TINY = dict(
    resolution=8, in_channels=1, model_channels=32, out_channels=2,
    num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
    num_heads=2, num_classes=4, dropout=0.0, resblock_updown=True,
    use_adaptive_gn=True, split_qkv_first=True,
)

ARGS = dict(
    original_num_steps=100, rescaled_num_steps=10,
    sampling_var_type="learned_interpolation", loss_type="hybrid",
    beta_schedule="cosine",
)


def test_enum_parsers_reject_unknown():
    with pytest.raises(NotImplementedError):
        VarType.parse("tiny")
    with pytest.raises(NotImplementedError):
        LossType.parse("l2")
    # exact reference spellings accepted (KL_rescaled has mixed case)
    assert LossType.parse("KL_rescaled") == LossType.KL_RESCALED
    assert VarType.parse("learned_interpolation") == VarType.LEARNED_INTERPOLATION


def test_unknown_guidance_method_raises():
    with pytest.raises(NotImplementedError):
        Diffusion(model=DiffusionModel(**TINY), guidance_method="cfg++", **ARGS)


def test_guidance_requires_conditional_model():
    uncond = dict(TINY, num_classes=None)
    with pytest.raises(AssertionError):
        Diffusion(
            model=DiffusionModel(**uncond),
            guidance_method="classifier_free", guidance_strength=0.5, **ARGS,
        )


def test_ddim_requires_eta():
    with pytest.raises(AssertionError):
        Diffusion(model=DiffusionModel(**TINY), use_ddim=True, **ARGS)


def test_explicit_betas_accepted_and_length_checked():
    betas = np.linspace(1e-4, 0.02, 100)
    d = Diffusion(model=DiffusionModel(**TINY), betas=betas, **ARGS)
    assert d.rescaled_num_steps == 10
    with pytest.raises(ValueError):
        Diffusion(model=DiffusionModel(**TINY), betas=betas[:50], **ARGS)


def test_partial_denoise_start_step_semantics():
    """diffuse(steps) then denoise(start_step=steps) runs exactly `steps`
    reverse steps (reference sample.py:77-91 start-image mode)."""
    model = DiffusionModel(**TINY)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )["params"]
    d = Diffusion(model=model, **ARGS)

    x0 = jnp.zeros((2, 8, 8, 1))
    xt = d.diffuse(x0, rng=jax.random.PRNGKey(1), steps_to_do=4)
    out = d.denoise(
        params, jax.random.PRNGKey(2), x=xt,
        y=jnp.array([1, 2]), start_step=4, steps_to_do=4,
    )
    assert out.shape == x0.shape

    # equivalent manual chain with the same RNG schedule
    rng2, _ = jax.random.split(jax.random.PRNGKey(2))  # denoise splits internally?
    # (denoise only splits when x is None; with x given the key is used as-is)
    x = xt
    key = jax.random.PRNGKey(2)
    for t in reversed(range(4)):
        key, step_key = jax.random.split(key)
        noise = jax.random.normal(step_key, x.shape, dtype=jnp.float32)
        x, _ = d.ddpm_step(
            params, x, jnp.full((2,), t, dtype=jnp.int32),
            y=jnp.array([1, 2]), noise=noise,
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_steps_to_do_clamped_like_reference():
    """steps_to_do > start_step clamps to start_step (diffusion.py:196-197);
    diffuse clamps to the chain length (diffusion.py:148-149)."""
    model = DiffusionModel(**TINY)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )["params"]
    d = Diffusion(model=model, **ARGS)
    xt = d.diffuse(jnp.zeros((1, 8, 8, 1)), rng=jax.random.PRNGKey(0),
                   steps_to_do=99)  # clamped to 10
    out = d.denoise(
        params, jax.random.PRNGKey(1), x=xt, y=jnp.array([0]),
        start_step=5, steps_to_do=50,  # clamped to 5
    )
    assert out.shape == (1, 8, 8, 1)
