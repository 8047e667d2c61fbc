"""Limited-interval classifier-free guidance (arXiv:2404.07724; opt-in
lossy serving lever, no reference analogue).

Contract under test:
  * guidance_interval=(0, 1) is EXACTLY the always-guided chain (it is
    normalised to the same compiled sampler).
  * an interval that rounds to zero guided steps equals a guidance-free
    Diffusion driving the same conditional model (one forward per step).
  * a mid-chain interval runs every sampler, stays finite/in-range, and
    genuinely skips the doubled-batch call outside the interval (checked
    structurally via the traced model-call batch sizes).
  * composes with encoder_cache (interval widened to group boundaries).
  * invalid intervals and non-CFG diffusions fail loudly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nicediffusion_tpu.diffusion.process import Diffusion, _runs
from nicediffusion_tpu.models.unet import DiffusionModel

CFG = dict(
    resolution=16,
    in_channels=1,
    model_channels=32,
    out_channels=2,
    num_res_blocks=1,
    attention_resolutions=(8,),
    channel_mult=(1, 2),
    num_heads=4,
    num_classes=5,
    dropout=0.0,
    resblock_updown=True,
    use_adaptive_gn=True,
    split_qkv_first=True,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = DiffusionModel(**CFG)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )["params"]
    params = jax.tree.map(
        lambda p: p + 0.01 * np.sin(np.arange(p.size)).reshape(p.shape)
        .astype(np.float32),
        params,
    )
    return model, params


def _diffusion(model, sampler="ddpm", steps=10, guidance="classifier_free"):
    return Diffusion(
        model=model,
        original_num_steps=100,
        rescaled_num_steps=steps,
        sampling_var_type="learned_interpolation",
        loss_type="hybrid",
        beta_schedule="cosine",
        guidance_method=guidance,
        guidance_strength=0.8 if guidance else None,
        sampler=sampler,
        use_ddim=sampler == "ddim",
        ddim_eta=0.0,
    )


def test_runs_compression():
    assert _runs([]) == []
    assert _runs([True] * 3) == [(0, 3, True)]
    assert _runs([False, True, True, False]) == [
        (0, 1, False), (1, 2, True), (3, 1, False)
    ]


@pytest.mark.parametrize("sampler", ["ddpm", "ddim", "dpm++"])
def test_full_interval_is_exact(model_and_params, sampler):
    model, params = model_and_params
    d = _diffusion(model, sampler)
    rng = jax.random.PRNGKey(3)
    y = jnp.array([1, 2])
    exact = d.denoise(params, rng, y=y, batch_size=2)
    full = d.denoise(params, rng, y=y, batch_size=2,
                     guidance_interval=(0.0, 1.0))
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(full))


@pytest.mark.parametrize("sampler", ["ddpm", "ddim", "dpm++"])
def test_empty_interval_equals_unguided(model_and_params, sampler):
    """An interval that rounds to zero guided steps == guidance-free chain
    (same conditional model call each step, same rng threading)."""
    model, params = model_and_params
    d_cfg = _diffusion(model, sampler)
    d_none = _diffusion(model, sampler, guidance=None)
    rng = jax.random.PRNGKey(4)
    y = jnp.array([1, 2])
    # (0.0, 0.01) rounds to (0, 0) at steps=10 -> no guided step
    lossy = d_cfg.denoise(params, rng, y=y, batch_size=2,
                          guidance_interval=(0.0, 0.01))
    unguided = d_none.denoise(params, rng, y=y, batch_size=2)
    np.testing.assert_allclose(
        np.asarray(lossy), np.asarray(unguided), atol=1e-6
    )


@pytest.mark.parametrize("sampler", ["ddpm", "ddim", "dpm++"])
def test_mid_interval_runs_and_differs(model_and_params, sampler):
    model, params = model_and_params
    d = _diffusion(model, sampler)
    rng = jax.random.PRNGKey(5)
    y = jnp.array([1, 2])
    exact = np.asarray(d.denoise(params, rng, y=y, batch_size=2))
    lossy = np.asarray(
        d.denoise(params, rng, y=y, batch_size=2,
                  guidance_interval=(0.2, 0.7))
    )
    assert np.all(np.isfinite(lossy))
    assert lossy.shape == exact.shape
    # guided 5 of 10 steps with w=0.8 on a perturbed model: must differ
    assert np.abs(lossy - exact).max() > 0
    # ... but stay the same chain, not noise: strong correlation
    c = np.corrcoef(lossy.ravel(), exact.ravel())[0, 1]
    assert c > 0.9, c


def test_skips_doubled_batch_outside_interval(model_and_params):
    """Structural check that the saving is real: trace the sampler and
    count model-call batch sizes per segment via a spy on apply."""
    model, params = model_and_params
    d = _diffusion(model, "ddpm", steps=10)
    calls = []
    apply_model = d._apply_model

    def traced_apply(p, x, t, y=None):
        calls.append(int(x.shape[0]))
        return apply_model(p, x, t, y)

    d._apply_model = traced_apply  # instance attr shadows the method
    try:
        y = jnp.array([1, 2])
        # each scan body is traced exactly once, so the spy records one
        # model-call batch size per segment
        d.denoise(params, jax.random.PRNGKey(6), y=y, batch_size=2,
                  guidance_interval=(0.2, 0.7))
    finally:
        del d._apply_model
        d._sampler_cache = {}
    # three segments: unguided (batch 2), guided (batch 4), unguided (2)
    assert calls == [2, 4, 2], calls


@pytest.mark.parametrize("k", [2, 3])
def test_composes_with_encoder_cache(model_and_params, k):
    model, params = model_and_params
    d = _diffusion(model, "ddpm")
    rng = jax.random.PRNGKey(7)
    y = jnp.array([1, 2])
    exact = np.asarray(d.denoise(params, rng, y=y, batch_size=2))
    lossy = np.asarray(
        d.denoise(params, rng, y=y, batch_size=2, encoder_cache=k,
                  guidance_interval=(0.2, 0.7))
    )
    assert np.all(np.isfinite(lossy))
    c = np.corrcoef(lossy.ravel(), exact.ravel())[0, 1]
    assert c > 0.9, c


def test_cached_full_interval_is_exact_cached(model_and_params):
    """gi=(0,1) under encoder_cache == the cached sampler with no gi."""
    model, params = model_and_params
    d = _diffusion(model, "ddpm")
    rng = jax.random.PRNGKey(8)
    y = jnp.array([1, 2])
    a = d.denoise(params, rng, y=y, batch_size=2, encoder_cache=2)
    b = d.denoise(params, rng, y=y, batch_size=2, encoder_cache=2,
                  guidance_interval=(0.0, 1.0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_validation(model_and_params):
    model, params = model_and_params
    d = _diffusion(model, "ddpm")
    y = jnp.array([1, 2])
    with pytest.raises(ValueError, match="0 <= lo < hi <= 1"):
        d.denoise(params, jax.random.PRNGKey(0), y=y, batch_size=2,
                  guidance_interval=(0.7, 0.2))
    with pytest.raises(ValueError, match="0 <= lo < hi <= 1"):
        d.denoise(params, jax.random.PRNGKey(0), y=y, batch_size=2,
                  guidance_interval=(-0.1, 0.5))
    d_none = _diffusion(model, "ddpm", guidance=None)
    with pytest.raises(ValueError, match="classifier-free"):
        d_none.denoise(params, jax.random.PRNGKey(0), y=y, batch_size=2,
                       guidance_interval=(0.2, 0.7))
