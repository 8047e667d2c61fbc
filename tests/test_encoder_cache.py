"""Encoder-feature caching tests ("Faster Diffusion" serving mode; opt-in
lossy acceleration, no reference analogue): the embed/encode/decode split
must compose bitwise to the monolithic forward; encoder_cache=1 must equal
the plain sampler exactly for every sampler type; k>1 must stay finite,
in-range, and strongly correlated with the exact chain; unsupported
configurations must fail loudly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nicediffusion_tpu.diffusion.process import Diffusion
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
    # perturb so zero-initialised output convs contribute signal
    params = jax.tree.map(
        lambda p: p + 0.01 * np.sin(np.arange(p.size)).reshape(p.shape)
        .astype(np.float32),
        params,
    )
    return model, params


def _diffusion(model, sampler="ddpm", steps=10):
    return Diffusion(
        model=model,
        original_num_steps=100,
        rescaled_num_steps=steps,
        sampling_var_type="learned_interpolation",
        loss_type="hybrid",
        beta_schedule="cosine",
        guidance_method="classifier_free",
        guidance_strength=0.8,
        sampler=sampler,
        use_ddim=sampler == "ddim",
        ddim_eta=0.0,
    )


def test_split_forward_composes_exactly(model_and_params):
    model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
    t = jnp.array([3, 7])
    y = jnp.array([1, 2])
    full = model.apply({"params": params}, x, t, y)
    emb = model.apply({"params": params}, t, y, method=model.embed)
    h, xs = model.apply({"params": params}, x, emb, method=model.encode)
    split = model.apply({"params": params}, h, xs, emb, method=model.decode)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(split))


@pytest.mark.parametrize("sampler", ["ddpm", "ddim", "dpm++"])
def test_cache_period_one_is_exact(model_and_params, sampler):
    model, params = model_and_params
    diff = _diffusion(model, sampler)
    y = jnp.array([1, 2])
    plain = diff.denoise(params, jax.random.PRNGKey(2), y=y, batch_size=2)
    k1 = diff.denoise(
        params, jax.random.PRNGKey(2), y=y, batch_size=2, encoder_cache=1
    )
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(k1))


@pytest.mark.parametrize("sampler", ["ddpm", "dpm++"])
@pytest.mark.parametrize("k", [2, 3])
def test_cached_sampling_close_to_exact(model_and_params, sampler, k):
    """k of 10 steps not dividing evenly exercises the plain tail scan."""
    model, params = model_and_params
    diff = _diffusion(model, sampler)
    y = jnp.array([1, 2])
    plain = np.asarray(
        diff.denoise(params, jax.random.PRNGKey(2), y=y, batch_size=2)
    )
    cached = np.asarray(
        diff.denoise(
            params, jax.random.PRNGKey(2), y=y, batch_size=2, encoder_cache=k
        )
    )
    assert np.isfinite(cached).all()
    assert np.abs(cached).max() <= 1.0 + 1e-5  # clip_x keeps range
    corr = np.corrcoef(plain.ravel(), cached.ravel())[0, 1]
    # lossy but strongly correlated, even on this quasi-random model
    # (measured 0.997-1.000 across samplers at k in {2, 3})
    assert corr > 0.98, (sampler, k, corr)


def test_cache_period_beyond_chain_is_clamped(model_and_params):
    """k > steps must clamp to one group (1 refresh + rest cached), not
    silently disable caching; result must differ from the exact chain
    (proving the cache engaged) yet stay finite and in range."""
    model, params = model_and_params
    diff = _diffusion(model, "ddpm", steps=6)
    y = jnp.array([1, 2])
    plain = np.asarray(
        diff.denoise(params, jax.random.PRNGKey(7), y=y, batch_size=2)
    )
    clamped = np.asarray(
        diff.denoise(
            params, jax.random.PRNGKey(7), y=y, batch_size=2,
            encoder_cache=50,
        )
    )
    assert np.isfinite(clamped).all()
    assert np.abs(clamped).max() <= 1.0 + 1e-5
    assert np.abs(clamped - plain).max() > 1e-6


def test_cache_rejects_model_kwargs(model_and_params):
    model, params = model_and_params
    diff = _diffusion(model).with_model_kwargs(low_res=jnp.zeros((2, 8, 8, 1)))
    with pytest.raises(NotImplementedError):
        diff.denoise(
            params, jax.random.PRNGKey(0), y=jnp.array([1, 2]),
            batch_size=2, encoder_cache=2,
        )


def test_cache_rejects_models_without_split():
    class Opaque:
        conditional = False
        resolution = 8
        in_channels = 1

        def apply(self, variables, x, t):
            return jnp.zeros_like(x)

    diff = Diffusion(
        model=Opaque(), original_num_steps=100, rescaled_num_steps=5,
        sampling_var_type="small", loss_type="simple",
        beta_schedule="cosine",
    )
    with pytest.raises(NotImplementedError):
        diff.denoise(
            None, jax.random.PRNGKey(0), batch_size=1, encoder_cache=2
        )


def test_cli_encoder_cache_flag():
    from nicediffusion_tpu.utils.cli import get_dicts_from_args, make_argparser

    parser = make_argparser("diff_sample")
    args = parser.parse_args(
        ["--model_path", "64x64_diffusion.pt", "--batch_size", "2",
         "--num_samples", "1", "--encoder_cache", "2"]
    )
    other, _, _ = get_dicts_from_args(args)
    assert other["encoder_cache"] == 2
