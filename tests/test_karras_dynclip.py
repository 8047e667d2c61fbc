"""Tests for the Karras-sigma respacing grid and Imagen dynamic
thresholding (capability extensions — reference supports only eq.-19 even
respacing and hard [-1,1] clamping)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nicediffusion_tpu.diffusion.process import Diffusion
from nicediffusion_tpu.ops.schedule import (
    get_beta_schedule,
    respace_betas_karras,
)

from test_dpmpp import DeltaOracle, _original_acp


def _diff(model, steps, **kw):
    return Diffusion(
        model=model, original_num_steps=1000, rescaled_num_steps=steps,
        sampling_var_type="small", loss_type="simple",
        beta_schedule="cosine", sampler="dpm++", **kw,
    )


def test_karras_grid_properties():
    betas = get_beta_schedule("cosine", 1000)
    nb, tmap = respace_betas_karras(betas, 20)
    assert len(nb) == len(tmap) <= 20
    assert (np.diff(tmap) > 0).all()  # strictly ascending
    assert (nb > 0).all() and (nb <= 1).all()
    # grid must span the chain: first index near the least-noisy end,
    # last near the most-noisy end
    assert tmap[0] < 50 and tmap[-1] > 950
    # denser placement at low noise than even striding
    even_stride = 1000 // 20
    assert tmap[1] - tmap[0] < even_stride


def test_karras_coefficient_consistency():
    """The kept alphas_cumprod must equal the original chain's at the
    mapped indices (same invariant as eq.-19 respacing)."""
    d = _diff(None, 16, respacing="karras")
    betas = get_beta_schedule("cosine", 1000)
    acp_full = np.cumprod(1.0 - betas)
    np.testing.assert_allclose(
        np.asarray(d._acp, dtype=np.float64),
        acp_full[np.asarray(d.timestep_map)],
        rtol=1e-6,
    )


def test_karras_sampling_exact_for_delta_data():
    probe = _diff(None, 12, respacing="karras")
    mu = 0.5 * jnp.ones((1, 8, 8, 1), dtype=jnp.float32)
    model = DeltaOracle(mu, _original_acp(probe))
    diff = _diff(model, 12, respacing="karras")
    out = diff.denoise(None, jax.random.PRNGKey(0), batch_size=2)
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(np.asarray(mu), out.shape), atol=1e-4
    )


def test_unknown_respacing_rejected():
    with pytest.raises(NotImplementedError):
        _diff(None, 10, respacing="cosine")


def test_dynamic_thresholding_clip():
    d = _diff(None, 10, clip_x="dynamic", dynamic_threshold=0.9)
    x = jnp.concatenate(
        [jnp.linspace(-3, 3, 64).reshape(1, 8, 8, 1),
         0.5 * jnp.ones((1, 8, 8, 1))], axis=0
    )
    out = np.asarray(d._clip_x0(x))
    # sample 0: s = 90th pct of |x| (> 1) -> clamped to [-s,s], divided by s
    assert np.abs(out[0]).max() <= 1.0 + 1e-6
    # interior structure preserved (not saturated like a hard clip)
    hard = np.clip(np.asarray(x[0]), -1, 1)
    assert (np.abs(hard) == 1.0).sum() > (np.abs(out[0]) >= 1.0 - 1e-6).sum()
    # sample 1: all |x| <= 1 -> s clamps at 1 -> unchanged
    np.testing.assert_allclose(out[1], np.asarray(x[1]), atol=1e-6)


def test_invalid_clip_mode_rejected():
    with pytest.raises(NotImplementedError):
        _diff(None, 10, clip_x="soft")


def test_cli_respacing_and_dynamic_thresholding():
    from nicediffusion_tpu.utils.cli import get_dicts_from_args, make_argparser

    parser = make_argparser("diff_sample")
    base = ["--model_path", "64x64_diffusion.pt", "--batch_size", "2",
            "--num_samples", "1"]
    _, _, d = get_dicts_from_args(
        parser.parse_args(base + ["--respacing", "karras",
                                  "--dynamic_thresholding"])
    )
    assert d["respacing"] == "karras"
    assert d["clip_x"] == "dynamic" and d["dynamic_threshold"] == 0.995
    _, _, d = get_dicts_from_args(
        parser.parse_args(base + ["--dynamic_thresholding", "0.99"])
    )
    assert d["dynamic_threshold"] == 0.99
    _, _, d = get_dicts_from_args(parser.parse_args(base))
    assert d["respacing"] == "even" and "clip_x" not in d
