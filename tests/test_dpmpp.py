"""DPM-Solver++(2M) sampler tests (capability extension, no reference
analogue): coefficient-table boundary handling, first-order equivalence
with DDIM(eta=0), exactness on a delta-data oracle, 2nd-order convergence
on a Gaussian-data oracle against a fine-grained DDIM ground truth over a
shared lambda grid, partial-denoise first-step masking, and CLI plumbing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nicediffusion_tpu.diffusion.process import Diffusion


def _make(model, steps, sampler, original=1000, **kw):
    return Diffusion(
        model=model,
        original_num_steps=original,
        rescaled_num_steps=steps,
        sampling_var_type="small",
        loss_type="simple",
        beta_schedule="cosine",
        sampler=sampler,
        use_ddim=sampler == "ddim",
        ddim_eta=0.0,
        **kw,
    )


def _original_acp(diff):
    """Original-chain alphas_cumprod with the rescaled chain's entries
    scattered at their mapped indices (exact by IDDPM eq. 19 construction:
    respacing keeps strided alphas_cumprod values). The oracle models below
    only ever read mapped entries."""
    full = np.full(diff.original_num_steps, np.nan)
    full[np.asarray(diff.timestep_map)] = np.asarray(diff._acp, np.float64)
    return np.nan_to_num(full, nan=0.5)


class DeltaOracle:
    """Optimal eps-predictor for data = delta(mu): eps = (x - a_t mu)/s_t.

    pred_x0 is exactly mu at every step, so DDIM(eta=0) *and* DPM++ are
    exact at any step count — an algebraic exactness probe. Mimics the flax
    module surface Diffusion uses (apply/conditional/resolution/in_channels);
    receives mapped original-chain timesteps (process.py _apply_model).
    """

    conditional = False
    resolution = 8
    in_channels = 1

    def __init__(self, mu, acp_full):
        self.mu = mu
        self.acp = jnp.asarray(acp_full, dtype=jnp.float32)

    def apply(self, variables, x, t):
        acp_t = self.acp[t].reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - jnp.sqrt(acp_t) * self.mu) / jnp.sqrt(1.0 - acp_t)


class GaussianOracle(DeltaOracle):
    """Optimal eps-predictor for data = N(0, s^2 I):
    E[eps | x_t] = sigma_t * x_t / (alpha_t^2 s^2 + sigma_t^2).

    x0-prediction varies with (x, t), so the probability-flow ODE is a
    genuine time-varying linear ODE — coarse solvers incur real integration
    error and solver order is observable.
    """

    def __init__(self, s, acp_full):
        self.s2 = s * s
        self.acp = jnp.asarray(acp_full, dtype=jnp.float32)

    def apply(self, variables, x, t):
        acp_t = self.acp[t].reshape((-1,) + (1,) * (x.ndim - 1))
        sig = jnp.sqrt(1.0 - acp_t)
        return sig * x / (acp_t * self.s2 + (1.0 - acp_t))


def _betas_from_lambda(lam):
    """Betas whose chain hits exactly acp = sigmoid(2 * lambda) per index
    (index 0 = least noisy = largest lambda)."""
    acp = 1.0 / (1.0 + np.exp(-2.0 * np.asarray(lam, np.float64)))
    prev = np.concatenate([[1.0], acp[:-1]])
    return 1.0 - acp / prev


def test_dpmpp_tables_finite_and_boundaries():
    diff = _make(None, 25, "dpm++")
    c_xt = np.asarray(diff._dpmpp_c_xt)
    c_d = np.asarray(diff._dpmpp_c_d)
    m = np.asarray(diff._dpmpp_m)
    assert np.isfinite(c_xt).all() and np.isfinite(c_d).all()
    assert np.isfinite(m).all()
    # t==0: sigma_prev == 0 -> pure x0 projection
    assert c_xt[0] == 0.0
    assert np.isclose(c_d[0], 1.0)
    assert m[0] == 0.0 and m[-1] == 0.0
    assert (m[1:-1] > 0).all()


def test_dpmpp_first_step_matches_ddim():
    """With no history the 2M update is first-order, which algebraically
    equals a DDIM(eta=0) step: x' = alpha_prev * x0 + sigma_prev * eps."""
    probe = _make(None, 10, "ddpm")
    mu = 0.6 * jnp.ones((1, 8, 8, 1), dtype=jnp.float32)
    model = DeltaOracle(mu, _original_acp(probe))
    ddim = _make(model, 10, "ddim")
    dpm = _make(model, 10, "dpm++")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1))
    t = jnp.full((2,), 9, dtype=jnp.int32)
    x_ddim, x0_ddim = ddim.ddim_step(None, x, t, noise=jnp.zeros_like(x))
    x_dpm, x0_dpm = dpm.dpmpp_step(None, x, t, jnp.zeros_like(x))
    np.testing.assert_allclose(np.asarray(x0_dpm), np.asarray(x0_ddim), atol=1e-6)
    np.testing.assert_allclose(np.asarray(x_dpm), np.asarray(x_ddim), atol=1e-5)


def test_dpmpp_first_flag_forces_first_order():
    probe = _make(None, 10, "ddpm")
    model = GaussianOracle(0.5, _original_acp(probe))
    dpm = _make(model, 10, "dpm++")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    t = jnp.full((2,), 5, dtype=jnp.int32)  # mid-chain: m[t] > 0
    stale = 7.0 * jnp.ones_like(x)  # garbage history
    x_first, _ = dpm.dpmpp_step(None, x, t, stale, first=True)
    x_zero_hist, _ = dpm.dpmpp_step(
        None, x, t, jnp.zeros_like(x), first=True
    )
    # with first=True the history must not leak in
    np.testing.assert_allclose(np.asarray(x_first), np.asarray(x_zero_hist))
    x_second, _ = dpm.dpmpp_step(None, x, t, stale, first=False)
    assert np.abs(np.asarray(x_second) - np.asarray(x_first)).max() > 1e-4


def test_dpmpp_exact_for_delta_data():
    """pred_x0 == mu at every step for delta data, so the sampler must land
    exactly on mu regardless of step count."""
    probe = _make(None, 7, "ddpm")
    mu = 0.6 * jnp.ones((1, 8, 8, 1), dtype=jnp.float32)
    model = DeltaOracle(mu, _original_acp(probe))
    diff = _make(model, 7, "dpm++")
    out = diff.denoise(None, jax.random.PRNGKey(3), batch_size=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(mu * jnp.ones_like(out)),
                               atol=1e-4)


def test_dpmpp_beats_ddim_at_equal_steps():
    """Shared-lambda-grid convergence test: fine (240-pt) and coarse (8-pt)
    chains share their terminal and final lambda exactly (explicit betas,
    identity respacing), and the Gaussian-data oracle answers as a function
    of (x, lambda) only — so DDIM-240 is a ground-truth ODE solution that
    both 8-step solvers target. DPM++(2M) is 2nd order; DDIM is 1st."""
    n_fine, n_coarse = 240, 8
    lam_fine = np.linspace(3.0, -3.0, n_fine)  # index 0 least noisy
    idx = np.linspace(0, n_fine - 1, n_coarse).round().astype(int)
    lam_coarse = lam_fine[idx]
    assert lam_coarse[0] == lam_fine[0] and lam_coarse[-1] == lam_fine[-1]

    def build(lam, sampler):
        betas = _betas_from_lambda(lam)
        probe = Diffusion(
            model=None, original_num_steps=len(lam),
            rescaled_num_steps=len(lam), sampling_var_type="small",
            loss_type="simple", betas=betas, sampler=sampler,
            clip_x=False,
        )
        model = GaussianOracle(0.5, _original_acp(probe))
        return Diffusion(
            model=model, original_num_steps=len(lam),
            rescaled_num_steps=len(lam), sampling_var_type="small",
            loss_type="simple", betas=betas, sampler=sampler,
            clip_x=False,
        )

    rng = jax.random.PRNGKey(42)
    x_T = jax.random.normal(rng, (4, 8, 8, 1), dtype=jnp.float32)

    truth = build(lam_fine, "ddim").denoise(None, rng, x=x_T)
    errs = {
        s: float(jnp.abs(build(lam_coarse, s).denoise(None, rng, x=x_T)
                         - truth).max())
        for s in ("ddim", "dpm++")
    }
    assert errs["dpm++"] < errs["ddim"], errs
    # 2nd order should win by a real margin, not float fuzz
    assert errs["dpm++"] < 0.5 * errs["ddim"], errs


def test_dpmpp_partial_denoise_runs():
    probe = _make(None, 20, "ddpm")
    mu = 0.3 * jnp.ones((1, 8, 8, 1), dtype=jnp.float32)
    model = DeltaOracle(mu, _original_acp(probe))
    diff = _make(model, 20, "dpm++")
    rng = jax.random.PRNGKey(4)
    x0 = 0.3 * jnp.ones((2, 8, 8, 1), dtype=jnp.float32)
    x_t = diff.diffuse(x0, rng=rng, steps_to_do=10)
    out = diff.denoise(None, rng, x=x_t, start_step=10, steps_to_do=10)
    assert np.isfinite(np.asarray(out)).all()
    # delta-data oracle: partial denoise also lands exactly on mu
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(np.asarray(mu), out.shape), atol=1e-4
    )


def test_sampler_flag_validation():
    with pytest.raises(NotImplementedError):
        _make(None, 10, "euler")
    d = _make(None, 10, None)
    assert d.sampler == "ddpm"
    d = Diffusion(
        model=None, original_num_steps=100, rescaled_num_steps=10,
        sampling_var_type="small", loss_type="simple",
        beta_schedule="cosine", use_ddim=True, ddim_eta=0.0,
    )
    assert d.sampler == "ddim"


def test_cli_sampler_flag_routes_to_diffusion_args():
    from nicediffusion_tpu.utils.cli import get_dicts_from_args, make_argparser

    parser = make_argparser("diff_sample")
    args = parser.parse_args(
        ["--model_path", "64x64_diffusion.pt", "--batch_size", "2",
         "--num_samples", "1", "--sampler", "dpm++"]
    )
    _, _, diff_args = get_dicts_from_args(args)
    assert diff_args["sampler"] == "dpm++"
    # preset dispatch (use_ddim=True for openai_64) must not clobber it
    assert diff_args["use_ddim"] is True
    d = Diffusion(model=None, **{
        k: v for k, v in diff_args.items() if k != "classifier"
    })
    assert d.sampler == "dpm++"


def test_cli_explicit_step_count_survives_preset():
    """--rescaled_num_steps overrides the preset's 25 (needed to cash in
    fast samplers); without the flag the preset default is untouched."""
    from nicediffusion_tpu.utils.cli import get_dicts_from_args, make_argparser

    parser = make_argparser("diff_sample")
    base = ["--model_path", "64x64_diffusion.pt", "--batch_size", "2",
            "--num_samples", "1"]
    _, _, d = get_dicts_from_args(
        parser.parse_args(base + ["--rescaled_num_steps", "20"])
    )
    assert d["rescaled_num_steps"] == 20
    _, _, d = get_dicts_from_args(parser.parse_args(base))
    assert d["rescaled_num_steps"] == 25
