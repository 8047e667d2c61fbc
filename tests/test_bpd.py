"""Tests for the full-chain NLL evaluation (Diffusion.bpd + tools/eval_nll),
a capability extension (the reference has no evaluation metrics —
README.md:65 TODO). Checks the prior term against the closed form, internal
consistency (total = sum of VLB terms + prior), that a better eps-predictor
scores a better bound, and the CLI tool's JSON output."""

import json
import os
import subprocess
import sys

import numpy as np

import jax
import jax.numpy as jnp

from nicediffusion_tpu.diffusion.process import Diffusion

from test_dpmpp import DeltaOracle, GaussianOracle, _make, _original_acp


class ZeroEpsModel(DeltaOracle):
    def __init__(self):
        pass

    def apply(self, variables, x, t):
        return jnp.zeros_like(x)


def test_prior_bpd_closed_form():
    probe = _make(None, 10, "ddpm")
    model = ZeroEpsModel()
    diff = _make(model, 10, "ddpm")
    x0 = 0.5 * jnp.ones((3, 8, 8, 1), dtype=jnp.float32)
    out = diff.bpd(None, x0, jax.random.PRNGKey(0))
    acp_T = float(np.asarray(probe._acp)[-1])
    # KL(N(sqrt(acp) x0, (1-acp) I) || N(0, I)) per dim, in bits
    expected = 0.5 * (
        acp_T * 0.25 + (1 - acp_T) - 1.0 - np.log(1 - acp_T)
    ) / np.log(2.0)
    np.testing.assert_allclose(
        np.asarray(out["prior_bpd"]), expected, rtol=1e-4
    )


def test_bpd_internal_consistency_and_shapes():
    diff = _make(ZeroEpsModel(), 12, "ddpm")
    x0 = jax.random.uniform(
        jax.random.PRNGKey(1), (2, 8, 8, 1), minval=-1, maxval=1
    )
    out = diff.bpd(None, x0, jax.random.PRNGKey(2))
    assert out["vlb_terms"].shape == (12, 2)
    assert out["mse_terms"].shape == (12, 2)
    np.testing.assert_allclose(
        np.asarray(out["total_bpd"]),
        np.asarray(out["vlb_terms"]).sum(0) + np.asarray(out["prior_bpd"]),
        rtol=1e-5,
    )
    assert np.isfinite(np.asarray(out["total_bpd"])).all()
    assert (np.asarray(out["total_bpd"]) > 0).all()


def test_better_model_scores_better_bound():
    """The optimal eps-predictor for the data must beat a zero predictor on
    both the VLB and the per-t MSE profile."""
    probe = _make(None, 10, "ddpm")
    acp = _original_acp(probe)
    rng = jax.random.PRNGKey(3)
    x0 = 0.5 * jax.random.normal(rng, (4, 8, 8, 1), dtype=jnp.float32)
    x0 = jnp.clip(x0, -1, 1)

    good = _make(GaussianOracle(0.5, acp), 10, "ddpm").bpd(
        None, x0, jax.random.PRNGKey(4)
    )
    bad = _make(ZeroEpsModel(), 10, "ddpm").bpd(
        None, x0, jax.random.PRNGKey(4)
    )
    assert float(good["total_bpd"].mean()) < float(bad["total_bpd"].mean())
    assert float(good["mse_terms"].mean()) < float(bad["mse_terms"].mean())


def test_bpd_profiles_are_in_natural_timestep_order():
    """mse_terms row i must correspond to rescaled timestep t == i: with a
    model predicting eps = t/1000, the per-t eps-MSE ~ 1 + (t/1000)^2 grows
    with t, so the profile must be (statistically) increasing, not mirrored."""

    class TimeBiasEps(DeltaOracle):
        def __init__(self):
            pass

        def apply(self, variables, x, t):
            c = (t.astype(jnp.float32) / 1000.0).reshape(
                (-1,) + (1,) * (x.ndim - 1)
            )
            return jnp.broadcast_to(c, x.shape)

    diff = _make(TimeBiasEps(), 10, "ddpm")
    x0 = jax.random.uniform(
        jax.random.PRNGKey(5), (8, 8, 8, 1), minval=-1, maxval=1
    )
    out = diff.bpd(None, x0, jax.random.PRNGKey(6))
    mse = np.asarray(out["mse_terms"]).mean(axis=1)  # [T]
    # mapped timesteps grow with row index iff natural order; compare the
    # low-t and high-t halves (noise makes strict monotonicity too brittle)
    assert mse[-3:].mean() > mse[:3].mean(), mse


def test_eval_nll_cli_tool():
    """Smoke the CLI tool end-to-end on a random EMNIST-preset checkpoint."""
    import flax  # noqa: F401  (ensures deps present before subprocess)

    from nicediffusion_tpu.models.unet import DiffusionModel
    from nicediffusion_tpu.utils.checkpoint import save_params_npz
    from nicediffusion_tpu.utils.config import MODEL_PRESETS

    model = DiffusionModel(**MODEL_PRESETS["EMNIST"])
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )["params"]
    path = "/tmp/EMNIST_bpd_test.npz"
    save_params_npz(params, path)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "eval_nll.py"),
         "--model_path", path, "--batch_size", "2", "--num_batches", "1",
         "--cpu"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": ""},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["num_images"] == 2
    assert report["chain_steps"] == 25
    assert np.isfinite(report["total_bpd"]) and report["total_bpd"] > 0
    assert np.isfinite(report["prior_bpd"])
