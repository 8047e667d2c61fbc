"""v-prediction tests (Diffusion(prediction_type='v'); capability
extension — the reference is eps-only): conversion identities, sampling
equivalence of an eps-model wrapped as a v-model, native-target loss
semantics, and CLI routing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nicediffusion_tpu.diffusion.process import Diffusion

from test_dpmpp import GaussianOracle, _make, _original_acp


class VOracle(GaussianOracle):
    """The GaussianOracle re-expressed in v-space: v = a*eps - s*x0_hat.

    Given the eps-oracle eps(x,t) and the induced x0 = (x - s*eps)/a:
    v = a*eps - s*(x - s*eps)/a = ((a^2 + s^2)*eps - s*x)/a
      = (eps - s*x)/a  since a^2 + s^2 = 1.
    """

    def apply(self, variables, x, t):
        acp_t = self.acp[t].reshape((-1,) + (1,) * (x.ndim - 1))
        a = jnp.sqrt(acp_t)
        s = jnp.sqrt(1.0 - acp_t)
        eps = super().apply(variables, x, t)
        return (eps - s * x) / a


def _pair(steps=10, sampler="ddim"):
    probe = _make(None, steps, "ddpm")
    acp = _original_acp(probe)
    eps_diff = Diffusion(
        model=GaussianOracle(0.5, acp), original_num_steps=1000,
        rescaled_num_steps=steps, sampling_var_type="small",
        loss_type="simple", beta_schedule="cosine", sampler=sampler,
        use_ddim=sampler == "ddim", ddim_eta=0.0,
    )
    v_diff = Diffusion(
        model=VOracle(0.5, acp), original_num_steps=1000,
        rescaled_num_steps=steps, sampling_var_type="small",
        loss_type="simple", beta_schedule="cosine", sampler=sampler,
        use_ddim=sampler == "ddim", ddim_eta=0.0, prediction_type="v",
    )
    return eps_diff, v_diff


def test_v_to_eps_conversion_identity():
    """eps-model and its exact v-space re-expression must produce the same
    epsilon through get_eps_and_log_var."""
    eps_diff, v_diff = _pair()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1))
    t = jnp.array([3, 7])
    e1, _ = eps_diff.get_eps_and_log_var(None, x, t)
    e2, _ = v_diff.get_eps_and_log_var(None, x, t)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1), atol=1e-5)


@pytest.mark.parametrize("sampler", ["ddim", "dpm++", "ddpm"])
def test_v_sampling_matches_eps_sampling(sampler):
    eps_diff, v_diff = _pair(sampler=sampler)
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1))
    out_e = eps_diff.denoise(None, rng, x=x)
    out_v = v_diff.denoise(None, rng, x=x)
    np.testing.assert_allclose(
        np.asarray(out_v), np.asarray(out_e), atol=2e-4
    )


def test_v_loss_uses_native_target():
    """For a perfect v-predictor the SIMPLE loss must be ~0; for the
    equivalent eps-model-as-v-config it must not be (wrong space)."""
    _, v_diff = _pair()
    x0 = 0.5 * jnp.tanh(jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 1)))
    t = jnp.array([2, 5, 7, 9])

    # construct the exact v-target scenario: data point x0 known, model is
    # the per-example optimal v for delta data at that x0
    class PerfectV:
        conditional = False
        resolution = 8
        in_channels = 1

        def __init__(self, acp, x0):
            self.acp = jnp.asarray(acp, jnp.float32)
            self.x0 = x0

        def apply(self, variables, x, t):
            acp_t = self.acp[t].reshape((-1,) + (1,) * (x.ndim - 1))
            a, s = jnp.sqrt(acp_t), jnp.sqrt(1 - acp_t)
            eps = (x - a * self.x0) / s
            return a * eps - s * self.x0

    probe = _make(None, 10, "ddpm")
    model = PerfectV(_original_acp(probe), x0)
    diff = Diffusion(
        model=model, original_num_steps=1000, rescaled_num_steps=10,
        sampling_var_type="small", loss_type="simple",
        beta_schedule="cosine", prediction_type="v",
    )
    loss = diff.loss(None, x0, t, jax.random.PRNGKey(4))
    assert float(jnp.max(loss)) < 1e-6, loss

    # regression for the NATIVE-target semantics: a model off by a constant
    # delta in v-space must incur exactly mean(delta^2) — the old
    # converted-eps regression would give mean((alpha_t * delta)^2), which
    # is alpha_t^2-reweighted and much smaller at high t
    delta = 0.3

    class OffsetV(PerfectV):
        def apply(self, variables, x, t):
            return super().apply(variables, x, t) + delta

    diff_off = Diffusion(
        model=OffsetV(_original_acp(probe), x0), original_num_steps=1000,
        rescaled_num_steps=10, sampling_var_type="small",
        loss_type="simple", beta_schedule="cosine", prediction_type="v",
    )
    t_hi = jnp.array([9, 9, 9, 9])  # high t: alpha_t^2 << 1 discriminates
    loss_off = np.asarray(diff_off.loss(None, x0, t_hi, jax.random.PRNGKey(5)))
    np.testing.assert_allclose(loss_off, delta**2, rtol=1e-4)
    alpha_sq = float(np.asarray(diff_off._acp)[9])
    assert alpha_sq * delta**2 < 0.5 * delta**2  # the wrong value is far off


def test_invalid_prediction_type():
    with pytest.raises(NotImplementedError):
        _make(None, 10, "ddpm", prediction_type="x0")


def test_cli_prediction_type_flag():
    from nicediffusion_tpu.utils.cli import get_dicts_from_args, make_argparser

    parser = make_argparser("diff_sample")
    args = parser.parse_args(
        ["--model_path", "64x64_diffusion.pt", "--batch_size", "2",
         "--num_samples", "1", "--prediction_type", "v"]
    )
    _, _, d = get_dicts_from_args(args)
    assert d["prediction_type"] == "v"
