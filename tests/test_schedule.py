"""Golden tests for beta schedules, IDDPM respacing, and coefficient tables
against the torch reference (SURVEY.md §4.1).

The reference computes every table in numpy float64 (reference
diffusion.py:87-130); ours does exactly the same host-side, so values must
match to float64 round-off (we assert near-bitwise equality).
"""

import numpy as np
import pytest
import torch.nn

from nicediffusion.diffusion import Diffusion as TorchDiffusion
from nicediffusion.diffusion import get_beta_schedule as torch_get_beta_schedule

from nicediffusion_tpu.ops.schedule import DiffusionSchedule, get_beta_schedule

CONFIGS = [
    ("linear", 1000, 25),
    ("linear", 1000, 250),
    ("linear", 1000, 1000),
    ("cosine", 1000, 25),
    ("cosine", 1000, 250),
    ("cosine", 4000, 100),
    ("constant", 1000, 50),
]


@pytest.mark.parametrize("method,T,S", CONFIGS)
def test_beta_schedule_matches_reference(method, T, S):
    ours = get_beta_schedule(method, T)
    theirs = torch_get_beta_schedule(method, T, 0.0001 * 1000 / T, 0.02 * 1000 / T)
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)


def _torch_diffusion(method, T, S):
    return TorchDiffusion(
        model=torch.nn.Identity(),
        original_num_steps=T,
        rescaled_num_steps=S,
        sampling_var_type="learned_interpolation",
        loss_type="hybrid",
        beta_schedule=method,
        device=torch.device("cpu"),
    )


@pytest.mark.parametrize("method,T,S", CONFIGS)
def test_coefficient_tables_match_reference(method, T, S):
    ref = _torch_diffusion(method, T, S)
    sched = DiffusionSchedule.create(T, S, beta_schedule=method)

    np.testing.assert_array_equal(
        sched.timestep_map, ref.timestep_map.cpu().numpy()
    )
    for ours, theirs in [
        (sched.betas, ref.betas),
        (sched.alphas_cumprod, ref.alphas_cumprod),
        (sched.alphas_cumprod_prev, ref.alphas_cumprod_prev),
        (sched.sqrt_alphas_cumprod, ref.sqrt_alphas_cumprod),
        (sched.sqrt_one_minus_alphas_cumprod, ref.sqrt_one_minus_alphas_cumprod),
        (sched.sqrt_reciprocal_alphas_cumprod, ref.sqrt_reciprocal_alphas_cumprod),
        (
            sched.sqrt_reciprocal_alphas_minus_one_cumprod,
            ref.sqrt_reciprocal_alphas_minus_one_cumprod,
        ),
        (sched.posterior_mean_coef_x0, ref.posterior_mean_coef_x0),
        (sched.posterior_mean_coef_xt, ref.posterior_mean_coef_xt),
        (sched.posterior_variance, ref.posterior_variance),
        (sched.log_posterior_var_clipped, ref.log_posterior_var_clipped),
    ]:
        np.testing.assert_allclose(ours, theirs, rtol=1e-15, atol=0)

    # Derived variance tables match the expressions used at reference
    # diffusion.py:255-261.
    np.testing.assert_allclose(sched.log_betas, np.log(ref.betas), rtol=1e-15)
    np.testing.assert_allclose(
        sched.log_var_large,
        np.log(np.append(ref.posterior_variance[1], ref.betas[1:])),
        rtol=1e-15,
    )
    np.testing.assert_allclose(
        sched.log_var_small,
        np.log(np.maximum(ref.posterior_variance, 1e-20)),
        rtol=1e-15,
    )


def test_emnist_timestep_map_verified_value():
    """SURVEY.md pins the EMNIST 25-step map as [20, 60, ..., 980]."""
    sched = DiffusionSchedule.create(1000, 25, beta_schedule="cosine")
    np.testing.assert_array_equal(sched.timestep_map, np.arange(20, 1000, 40))


def test_identity_respacing():
    """S == T respacing must reproduce the original betas."""
    betas = get_beta_schedule("linear", 100)
    sched = DiffusionSchedule.create(100, 100, betas=betas)
    np.testing.assert_allclose(sched.betas, betas, rtol=1e-12)
