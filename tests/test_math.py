"""Golden tests for the Gaussian math helpers and timestep embeddings against
the torch reference (SURVEY.md §4.2)."""

import numpy as np
import torch

from nicediffusion.diffusion import (
    approx_cdf as torch_approx_cdf,
    kl_div as torch_kl_div,
    log_likelihood as torch_log_likelihood,
    mean_flat as torch_mean_flat,
)
from nicediffusion.model import timestep_embedding as torch_timestep_embedding

import jax.numpy as jnp

from nicediffusion_tpu.ops.math import (
    approx_cdf,
    discretized_gaussian_log_likelihood,
    kl_div,
    mean_flat,
    timestep_embedding,
)


def test_kl_div(rng_np):
    # Compare in float32 on both sides (JAX default dtype is f32).
    m1, m2 = (rng_np.normal(size=(4, 8)).astype(np.float32) for _ in range(2))
    lv1, lv2 = (rng_np.normal(size=(4, 8)).astype(np.float32) for _ in range(2))
    ours = kl_div(jnp.array(m1), jnp.array(lv1), jnp.array(m2), jnp.array(lv2))
    theirs = torch_kl_div(
        torch.tensor(m1), torch.tensor(lv1), torch.tensor(m2), torch.tensor(lv2)
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-6)


def test_approx_cdf(rng_np):
    x = rng_np.normal(size=(100,)) * 3
    ours = approx_cdf(jnp.array(x, dtype=jnp.float32))
    theirs = torch_approx_cdf(torch.tensor(x, dtype=torch.float32))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-6)


def test_log_likelihood_including_edge_bins(rng_np):
    # Cover the <-0.999 / >0.999 edge bins and the 1e-12 CDF floors
    # (reference diffusion.py:533-542).
    target = np.concatenate(
        [
            np.array([-1.0, -0.9995, 0.9995, 1.0, 0.0]),
            rng_np.uniform(-1, 1, size=27),
        ]
    ).reshape(4, 8)
    mean = rng_np.normal(size=(4, 8)) * 0.5
    log_var = rng_np.normal(size=(4, 8)) - 4  # include tiny variances
    # Compare logic in float64: in f32 the saturated tanh CDF makes log() of
    # near-zero bin deltas ulp-sensitive in both frameworks equally.
    import jax

    with jax.enable_x64():
        ours = discretized_gaussian_log_likelihood(
            jnp.array(target, dtype=jnp.float64),
            jnp.array(mean, dtype=jnp.float64),
            jnp.array(log_var, dtype=jnp.float64),
        )
        ours = np.asarray(ours)
    theirs = torch_log_likelihood(
        torch.tensor(target), torch.tensor(mean), torch.tensor(log_var)
    )
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-6, atol=1e-5)


def test_mean_flat(rng_np):
    x = rng_np.normal(size=(3, 4, 5, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(mean_flat(jnp.array(x))),
        torch_mean_flat(torch.tensor(x)).numpy(),
        rtol=1e-6,
        atol=1e-7,
    )


def test_timestep_embedding_matches_reference():
    t = torch.tensor([0, 1, 20, 999, 500])
    for dim in (64, 192, 63):  # even dims + odd-dim zero-pad path
        theirs = torch_timestep_embedding(t, dim).numpy()
        ours = np.asarray(timestep_embedding(jnp.array(t.numpy()), dim))
        np.testing.assert_allclose(ours, theirs, atol=1e-4)
