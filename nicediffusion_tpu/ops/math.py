"""Gaussian math helpers and sinusoidal timestep embeddings.

JAX analogues of the helpers at reference
/root/reference/nicediffusion/diffusion.py:499-549 (kl_div, approx_cdf,
log_likelihood, mean_flat) and /root/reference/nicediffusion/model.py:514-523
(timestep_embedding). Pure functions over jnp arrays — safe inside jit/scan.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = [
    "kl_div",
    "approx_cdf",
    "discretized_gaussian_log_likelihood",
    "mean_flat",
    "timestep_embedding",
]


def kl_div(mean_1, log_var_1, mean_2, log_var_2):
    """KL divergence between two diagonal Gaussians, in nats.

    Same closed form as reference diffusion.py:499-508.
    """
    return (
        (log_var_2 - log_var_1)
        + jnp.exp(log_var_1 - log_var_2)
        + ((mean_1 - mean_2) ** 2) * jnp.exp(-log_var_2)
        - 1.0
    ) / 2


def approx_cdf(x):
    """Page (1977) tanh approximation of the standard normal CDF.

    Same approximation as reference diffusion.py:511-518.
    """
    y = math.sqrt(2.0 / math.pi) * (x + 0.0444715 * (x**3))
    return 0.5 * (1.0 + jnp.tanh(y))


def discretized_gaussian_log_likelihood(target, mean, log_var):
    """Log-likelihood of a Gaussian discretized to 256 image bins, in nats.

    `target` must be in [-1, 1]. Matches reference diffusion.py:521-542:
    bins of width 2/255, edge bins for target <= -0.999 / >= 0.999, CDFs
    floored at 1e-12 before the log.
    """
    assert target.shape == mean.shape == log_var.shape
    std_recip = jnp.exp(-0.5 * log_var)
    centered = target - mean

    plus = (centered + 1.0 / 255.0) * std_recip
    minus = (centered - 1.0 / 255.0) * std_recip
    cdf_minus, cdf_plus = approx_cdf(minus), approx_cdf(plus)
    cdf_delta = cdf_plus - cdf_minus

    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_minus = jnp.log(jnp.clip(1.0 - cdf_minus, min=1e-12))
    return jnp.where(
        target < -0.999,
        log_cdf_plus,
        jnp.where(
            target > 0.999,
            log_one_minus_cdf_minus,
            jnp.log(jnp.clip(cdf_delta, min=1e-12)),
        ),
    )


def mean_flat(x):
    """Mean over all non-batch dimensions (reference diffusion.py:545-549)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def timestep_embedding(timesteps, embedding_dim: int, max_period: int = 10000):
    """Sinusoidal timestep embedding, [cos | sin] channel order.

    Matches reference model.py:514-523 exactly — note the reference
    concatenates **cos first, then sin** (unlike most transformer PE code),
    which matters for checkpoint parity. Odd embedding_dim is zero-padded.
    """
    half = embedding_dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(max_period) / half)
    )
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
