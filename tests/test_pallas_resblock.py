"""Fused GN+SiLU+conv3x3 Pallas kernel vs the jnp spec (interpret mode).

The spec is ops/groupnorm's fused-op semantics composed with lax.conv —
the exact composite the kernel would replace inside ResidualBlock
(models/unet.py; reference model.py:188-211).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nicediffusion_tpu.ops.pallas.resblock import (
    gn_silu_conv3x3,
    gn_silu_conv3x3_reference,
)


@pytest.mark.parametrize("ada", [False, True])
@pytest.mark.parametrize(
    "shape,f,groups",
    [((2, 8, 8, 32), 64, 8), ((1, 16, 16, 64), 32, 32), ((3, 4, 4, 96), 96, 32)],
)
def test_fused_matches_reference(rng_np, shape, f, groups, ada):
    b, h, w, c = shape
    x = jnp.asarray(rng_np.normal(size=shape).astype(np.float32))
    gamma = jnp.asarray(rng_np.normal(size=(c,)).astype(np.float32) * 0.2 + 1)
    beta = jnp.asarray(rng_np.normal(size=(c,)).astype(np.float32) * 0.1)
    kernel = jnp.asarray(
        rng_np.normal(size=(3, 3, c, f)).astype(np.float32) * 0.05
    )
    bias = jnp.asarray(rng_np.normal(size=(f,)).astype(np.float32) * 0.1)
    es = eb = None
    if ada:
        es = jnp.asarray(rng_np.normal(size=(b, c)).astype(np.float32) * 0.3)
        eb = jnp.asarray(rng_np.normal(size=(b, c)).astype(np.float32) * 0.3)

    ref = gn_silu_conv3x3_reference(
        x, gamma, beta, es, eb, kernel, bias, num_groups=groups, eps=1e-5,
        ada=ada,
    )
    out = gn_silu_conv3x3(
        x, gamma, beta, kernel, bias, es=es, eb=eb, num_groups=groups,
        eps=1e-5, interpret=True,
    )
    assert out.shape == ref.shape and out.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_fused_backward_matches_reference(rng_np):
    b, h, w, c, f = 2, 8, 8, 32, 32
    x = jnp.asarray(rng_np.normal(size=(b, h, w, c)).astype(np.float32))
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)
    kernel = jnp.asarray(
        rng_np.normal(size=(3, 3, c, f)).astype(np.float32) * 0.05
    )
    bias = jnp.zeros((f,), jnp.float32)

    def loss_fused(x, kernel):
        return jnp.sum(
            gn_silu_conv3x3(
                x, gamma, beta, kernel, bias, num_groups=8, interpret=True
            ) ** 2
        )

    def loss_ref(x, kernel):
        return jnp.sum(
            gn_silu_conv3x3_reference(
                x, gamma, beta, None, None, kernel, bias, num_groups=8
            ) ** 2
        )

    gx, gk = jax.grad(loss_fused, argnums=(0, 1))(x, kernel)
    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, kernel)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_r), atol=1e-4)
