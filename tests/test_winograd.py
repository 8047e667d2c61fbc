"""Winograd F(2x2,3x3) fast-conv tests (ops/winograd.py, opt-in via
DiffusionModel(winograd=True)): op-level agreement with lax.conv in true
f32 (the transforms are exactly representable, so only summation order
differs), odd-size and bias handling, parameter-tree compatibility (same
checkpoint loads in both modes), and whole-model agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nicediffusion_tpu.models.unet import DiffusionModel
from nicediffusion_tpu.ops.winograd import transform_weights_3x3, winograd_conv_3x3


def _ref_conv(x, w, bias=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if bias is None else y + bias


@pytest.mark.parametrize("hw", [(8, 8), (7, 7), (7, 10), (28, 28)])
def test_winograd_matches_direct_conv_f32(rng_np, hw):
    h, w = hw
    x = jnp.asarray(rng_np.normal(size=(2, h, w, 5)).astype(np.float32))
    k = jnp.asarray(rng_np.normal(size=(3, 3, 5, 7)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng_np.normal(size=(7,)).astype(np.float32))
    ref = np.asarray(_ref_conv(x, k, b))
    win = np.asarray(winograd_conv_3x3(x, k, bias=b))
    np.testing.assert_allclose(win, ref, atol=1e-4, rtol=1e-4)


def test_weight_transform_shape_and_zero():
    w = jnp.zeros((3, 3, 4, 6))
    u = transform_weights_3x3(w)
    assert u.shape == (4, 4, 4, 6)
    assert float(jnp.abs(u).max()) == 0.0


def test_model_winograd_matches_plain(rng_np):
    cfg = dict(
        resolution=16, in_channels=1, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(8,), channel_mult=(1, 2),
        num_heads=4, num_classes=5, dropout=0.0, resblock_updown=True,
        use_adaptive_gn=True, split_qkv_first=True,
    )
    plain = DiffusionModel(**cfg)
    fast = DiffusionModel(**cfg, winograd=True)

    params = plain.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )["params"]
    params = jax.tree.map(
        lambda p: p + 0.02 * np.cos(np.arange(p.size)).reshape(p.shape)
        .astype(np.float32),
        params,
    )
    # identical parameter trees: the same checkpoint drives both modes
    fast_shapes = jax.eval_shape(
        lambda: fast.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        )
    )["params"]
    assert jax.tree.structure(params) == jax.tree.structure(fast_shapes)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
    t = jnp.array([3, 7])
    y = jnp.array([1, 2])
    out_plain = np.asarray(plain.apply({"params": params}, x, t, y))
    out_fast = np.asarray(fast.apply({"params": params}, x, t, y))
    np.testing.assert_allclose(out_fast, out_plain, atol=2e-4, rtol=1e-3)


def test_odd_resolution_model():
    """EMNIST-style odd feature maps (7x7 at the lowest level) must work."""
    cfg = dict(
        resolution=28, in_channels=1, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(7,), channel_mult=(1, 2, 2),
        num_heads=2, num_classes=None, dropout=0.0, resblock_updown=True,
        use_adaptive_gn=True, split_qkv_first=True,
    )
    model = DiffusionModel(**cfg, winograd=True)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    out = model.apply(
        {"params": params},
        jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 1)),
        jnp.array([3, 5]),
    )
    assert out.shape == (2, 28, 28, 2)
    assert np.isfinite(np.asarray(out)).all()
