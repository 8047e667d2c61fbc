"""Structural tests for the Real-ESRGAN RRDBNet stage (reference
scripts/sample.py:113-142). basicsr is not installed in this environment, so
parity is pinned structurally: the exact parameter count/shape inventory of
RealESRGAN_x4plus (16,697,987 params) and 4x output geometry."""

import numpy as np

import jax
import jax.numpy as jnp

from nicediffusion_tpu.models.rrdb import RRDBNet, convert_esrgan_state_dict


def test_param_count_matches_realesrgan_x4plus():
    net = RRDBNet()
    shapes = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    )["params"]
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    # RRDBNet(3, 3, 64, 23, 32): the published RealESRGAN_x4plus size
    assert n == 16_697_987, n


def test_forward_4x_and_residual_scaling():
    net = RRDBNet(num_block=2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (2, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_convert_esrgan_state_dict_structure():
    """basicsr-style names map onto the flax tree and transpose OIHW->HWIO."""
    sd = {
        "conv_first.weight": np.zeros((64, 3, 3, 3), dtype=np.float32),
        "conv_first.bias": np.zeros((64,), dtype=np.float32),
        "body.0.rdb1.conv1.weight": np.zeros((32, 64, 3, 3), dtype=np.float32),
        "body.0.rdb1.conv1.bias": np.zeros((32,), dtype=np.float32),
        "conv_last.weight": np.zeros((3, 64, 3, 3), dtype=np.float32),
        "conv_last.bias": np.zeros((3,), dtype=np.float32),
    }
    params = convert_esrgan_state_dict(sd)
    assert params["conv_first"]["kernel"].shape == (3, 3, 3, 64)
    assert params["body_0"]["rdb1"]["conv1"]["kernel"].shape == (3, 3, 64, 32)
    assert params["conv_last"]["kernel"].shape == (3, 3, 64, 3)
