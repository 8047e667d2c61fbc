"""Tensor-parallel sharding tests on a (data=4, model=2) virtual mesh:
forward and train-step results must match the unsharded computation (GSPMD
collectives are numerically transparent)."""

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nicediffusion_tpu.models.unet import DiffusionModel
from nicediffusion_tpu.parallel.mesh import make_mesh
from nicediffusion_tpu.parallel.sharding import shard_params, unet_param_shardings

MODEL = dict(
    resolution=8,
    in_channels=1,
    model_channels=32,
    out_channels=2,
    num_res_blocks=1,
    attention_resolutions=(4,),
    channel_mult=(1, 2),
    num_heads=2,
    num_classes=4,
    dropout=0.0,
    resblock_updown=True,
    use_adaptive_gn=True,
    split_qkv_first=True,
)


def _params(model):
    return model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, 1)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )["params"]


def test_sharding_specs():
    mesh = make_mesh(num_data=4, num_model=2)
    model = DiffusionModel(**MODEL)
    params = _params(model)
    shardings = unet_param_shardings(params, mesh)
    # stem conv kernel: output channels sharded
    stem = shardings["downsampling_0"]["layers_0"]["kernel"]
    assert stem.spec == P(None, None, None, "model")
    # GroupNorm scale replicated
    gn = shardings["downsampling_1"]["layers_0"]["in_norm"]["scale"]
    assert gn.spec == P()
    # class embedding replicated
    assert shardings["class_embedding"]["embedding"].spec == P()


def test_tp_forward_matches_unsharded():
    mesh = make_mesh(num_data=4, num_model=2)
    model = DiffusionModel(**MODEL)
    params = _params(model)

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 1))
    t = jnp.array([3, 5, 7, 9])
    y = jnp.array([0, 1, 2, 3])

    ref = model.apply({"params": params}, x, t, y)

    params_tp = shard_params(params, mesh)
    x_s = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(
        lambda p, x, t, y: model.apply({"params": p}, x, t, y)
    )(params_tp, x_s, t, y)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_tp_gradients_match_unsharded():
    mesh = make_mesh(num_data=4, num_model=2)
    model = DiffusionModel(**MODEL)
    params = _params(model)

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 1))
    t = jnp.array([3, 5, 7, 9])
    y = jnp.array([0, 1, 2, 3])

    def loss(p):
        return jnp.mean(model.apply({"params": p}, x, t, y) ** 2)

    g_ref = jax.grad(loss)(params)
    g_tp = jax.jit(jax.grad(loss))(shard_params(params, mesh))
    for a, b in zip(jax.tree.leaves(g_tp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
