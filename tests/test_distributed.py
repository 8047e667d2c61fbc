"""Data-parallel tests on the virtual 8-device CPU mesh (SURVEY.md §4.7).

The conftest forces --xla_force_host_platform_device_count=8, so these run
without TPU hardware. New scope vs the reference (which has no distributed
training at all, reference trainer.py:9)."""

import numpy as np


import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nicediffusion_tpu.models.unet import DiffusionModel
from nicediffusion_tpu.parallel.mesh import data_sharding, make_mesh, replicated
from nicediffusion_tpu.training.data import synthetic_batches
from nicediffusion_tpu.training.trainer import Trainer

TINY_MODEL = dict(
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

DIFF_ARGS = dict(
    original_num_steps=50,
    rescaled_num_steps=50,
    sampling_var_type="learned_interpolation",
    loss_type="hybrid",
    beta_schedule="cosine",
    guidance_method="classifier_free",
    guidance_strength=0.8,
)


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1
    mesh42 = make_mesh(num_data=4, num_model=2)
    assert mesh42.shape == {"data": 4, "model": 2}


def _trainer(tmp_path, mesh, seed=0):
    model = DiffusionModel(**TINY_MODEL)
    loader = synthetic_batches(
        batch_size=16, resolution=8, channels=1, num_classes=4, seed=3
    )
    return Trainer(
        model=model,
        diffusion_args=dict(DIFF_ARGS),
        dataloader=loader,
        iterations=0,
        batch_size=16,
        lr=1e-3,
        weight_decay=1e-4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        mesh=mesh,
        seed=seed,
    )


def test_data_parallel_matches_single_device(tmp_path):
    """One sharded step over the 8-device mesh must equal the same step on a
    single device: XLA's all-reduced gradients == unsharded gradients."""
    mesh = make_mesh()
    t_dp = _trainer(tmp_path, mesh=mesh, seed=0)
    t_single = _trainer(tmp_path, mesh=None, seed=0)

    # identical init (same seed) — sanity-check before stepping
    for a, b in zip(
        jax.tree.leaves(t_dp.state.params), jax.tree.leaves(t_single.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    batch, labels = next(t_dp.loader)
    rng = jax.random.PRNGKey(7)

    b_dp, l_dp = t_dp._shard_batch(batch, labels)
    assert b_dp.sharding.spec == P("data")
    state_dp, m_dp = t_dp._train_step(t_dp.state, b_dp, l_dp, rng)

    b_s, l_s = t_single._shard_batch(batch, labels)
    state_s, m_s = t_single._train_step(t_single.state, b_s, l_s, rng)

    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_s["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(state_dp.params), jax.tree.leaves(state_s.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_sharded_batch_placement():
    mesh = make_mesh()
    x = np.zeros((16, 8, 8, 1), dtype=np.float32)
    from nicediffusion_tpu.parallel.mesh import shard_batch

    xs = shard_batch(mesh, x)
    assert xs.sharding == data_sharding(mesh, 4)
    # each device holds 1/8 of the batch
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(2, 8, 8, 1)}


def test_batch_sharded_sampling(tmp_path):
    """Sampling with a batch sharded over the mesh produces the same result
    as unsharded sampling (per-example independence)."""
    mesh = make_mesh()
    model = DiffusionModel(**TINY_MODEL)
    from nicediffusion_tpu.diffusion.process import Diffusion

    diff = Diffusion(model=model, **DIFF_ARGS)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, 1)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )["params"]

    y = jnp.arange(8) % 4
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 8, 1))

    out_single = diff.denoise(params, rng, x=x, y=y)

    params_r = jax.device_put(params, replicated(mesh))
    x_s = jax.device_put(x, data_sharding(mesh, 4))
    y_s = jax.device_put(y, data_sharding(mesh, 1))
    out_sharded = diff.denoise(params_r, rng, x=x_s, y=y_s)

    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_single), atol=1e-5
    )


def test_batch_sharded_dpmpp_and_encoder_cache():
    """The round-2 sampler paths (dpm++ multistep carry, encoder-cached
    super-steps) must partition over a P('data')-sharded batch exactly like
    the plain sampler: per-example independence means sharded == unsharded."""
    mesh = make_mesh()
    model = DiffusionModel(**TINY_MODEL)
    from nicediffusion_tpu.diffusion.process import Diffusion

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, 1)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    y = jnp.arange(8) % 4
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 8, 1))
    params_r = jax.device_put(params, replicated(mesh))
    x_s = jax.device_put(x, data_sharding(mesh, 4))
    y_s = jax.device_put(y, data_sharding(mesh, 1))

    for sampler, enc in (("dpm++", None), ("ddpm", 2), ("dpm++", 3)):
        diff = Diffusion(
            model=model, **dict(DIFF_ARGS, rescaled_num_steps=8),
            sampler=sampler,
        )
        single = diff.denoise(params, rng, x=x, y=y, encoder_cache=enc)
        sharded = diff.denoise(
            params_r, rng, x=x_s, y=y_s, encoder_cache=enc
        )
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(single), atol=1e-5,
            err_msg=f"{sampler} enc={enc}",
        )
