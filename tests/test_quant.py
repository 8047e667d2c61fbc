"""int8 quantization op tests (serving fast path, ops/quant.py).

Correctness is statistical, not bitwise: symmetric per-channel weight quant
+ per-tensor dynamic activation quant bounds relative error by ~1/127 per
factor; we assert tight agreement against the f32 ops on well-conditioned
random inputs.
"""

import numpy as np

import jax
import jax.numpy as jnp

from nicediffusion_tpu.ops.quant import (
    int8_conv,
    int8_dense,
    quantize_activation,
    quantize_weight_channelwise,
)


def test_weight_quant_roundtrip(rng_np):
    w = jnp.asarray(rng_np.normal(size=(3, 3, 16, 32)).astype(np.float32))
    w_q, scale = quantize_weight_channelwise(w)
    assert w_q.dtype == jnp.int8 and scale.shape == (32,)
    deq = w_q.astype(jnp.float32) * scale
    err = np.abs(np.asarray(deq - w))
    # per-channel absmax / 127 is the max rounding step
    bound = np.asarray(jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0 * 0.5 + 1e-6)
    assert (err <= bound[None, None, None, :] + 1e-6).all()


def test_activation_quant_roundtrip(rng_np):
    x = jnp.asarray(rng_np.normal(size=(4, 8, 8, 16)).astype(np.float32))
    x_q, scale = quantize_activation(x)
    deq = x_q.astype(jnp.float32) * scale
    assert float(jnp.max(jnp.abs(deq - x))) <= float(scale) * 0.5 + 1e-6


def test_int8_conv_close_to_f32(rng_np):
    x = jnp.asarray(rng_np.normal(size=(2, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng_np.normal(size=(3, 3, 16, 32)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng_np.normal(size=(32,)).astype(np.float32) * 0.1)

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    out = int8_conv(x, w, bias=b)
    # relative error budget: two quantizations at ~0.4%/127 each over a
    # 144-term dot — empirically ~1-2% of the output scale
    denom = float(jnp.std(ref)) + 1e-6
    rel = float(jnp.max(jnp.abs(out - ref))) / denom
    assert rel < 0.08, rel


def test_int8_conv_strided_shape():
    x = jnp.ones((1, 8, 8, 4))
    w = jnp.ones((3, 3, 4, 8))
    out = int8_conv(x, w, stride=2)
    assert out.shape == (1, 4, 4, 8)


def test_int8_dense_close_to_f32(rng_np):
    x = jnp.asarray(rng_np.normal(size=(4, 64, 32)).astype(np.float32))
    w = jnp.asarray(rng_np.normal(size=(32, 96)).astype(np.float32) * 0.1)
    ref = x @ w
    out = int8_dense(x, w)
    denom = float(jnp.std(ref)) + 1e-6
    rel = float(jnp.max(jnp.abs(out - ref))) / denom
    assert rel < 0.08, rel


def test_int8_dense_preserves_dtype():
    x = jnp.ones((2, 8), jnp.bfloat16)
    w = jnp.ones((8, 4))
    assert int8_dense(x, w).dtype == jnp.bfloat16


def test_quantized_unet_param_compat_and_accuracy(rng_np):
    """quantized=True keeps the exact parameter tree (checkpoints load
    unchanged) and its forward closely tracks the float forward."""
    from nicediffusion_tpu.models.unet import DiffusionModel

    cfg = dict(
        resolution=16, in_channels=1, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(8,), channel_mult=(1, 2),
        num_heads=2, num_classes=4, use_adaptive_gn=True,
        resblock_updown=True,
    )
    m_f = DiffusionModel(**cfg)
    m_q = DiffusionModel(**cfg, quantized=True)
    x = jnp.asarray(rng_np.normal(size=(2, 16, 16, 1)).astype(np.float32))
    t = jnp.array([3, 7], jnp.int32)
    y = jnp.array([1, 2], jnp.int32)
    params = m_f.init(jax.random.PRNGKey(0), x, t, y)["params"]
    params_q = m_q.init(jax.random.PRNGKey(0), x, t, y)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_q)
    # randomise (zero-init output convs would make the forward all-zero)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [0.05 * jax.random.normal(k, l.shape, l.dtype)
         for k, l in zip(keys, leaves)],
    )

    ref = np.asarray(m_f.apply({"params": params}, x, t, y))
    out = np.asarray(m_q.apply({"params": params}, x, t, y))
    assert np.isfinite(out).all()
    # lossy but strongly correlated; eps-prediction scale ~ N(0,1)-ish
    denom = ref.std() + 1e-6
    assert np.abs(out - ref).max() / denom < 0.35, (
        np.abs(out - ref).max() / denom
    )
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.99, corr


def test_static_int8_serving_path(rng_np):
    """Round-3 static serving path (calibrate -> freeze -> serve): the
    'quant' collection holds int8 kernels, the serving forward tracks the
    float forward, and the full Diffusion chain accepts the serving
    variables dict."""
    from nicediffusion_tpu.diffusion.process import Diffusion
    from nicediffusion_tpu.models.unet import DiffusionModel
    from nicediffusion_tpu.ops.quant import (
        build_int8_variables,
        calibration_inputs,
    )

    cfg = dict(
        resolution=16, in_channels=1, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(8,), channel_mult=(1, 2),
        num_heads=2, num_classes=5, use_adaptive_gn=True,
        resblock_updown=True,
    )
    m_f = DiffusionModel(**cfg)
    m_q = DiffusionModel(**cfg, quantized=True)
    x = jnp.asarray(rng_np.normal(size=(2, 16, 16, 1)).astype(np.float32))
    t = jnp.array([3, 7], jnp.int32)
    y = jnp.array([1, 2], jnp.int32)
    params = m_f.init(jax.random.PRNGKey(0), x, t, y)["params"]
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [0.05 * jax.random.normal(k, l.shape, l.dtype)
         for k, l in zip(keys, leaves)],
    )

    diff_args = dict(
        original_num_steps=20, rescaled_num_steps=10,
        sampling_var_type="learned_interpolation", loss_type="hybrid",
        beta_schedule="cosine", guidance_method="classifier_free",
        guidance_strength=0.8,
    )
    diff_q = Diffusion(model=m_q, **diff_args)

    inputs = calibration_inputs(
        diff_q, params, jax.random.PRNGKey(7), y=y, batch_size=2,
        num_points=3,
    )
    serving = build_int8_variables(m_q, params, inputs)
    assert set(serving) == {"params", "quant"}
    q_leaves = jax.tree.leaves(serving["quant"])
    assert any(l.dtype == jnp.int8 for l in q_leaves)
    # every Int8Conv froze a (kernel_q, inv_act, deq) triple
    assert len(q_leaves) % 3 == 0 and len(q_leaves) > 0

    # serving forward tracks the float forward
    ref = np.asarray(m_f.apply({"params": params}, x, t, y))
    out = np.asarray(m_q.apply(serving, x, t, y))
    assert np.isfinite(out).all()
    denom = ref.std() + 1e-6
    assert np.abs(out - ref).max() / denom < 0.35
    assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.99

    # the full chain accepts the serving dict; close to the exact chain
    diff_f = Diffusion(model=m_f, **diff_args)
    exact = np.asarray(
        diff_f.denoise(params, jax.random.PRNGKey(3), y=y, batch_size=2)
    )
    quant = np.asarray(
        diff_q.denoise(serving, jax.random.PRNGKey(3), y=y, batch_size=2)
    )
    assert np.isfinite(quant).all()
    assert np.corrcoef(quant.ravel(), exact.ravel())[0, 1] > 0.98

    # encoder-cache path composes with the serving dict
    cached = np.asarray(
        diff_q.denoise(serving, jax.random.PRNGKey(3), y=y, batch_size=2,
                       encoder_cache=2)
    )
    assert np.isfinite(cached).all()

    # the full serving stack (bench.py max-stack config): int8 serving
    # dict + encoder_cache + limited-interval guidance all composed
    stacked = np.asarray(
        diff_q.denoise(serving, jax.random.PRNGKey(3), y=y, batch_size=2,
                       encoder_cache=2, guidance_interval=(0.2, 0.7))
    )
    assert np.isfinite(stacked).all()
    assert np.corrcoef(stacked.ravel(), exact.ravel())[0, 1] > 0.9


def test_quantized_attention_optin(rng_np):
    """quantized_attention=True routes the attention qkv/proj projections
    through Int8Dense: same parameter tree (checkpoints load unchanged),
    extra (kernel_q, inv_act, deq) triples in the 'quant' collection after
    freezing, and the serving forward still tracks the float forward.

    The flag defaults OFF: on the v5e chip it measured perf-neutral
    (1.5493 vs 1.5465 samples/sec DDPM-250 CFG int8 — the projections are
    a small slice of the model FLOPs), so enabling it would add
    quantization noise for no speed gain (BASELINE.md ablation).
    """
    from nicediffusion_tpu.diffusion.process import Diffusion
    from nicediffusion_tpu.models.unet import DiffusionModel
    from nicediffusion_tpu.ops.quant import (
        build_int8_variables,
        calibration_inputs,
    )

    cfg = dict(
        resolution=16, in_channels=1, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(8,), channel_mult=(1, 2),
        num_heads=2, num_classes=5, use_adaptive_gn=True,
        resblock_updown=True,
    )
    m_f = DiffusionModel(**cfg)
    m_q = DiffusionModel(**cfg, quantized=True)
    m_qa = DiffusionModel(**cfg, quantized=True, quantized_attention=True)
    x = jnp.asarray(rng_np.normal(size=(2, 16, 16, 1)).astype(np.float32))
    t = jnp.array([3, 7], jnp.int32)
    y = jnp.array([1, 2], jnp.int32)
    params = m_f.init(jax.random.PRNGKey(0), x, t, y)["params"]
    params_qa = m_qa.init(jax.random.PRNGKey(0), x, t, y)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_qa)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [0.05 * jax.random.normal(k, l.shape, l.dtype)
         for k, l in zip(keys, leaves)],
    )

    diff_args = dict(
        original_num_steps=20, rescaled_num_steps=10,
        sampling_var_type="learned_interpolation", loss_type="hybrid",
        beta_schedule="cosine", guidance_method="classifier_free",
        guidance_strength=0.8,
    )
    diff_qa = Diffusion(model=m_qa, **diff_args)
    inputs = calibration_inputs(
        diff_qa, params, jax.random.PRNGKey(7), y=y, batch_size=2,
        num_points=3,
    )
    serving = build_int8_variables(m_qa, params, inputs)

    # more frozen triples than the conv-only model (one per attn projection)
    serving_conv_only = build_int8_variables(
        DiffusionModel(**cfg, quantized=True), params,
        calibration_inputs(
            Diffusion(model=m_q, **diff_args), params,
            jax.random.PRNGKey(7), y=y, batch_size=2, num_points=3,
        ),
    )
    n_qa = len(jax.tree.leaves(serving["quant"]))
    n_q = len(jax.tree.leaves(serving_conv_only["quant"]))
    assert n_qa > n_q and (n_qa - n_q) % 3 == 0

    ref = np.asarray(m_f.apply({"params": params}, x, t, y))
    out = np.asarray(m_qa.apply(serving, x, t, y))
    assert np.isfinite(out).all()
    denom = ref.std() + 1e-6
    assert np.abs(out - ref).max() / denom < 0.4
    assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.99


def test_calibration_persistence_roundtrip(rng_np, tmp_path):
    """collect_calibration -> save npz -> load -> freeze_int8 must serve
    identically to the direct calibrate+freeze pipeline (the
    --int8_calibration CLI flow, scripts/sample.py)."""
    from nicediffusion_tpu.diffusion.process import Diffusion
    from nicediffusion_tpu.models.unet import DiffusionModel
    from nicediffusion_tpu.ops.quant import (
        build_int8_variables,
        calibration_inputs,
        collect_calibration,
        freeze_int8,
    )
    from nicediffusion_tpu.utils.checkpoint import load_params, save_params_npz

    cfg = dict(
        resolution=16, in_channels=1, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(8,), channel_mult=(1, 2),
        num_heads=2, num_classes=5, use_adaptive_gn=True,
        resblock_updown=True,
    )
    m_q = DiffusionModel(**cfg, quantized=True)
    x = jnp.asarray(rng_np.normal(size=(2, 16, 16, 1)).astype(np.float32))
    t = jnp.array([3, 7], jnp.int32)
    y = jnp.array([1, 2], jnp.int32)
    params = m_q.init(jax.random.PRNGKey(0), x, t, y)["params"]

    diff_args = dict(
        original_num_steps=20, rescaled_num_steps=5,
        sampling_var_type="learned_interpolation", loss_type="hybrid",
        beta_schedule="cosine",
    )
    diff_q = Diffusion(model=m_q, **diff_args)
    inputs = calibration_inputs(
        diff_q, params, jax.random.PRNGKey(7), y=y, batch_size=2,
        num_points=2,
    )

    direct = build_int8_variables(m_q, params, inputs)

    calib = collect_calibration(m_q, params, inputs)
    path = str(tmp_path / "calib.npz")
    save_params_npz(calib, path)
    reloaded = freeze_int8(m_q, params, load_params(path))  # no example input

    for a, b in zip(
        jax.tree.leaves(direct["quant"]), jax.tree.leaves(reloaded["quant"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_a = m_q.apply(direct, x, t, y)
    out_b = m_q.apply(reloaded, x, t, y)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_int8_calibration_cli_flag():
    """--int8_calibration parses and routes to other_args."""
    from nicediffusion_tpu.utils.cli import get_dicts_from_args, make_argparser

    args = make_argparser("diff_sample").parse_args([
        "--model_path", "EMNIST_model.pt", "--batch_size", "2",
        "--num_samples", "1", "--dtype", "int8",
        "--int8_calibration", "/tmp/c.npz",
    ])
    other, _, _ = get_dicts_from_args(args)
    assert other["int8_calibration"] == "/tmp/c.npz"
    assert other["dtype"] == "int8"
