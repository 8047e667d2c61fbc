"""EncoderUNet noisy-classifier parity tests (VERDICT r1 #5).

The reference never ships a classifier (utils.py:168-172 raises), so the
torch golden here is a transcription of guided-diffusion's EncoderUNetModel
built from the *reference's own* ResidualBlock/AttentionBlock modules plus a
faithful AttentionPool2d (QKVAttention new-order) — the architecture of the
OpenAI `*_classifier.pt` checkpoints. Weights are randomly initialised,
converted with utils/convert, and forwards compared.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from nicediffusion.model import (
    AttentionBlock as TorchAttentionBlock,
    ResidualBlock as TorchResidualBlock,
    UsesStepsSequential,
    timestep_embedding as torch_timestep_embedding,
)

from nicediffusion_tpu.models.classifier import EncoderUNet
from nicediffusion_tpu.utils.config import CLASSIFIER_PRESETS
from nicediffusion_tpu.utils.convert import (
    convert_torch_state_dict,
    flax_params_to_torch_state_dict,
)


class TorchAttentionPool(tnn.Module):
    """guided-diffusion AttentionPool2d: mean token prepended, positional
    embedding, fused qkv Conv1d, new-order multi-head attention, Conv1d
    output projection, first token returned."""

    def __init__(self, spacial_dim, embed_dim, num_head_channels, output_dim):
        super().__init__()
        self.positional_embedding = tnn.Parameter(
            torch.randn(embed_dim, spacial_dim**2 + 1) / embed_dim**0.5
        )
        self.qkv_proj = tnn.Conv1d(embed_dim, 3 * embed_dim, 1)
        self.c_proj = tnn.Conv1d(embed_dim, output_dim, 1)
        self.num_heads = embed_dim // num_head_channels

    def forward(self, x):
        b, c, *_sp = x.shape
        x = x.reshape(b, c, -1)
        x = torch.cat([x.mean(dim=-1, keepdim=True), x], dim=-1)
        x = x + self.positional_embedding[None].to(x.dtype)
        qkv = self.qkv_proj(x)
        bs, width, length = qkv.shape
        ch = width // (3 * self.num_heads)
        q, k, v = qkv.chunk(3, dim=1)  # QKVAttention (new order)
        scale = 1 / math.sqrt(math.sqrt(ch))
        weight = torch.einsum(
            "bct,bcs->bts",
            (q * scale).reshape(bs * self.num_heads, ch, length),
            (k * scale).reshape(bs * self.num_heads, ch, length),
        )
        weight = torch.softmax(weight.float(), dim=-1).type(weight.dtype)
        a = torch.einsum(
            "bts,bcs->bct", weight,
            v.reshape(bs * self.num_heads, ch, length),
        )
        x = self.c_proj(a.reshape(bs, -1, length))
        return x[:, :, 0]


class TorchEncoderUNet(tnn.Module):
    """EncoderUNetModel transcription over the reference's blocks, with
    attribute names matching the post-rename convention the converter maps
    (downsampling / middle_block / step_embed / out)."""

    def __init__(self, resolution, in_channels, model_channels, out_dim,
                 num_res_blocks, attention_resolutions, channel_mult,
                 num_head_channels, split_qkv_first=False):
        super().__init__()
        self.model_channels = model_channels
        emb = 4 * model_channels
        self.step_embed = tnn.Sequential(
            tnn.Linear(model_channels, emb), tnn.SiLU(), tnn.Linear(emb, emb)
        )
        ch = int(model_channels * channel_mult[0])
        blocks = [UsesStepsSequential(tnn.Conv2d(in_channels, ch, 3, padding=1))]
        curr_res = resolution
        for level, mult in enumerate(channel_mult):
            for _ in range(num_res_blocks):
                layers = [TorchResidualBlock(
                    in_channels=ch, step_channels=emb, dropout=0.0,
                    out_channels=int(model_channels * mult),
                    use_adaptive_gn=True,
                )]
                ch = int(model_channels * mult)
                if curr_res in attention_resolutions:
                    layers.append(TorchAttentionBlock(
                        channels=ch, num_head_channels=num_head_channels,
                        split_qkv_first=split_qkv_first,
                    ))
                blocks.append(UsesStepsSequential(*layers))
            if level != len(channel_mult) - 1:
                blocks.append(UsesStepsSequential(TorchResidualBlock(
                    in_channels=ch, step_channels=emb, dropout=0.0,
                    out_channels=ch, downsample=True, use_adaptive_gn=True,
                )))
                curr_res //= 2
        self.downsampling = tnn.ModuleList(blocks)
        self.middle_block = UsesStepsSequential(
            TorchResidualBlock(in_channels=ch, step_channels=emb, dropout=0.0,
                               use_adaptive_gn=True),
            TorchAttentionBlock(channels=ch,
                                num_head_channels=num_head_channels,
                                split_qkv_first=split_qkv_first),
            TorchResidualBlock(in_channels=ch, step_channels=emb, dropout=0.0,
                               use_adaptive_gn=True),
        )
        self.out = tnn.Sequential(
            tnn.GroupNorm(32, ch),
            tnn.SiLU(),
            TorchAttentionPool(curr_res, ch, num_head_channels, out_dim),
        )

    def forward(self, x, t):
        emb = self.step_embed(torch_timestep_embedding(t, self.model_channels))
        h = x
        for module in self.downsampling:
            h = module(h, emb)
        h = self.middle_block(h, emb)
        return self.out(h)


TINY = dict(
    resolution=16, in_channels=1, model_channels=32, out_channels=10,
    num_res_blocks=2, attention_resolutions=(8,), channel_mult=(1, 2),
    num_head_channels=16,
)


def _randomize(module):
    # zero-init convs/projections make half the net pass-through; randomise
    # everything so parity is non-trivial
    with torch.no_grad():
        for p in module.parameters():
            p.normal_(std=0.04)


@pytest.mark.parametrize("split_qkv_first", [False, True])
def test_encoder_unet_forward_parity(split_qkv_first, rng_np):
    torch.manual_seed(0)
    tmodel = TorchEncoderUNet(
        TINY["resolution"], TINY["in_channels"], TINY["model_channels"],
        TINY["out_channels"], TINY["num_res_blocks"],
        TINY["attention_resolutions"], TINY["channel_mult"],
        TINY["num_head_channels"], split_qkv_first=split_qkv_first,
    ).eval()
    _randomize(tmodel)

    model = EncoderUNet(
        **TINY, use_adaptive_gn=True, resblock_updown=True,
        split_qkv_first=split_qkv_first, pool="attention",
    )
    params = convert_torch_state_dict(tmodel.state_dict())

    x = torch.tensor(rng_np.normal(size=(2, 1, 16, 16)).astype(np.float32))
    t = torch.tensor([3, 17])
    with torch.no_grad():
        ref = tmodel(x, t).numpy()
    out = model.apply(
        {"params": params},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(t.numpy()),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)


def test_encoder_unet_converter_round_trip(rng_np):
    """flax -> torch state dict -> flax reproduces the pytree, and the torch
    state dict loads into the transcription with strict=True."""
    torch.manual_seed(1)
    tmodel = TorchEncoderUNet(
        TINY["resolution"], TINY["in_channels"], TINY["model_channels"],
        TINY["out_channels"], TINY["num_res_blocks"],
        TINY["attention_resolutions"], TINY["channel_mult"],
        TINY["num_head_channels"],
    )
    _randomize(tmodel)
    params = convert_torch_state_dict(tmodel.state_dict())
    sd = flax_params_to_torch_state_dict(params)
    tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    params2 = convert_torch_state_dict(tmodel.state_dict())
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_classifier_presets_instantiate():
    """Preset configs build and produce (B, 1000) logits (shape check on a
    tiny input-compatible variant to keep CPU time sane: openai_64 only)."""
    cfg = dict(CLASSIFIER_PRESETS["openai_64"])
    model = EncoderUNet(**cfg)
    x = jnp.zeros((1, 64, 64, 3))
    t = jnp.zeros((1,), jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, t)
    )["params"]
    n_params = sum(
        int(np.prod(s.shape)) for s in jax.tree.leaves(shapes)
    )
    out_shape = jax.eval_shape(
        lambda p: model.apply({"params": p}, x, t), shapes
    )
    assert out_shape.shape == (1, 1000)
    # guided-diffusion 64x64 classifier is ~54M params; sanity-band check
    assert 20e6 < n_params < 120e6, n_params


def test_adaptive_pool_head():
    model = EncoderUNet(
        **TINY, use_adaptive_gn=True, resblock_updown=True, pool="adaptive",
    )
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_classifier_guided_sampling_step(rng_np):
    """A converted EncoderUNet drives Diffusion's classifier-guidance hook:
    one guided DDPM step and one guided DDIM step run and differ from the
    unguided ones (the gradient actually flows)."""
    from nicediffusion_tpu.diffusion.process import Diffusion
    from nicediffusion_tpu.models.unet import DiffusionModel

    torch.manual_seed(2)
    tcls = TorchEncoderUNet(
        TINY["resolution"], TINY["in_channels"], TINY["model_channels"],
        TINY["out_channels"], TINY["num_res_blocks"],
        TINY["attention_resolutions"], TINY["channel_mult"],
        TINY["num_head_channels"],
    )
    _randomize(tcls)
    cls_model = EncoderUNet(
        **TINY, use_adaptive_gn=True, resblock_updown=True,
    )
    cls_params = convert_torch_state_dict(tcls.state_dict())

    def classifier_fn(x, t):
        return cls_model.apply({"params": cls_params}, x, t)

    unet = DiffusionModel(
        resolution=16, in_channels=1, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(8,), channel_mult=(1, 2),
        num_heads=2, num_classes=10, use_adaptive_gn=True,
        resblock_updown=True,
    )
    x = jnp.asarray(rng_np.normal(size=(2, 16, 16, 1)).astype(np.float32))
    tt = jnp.array([5, 5], jnp.int32)
    y = jnp.array([1, 4], jnp.int32)
    params = unet.init(jax.random.PRNGKey(0), x, tt, y)["params"]
    noise = jnp.asarray(rng_np.normal(size=x.shape).astype(np.float32))

    common = dict(
        original_num_steps=40, rescaled_num_steps=10,
        sampling_var_type="learned_interpolation", loss_type="hybrid",
        beta_schedule="cosine", ddim_eta=0.0,
    )
    for use_ddim in (False, True):
        guided = Diffusion(
            model=unet, guidance_method="classifier", guidance_strength=2.0,
            classifier=classifier_fn, use_ddim=use_ddim, **common,
        )
        plain = Diffusion(model=unet, use_ddim=use_ddim, **common)
        step = guided.ddim_step if use_ddim else guided.ddpm_step
        pstep = plain.ddim_step if use_ddim else plain.ddpm_step
        if use_ddim:
            g = step(params, x, tt, y=y, noise=noise)
            p = pstep(params, x, tt, y=y, noise=noise)
        else:
            g = step(params, x, tt, y=y, noise=noise)
            p = pstep(params, x, tt, y=y, noise=noise)
        g = g[0] if isinstance(g, tuple) else g
        p = p[0] if isinstance(p, tuple) else p
        assert np.isfinite(np.asarray(g)).all()
        assert not np.allclose(np.asarray(g), np.asarray(p), atol=1e-6)


def test_sample_cli_classifier_guided(tmp_path, monkeypatch):
    """scripts/sample.py end-to-end with --classifier_path: a tiny custom
    UNet + a tiny classifier (presets monkeypatched), saving real images."""
    import sys

    from nicediffusion_tpu.models.unet import DiffusionModel
    from nicediffusion_tpu.utils import config as config_mod
    from nicediffusion_tpu.utils.checkpoint import save_params_npz

    tiny_cls_cfg = dict(
        resolution=16, in_channels=1, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions=(8,), channel_mult=(1, 2),
        num_head_channels=16, use_adaptive_gn=True, resblock_updown=True,
        pool="attention",
    )
    monkeypatch.setitem(
        config_mod.CLASSIFIER_PRESETS, "openai_64", tiny_cls_cfg
    )

    unet = DiffusionModel(
        resolution=16, in_channels=1, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(8,), channel_mult=(1, 2),
        num_heads=2, num_classes=10, use_adaptive_gn=True,
        resblock_updown=True, split_qkv_first=True,
    )
    x = jnp.zeros((1, 16, 16, 1))
    t0 = jnp.zeros((1,), jnp.int32)
    uparams = unet.init(jax.random.PRNGKey(0), x, t0, t0)["params"]
    model_path = str(tmp_path / "tiny_model.npz")
    save_params_npz(uparams, model_path)

    cls = EncoderUNet(**tiny_cls_cfg)
    cparams = cls.init(jax.random.PRNGKey(1), x, t0)["params"]
    cls_path = str(tmp_path / "64x64_tiny_classifier.npz")
    save_params_npz(cparams, cls_path)

    out_dir = str(tmp_path / "out") + "/"
    import os

    os.makedirs(out_dir, exist_ok=True)
    argv = [
        "sample.py", "--model_path", model_path, "--custom",
        "--batch_size", "2", "--num_samples", "1",
        "--resolution", "16", "--model_channels", "32",
        "--channel_mult", "1/2", "--num_res_blocks", "1",
        "--attention_resolutions", "8", "--in_channels", "1",
        "--num_heads", "2", "--num_classes", "10", "--split_qkv_first",
        "--resblock_updown", "--use_adaptive_gn",
        "--rescaled_num_steps", "5", "--original_num_steps", "40",
        "--beta_schedule", "cosine",
        "--sampling_var_type", "learned_interpolation",
        "--guidance_method", "classifier", "--guidance_strength", "1.0",
        "--classifier_path", cls_path,
        "--labels", "3", "--save_path", out_dir, "--seed", "0", "--cpu",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    sys.path.insert(0, "/root/repo/scripts")
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "sample_cli_test", "/root/repo/scripts/sample.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
    finally:
        sys.path.remove("/root/repo/scripts")

    saved = os.listdir(out_dir)
    assert saved == ["3_sample0.jpg", "3_sample1.jpg"] or sorted(saved) == [
        "3_sample0.jpg", "3_sample1.jpg"
    ]
