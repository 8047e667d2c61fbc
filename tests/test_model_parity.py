"""Activation-parity tests: flax UNet vs the torch reference, per module and
end-to-end, through the weight converter (SURVEY.md §4.3).

Torch models are built with the reference code, their random-initialised
weights converted via nicediffusion_tpu.utils.convert, and both run on the
same inputs. Tolerance 1e-4..1e-3 (f32, different op orders/backends).
Covers the parity-critical variation axes called out in SURVEY.md:
both `split_qkv_first` orders, AdaGN vs additive embedding,
resblock_updown vs conv/interp resampling, conditional vs unconditional.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from nicediffusion.model import (
    AttentionBlock as TorchAttentionBlock,
    DiffusionModel as TorchDiffusionModel,
    ResidualBlock as TorchResidualBlock,
)

from nicediffusion_tpu.models.unet import (
    AttentionBlock,
    DiffusionModel,
    ResidualBlock,
)
from nicediffusion_tpu.utils.convert import (
    convert_torch_state_dict,
    flax_params_to_torch_state_dict,
)


def _to_nhwc(x: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 1))


def _from_nhwc(x) -> np.ndarray:
    return np.asarray(x).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("use_adaptive_gn", [True, False])
@pytest.mark.parametrize("resample", ["none", "up", "down"])
def test_residual_block_parity(use_adaptive_gn, resample, rng_np):
    torch.manual_seed(0)
    in_ch, out_ch, emb_ch = 32, 64, 128
    tblock = TorchResidualBlock(
        in_channels=in_ch,
        step_channels=emb_ch,
        dropout=0.0,
        out_channels=out_ch,
        upsample=resample == "up",
        downsample=resample == "down",
        use_adaptive_gn=use_adaptive_gn,
    ).eval()

    block = ResidualBlock(
        out_channels=out_ch,
        upsample=resample == "up",
        downsample=resample == "down",
        use_adaptive_gn=use_adaptive_gn,
    )
    params = convert_torch_state_dict(tblock.state_dict())

    x = torch.tensor(rng_np.normal(size=(2, in_ch, 8, 8)).astype(np.float32))
    emb = torch.tensor(rng_np.normal(size=(2, emb_ch)).astype(np.float32))
    with torch.no_grad():
        ref = tblock._forward(x, emb).numpy()
    out = block.apply({"params": params}, _to_nhwc(x), jnp.asarray(emb.numpy()))
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=2e-5)


@pytest.mark.parametrize("split_qkv_first", [True, False])
@pytest.mark.parametrize("heads_spec", [("heads", 4), ("head_ch", 16)])
def test_attention_block_parity(split_qkv_first, heads_spec, rng_np):
    torch.manual_seed(0)
    ch = 64
    kind, val = heads_spec
    tblock = TorchAttentionBlock(
        channels=ch,
        num_heads=val if kind == "heads" else 1,
        num_head_channels=val if kind == "head_ch" else None,
        split_qkv_first=split_qkv_first,
    ).eval()
    # zero_module zeroes proj_out; randomise it so the test is non-trivial.
    with torch.no_grad():
        tblock.proj_out.weight.normal_(std=0.05)
        tblock.proj_out.bias.normal_(std=0.05)

    block = AttentionBlock(
        num_heads=val if kind == "heads" else 1,
        num_head_channels=val if kind == "head_ch" else None,
        split_qkv_first=split_qkv_first,
    )
    params = convert_torch_state_dict(tblock.state_dict())

    x = torch.tensor(rng_np.normal(size=(2, ch, 8, 8)).astype(np.float32))
    with torch.no_grad():
        ref = tblock._forward(x).numpy()
    out = block.apply({"params": params}, _to_nhwc(x))
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=2e-5)


EMNIST_LIKE = dict(
    resolution=16,
    in_channels=1,
    model_channels=32,
    out_channels=2,
    num_res_blocks=2,
    attention_resolutions=(4, 8),
    channel_mult=(1, 2, 4),
    num_heads=4,
    num_classes=11,
    dropout=0.0,
    resblock_updown=True,
    use_adaptive_gn=True,
    split_qkv_first=True,
)

OPENAI_LIKE = dict(
    resolution=16,
    in_channels=3,
    model_channels=32,
    out_channels=6,
    num_res_blocks=2,
    attention_resolutions=(4, 8),
    channel_mult=(1, 2, 3),
    num_head_channels=16,
    num_classes=13,
    dropout=0.0,
    resblock_updown=True,
    use_adaptive_gn=True,
    split_qkv_first=True,
)

UNCOND_INTERP = dict(
    resolution=16,
    in_channels=3,
    model_channels=32,
    out_channels=3,
    num_res_blocks=1,
    attention_resolutions=(8,),
    channel_mult=(1, 2),
    num_heads=2,
    num_classes=None,
    dropout=0.0,
    resblock_updown=False,
    use_adaptive_gn=False,
    split_qkv_first=False,
)


def _randomise_zero_modules(tmodel):
    """zero_module'd convs make half the network a no-op; give them small
    random weights so parity is tested end-to-end."""
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(std=0.02)


@pytest.mark.parametrize("cfg", [EMNIST_LIKE, OPENAI_LIKE, UNCOND_INTERP],
                         ids=["emnist-like", "openai-like", "uncond-interp"])
def test_unet_end_to_end_parity(cfg, rng_np):
    torch.manual_seed(0)
    tmodel = TorchDiffusionModel(**cfg).eval()
    _randomise_zero_modules(tmodel)

    model = DiffusionModel(**cfg)
    params = convert_torch_state_dict(tmodel.state_dict())

    b = 2
    x = torch.tensor(
        rng_np.normal(size=(b, cfg["in_channels"], cfg["resolution"],
                            cfg["resolution"])).astype(np.float32)
    )
    t = torch.tensor([17, 431])
    y = torch.tensor([3, 7]) if cfg["num_classes"] else None

    with torch.no_grad():
        ref = tmodel(x, t, y).numpy()

    out = model.apply(
        {"params": params},
        _to_nhwc(x),
        jnp.asarray(t.numpy()),
        jnp.asarray(y.numpy()) if y is not None else None,
    )
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=5e-4)


def test_param_counts_match_reference_configs():
    """Total parameter counts for all four presets (SURVEY.md §2.2 table)."""
    from nicediffusion_tpu.utils.config import MODEL_PRESETS

    expected = {
        "EMNIST": 17_989_442,
        "openai_64": 295_904_454,
        "openai_128": 421_529_606,
        "openai_256": 553_838_086,
    }
    for name, want in expected.items():
        cfg = MODEL_PRESETS[name]
        model = DiffusionModel(**cfg)
        shapes = jax.eval_shape(
            lambda m=model, c=cfg: m.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, c["resolution"], c["resolution"], c["in_channels"])),
                jnp.zeros((1,), dtype=jnp.int32),
                jnp.zeros((1,), dtype=jnp.int32)
                if c.get("num_classes")
                else None,
            )
        )["params"]
        n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
        assert n == want, f"{name}: {n} != {want}"


def test_export_torch_checkpoint_loads_strict(tmp_path):
    """Params exported with export_torch_checkpoint load into the torch
    reference with strict=True (full both-direction interop)."""
    import jax.numpy as jnp

    from nicediffusion_tpu.models.unet import DiffusionModel
    from nicediffusion_tpu.utils.convert import export_torch_checkpoint

    cfg = EMNIST_LIKE
    model = DiffusionModel(**cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg["resolution"], cfg["resolution"], cfg["in_channels"])),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    path = str(tmp_path / "exported.pt")
    export_torch_checkpoint(params, path)

    tmodel = TorchDiffusionModel(**cfg)
    sd = torch.load(path, map_location="cpu", weights_only=True)
    tmodel.load_state_dict(sd, strict=True)

    # and the loaded torch model matches the flax model numerically
    x = torch.zeros(1, cfg["in_channels"], cfg["resolution"], cfg["resolution"])
    t = torch.tensor([11])
    y = torch.tensor([2])
    with torch.no_grad():
        ref = tmodel.eval()(x, t, y).numpy()
    out = model.apply(
        {"params": params}, _to_nhwc(x), jnp.asarray(t.numpy()), jnp.asarray(y.numpy())
    )
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=2e-5)


def test_round_trip_conversion():
    """flax -> torch -> flax state-dict conversion is lossless."""
    cfg = UNCOND_INTERP
    torch.manual_seed(1)
    tmodel = TorchDiffusionModel(**cfg)
    params = convert_torch_state_dict(tmodel.state_dict())
    back = flax_params_to_torch_state_dict(params)
    ref_sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    assert set(back) == set(ref_sd)
    for k in ref_sd:
        np.testing.assert_array_equal(back[k], ref_sd[k])
