"""SuperResolutionModel parity vs the torch reference (reference
model.py:479-499 — present in the reference but unreachable from its
scripts; parity target is the class itself)."""

import numpy as np
import torch

import jax.numpy as jnp

from nicediffusion.model import SuperResolutionModel as TorchSRModel

from nicediffusion_tpu.models.unet import SuperResolutionModel
from nicediffusion_tpu.utils.convert import convert_torch_state_dict

CFG = dict(
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
    split_qkv_first=True,
)


def test_sr_model_parity(rng_np):
    torch.manual_seed(0)
    tmodel = TorchSRModel(upscale_resolution=16, in_channels=3, **CFG).eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.abs().sum() == 0:
                p.normal_(std=0.02)

    # reference doubles in_channels internally (model.py:492); ours takes the
    # doubled value explicitly
    model = SuperResolutionModel(resolution=16, in_channels=6, **CFG)
    params = convert_torch_state_dict(tmodel.state_dict())

    x = torch.tensor(rng_np.normal(size=(2, 3, 16, 16)).astype(np.float32))
    low_res = torch.tensor(rng_np.normal(size=(2, 3, 8, 8)).astype(np.float32))
    t = torch.tensor([13, 513])

    with torch.no_grad():
        ref = tmodel(x, t, low_res=low_res).numpy()

    out = model.apply(
        {"params": params},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(t.numpy()),
        low_res=jnp.asarray(low_res.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=5e-4
    )


def test_sr_sampling_via_model_kwargs(rng_np):
    """The diffusion engine can drive a SuperResolutionModel end-to-end via
    with_model_kwargs(low_res=...) — a sampling path the reference never
    wires up (its denoise passes only y, diffusion.py:246)."""
    import jax

    from nicediffusion_tpu.diffusion.process import Diffusion

    model = SuperResolutionModel(resolution=16, in_channels=6, **CFG)
    x = jnp.zeros((2, 16, 16, 3))
    low_res = jnp.asarray(rng_np.normal(size=(2, 8, 8, 3)).astype(np.float32))
    params = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32), low_res=low_res
    )["params"]

    diff = Diffusion(
        model=model,
        original_num_steps=20,
        rescaled_num_steps=5,
        sampling_var_type="small",
        loss_type="simple",
        beta_schedule="cosine",
    ).with_model_kwargs(low_res=low_res)

    # note: model.in_channels is the doubled count, so pass x explicitly
    # with the image channel count (same constraint as the reference)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    out = diff.denoise(params, jax.random.PRNGKey(2), x=x0)
    assert out.shape == (2, 16, 16, 3)
    assert bool(jnp.isfinite(out).all())
