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
