"""Loss parity tests vs the torch reference for all four LossTypes, plus the
hybrid stop-gradient property (SURVEY.md §4.5)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from nicediffusion.diffusion import Diffusion as TorchDiffusion
from nicediffusion.model import DiffusionModel as TorchDiffusionModel

from nicediffusion_tpu.diffusion.process import Diffusion
from nicediffusion_tpu.models.unet import DiffusionModel
from nicediffusion_tpu.utils.convert import convert_torch_state_dict

MODEL_CFG = dict(
    resolution=16,
    in_channels=1,
    model_channels=32,
    out_channels=2,
    num_res_blocks=1,
    attention_resolutions=(8,),
    channel_mult=(1, 2),
    num_heads=4,
    num_classes=5,
    dropout=0.0,
    resblock_updown=True,
    use_adaptive_gn=True,
    split_qkv_first=True,
)

DIFF_ARGS = dict(
    original_num_steps=1000,
    rescaled_num_steps=10,
    sampling_var_type="learned_interpolation",
    beta_schedule="cosine",
)


def _setup(loss_type, var_type="learned_interpolation", cfg=None):
    cfg = dict(cfg or MODEL_CFG)
    if var_type in ("small", "large"):
        cfg["out_channels"] = cfg["in_channels"]
    torch.manual_seed(0)
    tmodel = TorchDiffusionModel(**cfg).eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.abs().sum() == 0:
                p.normal_(std=0.02)
    model = DiffusionModel(**cfg)
    params = convert_torch_state_dict(tmodel.state_dict())
    kwargs = dict(DIFF_ARGS, sampling_var_type=var_type, loss_type=loss_type)
    tdiff = TorchDiffusion(model=tmodel, device=torch.device("cpu"), **kwargs)
    jdiff = Diffusion(model=model, **kwargs)
    return tdiff, jdiff, params, cfg


@pytest.mark.parametrize(
    "loss_type,var_type",
    [
        ("simple", "small"),
        ("simple", "learned_interpolation"),
        ("KL", "learned_interpolation"),
        ("KL_rescaled", "learned_interpolation"),
        ("hybrid", "learned_interpolation"),
        ("hybrid", "learned"),
    ],
)
def test_loss_parity(rng_np, loss_type, var_type):
    tdiff, jdiff, params, cfg = _setup(loss_type, var_type)
    b = 4
    x0 = rng_np.uniform(-1, 1, size=(b, cfg["in_channels"], 16, 16)).astype(np.float32)
    noise = rng_np.normal(size=x0.shape).astype(np.float32)
    # include t == 0 to hit the NLL branch of the VLB (diffusion.py:438)
    t = np.array([0, 3, 7, 9])
    y = np.array([0, 1, 2, 3])

    ref = tdiff.loss(
        x_0=torch.tensor(x0),
        t=torch.tensor(t),
        kwargs={"y": torch.tensor(y)},
        noise=torch.tensor(noise),
    ).detach().numpy()

    ours = jdiff.loss(
        params,
        jnp.asarray(x0.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
        rng=jax.random.PRNGKey(0),
        y=jnp.asarray(y),
        noise=jnp.asarray(noise.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


def test_hybrid_stop_gradient(rng_np):
    """The hybrid VLB must not backprop through eps — gradients on the
    epsilon half of the output conv must equal the pure-simple-loss
    gradients (IDDPM eq. 16; reference diffusion.py:403-409)."""
    _, jdiff_hybrid, params, cfg = _setup("hybrid")
    _, jdiff_simple, _, _ = _setup("simple")

    b = 4
    x0 = rng_np.uniform(-1, 1, size=(b, 16, 16, cfg["in_channels"])).astype(np.float32)
    noise = rng_np.normal(size=x0.shape).astype(np.float32)
    t = jnp.asarray(np.array([1, 3, 7, 9]))
    y = jnp.asarray(np.array([0, 1, 2, 3]))

    def total(diff):
        def f(p):
            return diff.loss(
                p, jnp.asarray(x0), t, rng=jax.random.PRNGKey(0), y=y,
                noise=jnp.asarray(noise),
            ).sum()
        return jax.grad(f)(params)

    g_hybrid = total(jdiff_hybrid)
    g_simple = total(jdiff_simple)

    # out.layers_2 kernel has shape (3, 3, C, out_channels); channels
    # [0:in_channels] produce eps, the rest produce the variance channel.
    k_h = g_hybrid["out"]["layers_2"]["kernel"]
    k_s = g_simple["out"]["layers_2"]["kernel"]
    n = cfg["in_channels"]
    np.testing.assert_allclose(
        np.asarray(k_h[..., :n]), np.asarray(k_s[..., :n]), rtol=1e-4, atol=1e-6
    )
    # ...and the variance channels must receive gradient only in hybrid mode.
    assert float(jnp.abs(k_h[..., n:]).sum()) > 0
    assert float(jnp.abs(k_s[..., n:]).sum()) == 0
