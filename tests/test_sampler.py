"""Injected-noise parity tests for DDPM/DDIM sampling steps vs the torch
reference (SURVEY.md §4.4): single steps, CFG arithmetic, classifier
guidance, the t==0 noise mask, multi-step compounding, and scan-vs-python
consistency of the jitted chain."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import nicediffusion.diffusion as ref_diffusion
from nicediffusion.diffusion import Diffusion as TorchDiffusion
from nicediffusion.model import DiffusionModel as TorchDiffusionModel

from nicediffusion_tpu.diffusion.process import Diffusion
from nicediffusion_tpu.models.unet import DiffusionModel
from nicediffusion_tpu.utils.convert import convert_torch_state_dict

CFG_MODEL = dict(
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

UNCOND_MODEL = dict(CFG_MODEL, num_classes=None, in_channels=3, out_channels=6)


def _models(cfg, seed=0):
    torch.manual_seed(seed)
    tmodel = TorchDiffusionModel(**cfg).eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.abs().sum() == 0:
                p.normal_(std=0.02)
    model = DiffusionModel(**cfg)
    params = convert_torch_state_dict(tmodel.state_dict())
    return tmodel, model, params


def _nhwc(x):
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 1))


def _nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def _patch_noise(monkeypatch, noises):
    """Make the reference's internal torch.randn_like pop deterministic
    noise so steps are comparable (the reference has no injection hook in
    its sampling steps, diffusion.py:309/362)."""
    queue = [torch.tensor(n) for n in noises]
    monkeypatch.setattr(
        ref_diffusion.torch, "randn_like", lambda x: queue.pop(0)
    )
    return queue


DIFF_ARGS = dict(
    original_num_steps=1000,
    rescaled_num_steps=10,
    sampling_var_type="learned_interpolation",
    loss_type="hybrid",
    beta_schedule="cosine",
)


@pytest.mark.parametrize("t_val", [7, 1, 0])
def test_ddpm_step_parity_cfg(monkeypatch, rng_np, t_val):
    """One guided DDPM step, incl. the t==0 mask (reference diffusion.py:266-316)."""
    tmodel, model, params = _models(CFG_MODEL)
    kwargs = dict(DIFF_ARGS, guidance_method="classifier_free", guidance_strength=0.8)
    tdiff = TorchDiffusion(model=tmodel, device=torch.device("cpu"), **kwargs)
    jdiff = Diffusion(model=model, **kwargs)

    b = 2
    x = rng_np.normal(size=(b, 1, 16, 16)).astype(np.float32)
    noise = rng_np.normal(size=x.shape).astype(np.float32)
    y = np.array([1, 3])

    _patch_noise(monkeypatch, [noise])
    t_torch = torch.full((b,), float(t_val))
    with torch.no_grad():
        ref_sample, ref_x0 = tdiff.denoising_step(
            torch.tensor(x), t_torch, kwargs={"y": torch.tensor(y)}
        )

    t_jax = jnp.full((b,), t_val, dtype=jnp.int32)
    sample, pred_x0 = jdiff.ddpm_step(
        params, _nhwc(torch.tensor(x)), t_jax, y=jnp.asarray(y),
        noise=_nhwc(torch.tensor(noise)),
    )
    np.testing.assert_allclose(_nchw(sample), ref_sample.numpy(), atol=1e-3)
    np.testing.assert_allclose(_nchw(pred_x0), ref_x0.numpy(), atol=1e-3)


@pytest.mark.parametrize("eta", [0.0, 0.5])
def test_ddim_step_parity(monkeypatch, rng_np, eta):
    """One DDIM step, eta in {0, 0.5} (reference diffusion.py:318-369)."""
    tmodel, model, params = _models(UNCOND_MODEL)
    kwargs = dict(DIFF_ARGS, use_ddim=True, ddim_eta=eta)
    tdiff = TorchDiffusion(model=tmodel, device=torch.device("cpu"), **kwargs)
    jdiff = Diffusion(model=model, **kwargs)

    b = 2
    x = rng_np.normal(size=(b, 3, 16, 16)).astype(np.float32)
    noise = rng_np.normal(size=x.shape).astype(np.float32)

    _patch_noise(monkeypatch, [noise])
    with torch.no_grad():
        ref_sample, ref_x0 = tdiff.ddim_denoising_step(
            torch.tensor(x), torch.full((b,), 4.0), kwargs={}
        )
    sample, pred_x0 = jdiff.ddim_step(
        params, _nhwc(torch.tensor(x)), jnp.full((b,), 4, dtype=jnp.int32),
        noise=_nhwc(torch.tensor(noise)),
    )
    np.testing.assert_allclose(_nchw(sample), ref_sample.numpy(), atol=1e-3)
    np.testing.assert_allclose(_nchw(pred_x0), ref_x0.numpy(), atol=1e-3)


@pytest.mark.parametrize("var_type", ["small", "large", "learned"])
def test_ddpm_step_parity_var_types(monkeypatch, rng_np, var_type):
    """Fixed and directly-learned variance modes (reference diffusion.py:248-261)."""
    cfg = dict(UNCOND_MODEL)
    if var_type in ("small", "large"):
        cfg["out_channels"] = cfg["in_channels"]
    tmodel, model, params = _models(cfg)
    kwargs = dict(
        DIFF_ARGS,
        sampling_var_type=var_type,
        loss_type="simple" if var_type in ("small", "large") else "hybrid",
    )
    tdiff = TorchDiffusion(model=tmodel, device=torch.device("cpu"), **kwargs)
    jdiff = Diffusion(model=model, **kwargs)

    b = 2
    x = rng_np.normal(size=(b, 3, 16, 16)).astype(np.float32)
    noise = rng_np.normal(size=x.shape).astype(np.float32)

    _patch_noise(monkeypatch, [noise])
    with torch.no_grad():
        ref_sample, _ = tdiff.denoising_step(
            torch.tensor(x), torch.full((b,), 5.0), kwargs={}
        )
    sample, _ = jdiff.ddpm_step(
        params, _nhwc(torch.tensor(x)), jnp.full((b,), 5, dtype=jnp.int32),
        noise=_nhwc(torch.tensor(noise)),
    )
    np.testing.assert_allclose(_nchw(sample), ref_sample.numpy(), atol=1e-3)


class _TorchLinearClassifier(torch.nn.Module):
    def __init__(self, w, b):
        super().__init__()
        self.w = torch.nn.Parameter(torch.tensor(w))
        self.b = torch.nn.Parameter(torch.tensor(b))

    def forward(self, x, t):
        return torch.flatten(x, 1) @ self.w + self.b


@pytest.mark.parametrize("use_ddim", [False, True])
def test_classifier_guidance_parity(monkeypatch, rng_np, use_ddim):
    """Classifier guidance: on the mean for DDPM (OpenAI Alg. 1, reference
    diffusion.py:296-305), on eps for DDIM (Alg. 2, diffusion.py:330-337)."""
    cfg = dict(CFG_MODEL, in_channels=1, out_channels=2)
    tmodel, model, params = _models(cfg)
    n_classes = cfg["num_classes"]
    w = (rng_np.normal(size=(16 * 16, n_classes)) * 0.1).astype(np.float32)
    b = rng_np.normal(size=(n_classes,)).astype(np.float32)

    tclf = _TorchLinearClassifier(w, b)
    wj, bj = jnp.asarray(w), jnp.asarray(b)

    def jclf(x, t):
        return x.reshape(x.shape[0], -1) @ wj + bj

    kwargs = dict(
        DIFF_ARGS, guidance_method="classifier", guidance_strength=2.0
    )
    if use_ddim:
        kwargs.update(use_ddim=True, ddim_eta=0.0)
    tdiff = TorchDiffusion(
        model=tmodel, device=torch.device("cpu"), classifier=tclf, **kwargs
    )
    jdiff = Diffusion(model=model, classifier=jclf, **kwargs)

    bsz = 2
    x = rng_np.normal(size=(bsz, 1, 16, 16)).astype(np.float32)
    noise = rng_np.normal(size=x.shape).astype(np.float32)
    y = np.array([0, 4])

    _patch_noise(monkeypatch, [noise])
    step = tdiff.ddim_denoising_step if use_ddim else tdiff.denoising_step
    ref_sample, _ = step(
        torch.tensor(x), torch.full((bsz,), 6.0), kwargs={"y": torch.tensor(y)}
    )
    # NHWC classifier flattening differs from NCHW for multi-channel inputs;
    # single channel keeps them identical.
    jstep = jdiff.ddim_step if use_ddim else jdiff.ddpm_step
    sample, _ = jstep(
        params, _nhwc(torch.tensor(x)), jnp.full((bsz,), 6, dtype=jnp.int32),
        y=jnp.asarray(y), noise=_nhwc(torch.tensor(noise)),
    )
    np.testing.assert_allclose(
        _nchw(sample), ref_sample.detach().numpy(), atol=1e-3
    )


def test_multi_step_compounding_parity(monkeypatch, rng_np):
    """Full 10-step guided DDPM chain with a shared deterministic noise
    sequence — checks per-step error does not compound past 1e-3
    (SURVEY.md §6 parity target)."""
    tmodel, model, params = _models(CFG_MODEL)
    kwargs = dict(DIFF_ARGS, guidance_method="classifier_free", guidance_strength=0.8)
    tdiff = TorchDiffusion(model=tmodel, device=torch.device("cpu"), **kwargs)
    jdiff = Diffusion(model=model, **kwargs)

    steps = 10
    b = 2
    x0 = rng_np.normal(size=(b, 1, 16, 16)).astype(np.float32)
    noises = [rng_np.normal(size=x0.shape).astype(np.float32) for _ in range(steps)]
    y = np.array([2, 4])

    _patch_noise(monkeypatch, list(noises))
    xt = torch.tensor(x0)
    with torch.no_grad():
        for t in reversed(range(steps)):
            xt, _ = tdiff.denoising_step(
                xt, torch.full((b,), float(t)), kwargs={"y": torch.tensor(y)}
            )
    ref = xt.numpy()

    xj = _nhwc(torch.tensor(x0))
    for t in reversed(range(steps)):
        xj, _ = jdiff.ddpm_step(
            params, xj, jnp.full((b,), t, dtype=jnp.int32),
            y=jnp.asarray(y), noise=_nhwc(torch.tensor(noises[steps - 1 - t])),
        )
    np.testing.assert_allclose(_nchw(xj), ref, atol=2e-3)


def test_scan_denoise_matches_python_loop(rng_np):
    """The single-compiled-scan chain must equal stepping the same RNG key
    schedule in a host loop (validates the scan re-design of reference
    diffusion.py:206-220)."""
    tmodel, model, params = _models(CFG_MODEL)
    kwargs = dict(DIFF_ARGS, guidance_method="classifier_free", guidance_strength=0.8)
    jdiff = Diffusion(model=model, **kwargs)

    b = 2
    y = jnp.array([1, 2])
    rng = jax.random.PRNGKey(42)
    out = jdiff.denoise(params, rng, y=y, batch_size=b)

    # replicate: init-noise split, then per-step folds
    rng2, init_rng = jax.random.split(jax.random.PRNGKey(42))
    x = jax.random.normal(init_rng, (b, 16, 16, 1), dtype=jnp.float32)
    key = rng2
    for t in reversed(range(jdiff.rescaled_num_steps)):
        key, step_key = jax.random.split(key)
        step_noise = jax.random.normal(step_key, x.shape, dtype=jnp.float32)
        x, _ = jdiff.ddpm_step(
            params, x, jnp.full((b,), t, dtype=jnp.int32), y=y, noise=step_noise
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_ema_params_are_just_another_pytree(rng_np):
    """Sampling with a different (EMA) pytree changes the output — the
    functional replacement for the reference's weight swap
    (diffusion.py:184-189)."""
    _, model, params = _models(CFG_MODEL)
    kwargs = dict(DIFF_ARGS, guidance_method="classifier_free", guidance_strength=0.8)
    jdiff = Diffusion(model=model, **kwargs)
    ema = jax.tree.map(lambda p: p * 0.5, params)
    y = jnp.array([1, 2])
    a = jdiff.denoise(params, jax.random.PRNGKey(0), y=y, batch_size=2)
    b = jdiff.denoise(ema, jax.random.PRNGKey(0), y=y, batch_size=2)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_progress_tick_reorder_safe():
    """The tqdm tick closes on the steps_to_do-th callback (count-based),
    so unordered delivery — e.g. the t=0 tick arriving before a straggler
    t=1 — never leaves an orphan bar behind, and a second chain through
    the same compiled sampler starts from a fresh bar."""
    from nicediffusion_tpu.diffusion.process import _make_progress_tick

    tick = _make_progress_tick(4)
    state = tick.__closure__  # sanity: closure-based state exists
    assert state is not None

    # chain 1, delivered out of order with t=0 NOT last
    for t in (3, 2, 0, 1):
        tick(t)
    # all 4 ticks delivered -> bar closed, no orphan live bar
    cells = {
        k: v for cell in tick.__closure__
        for k, v in (cell.cell_contents.items()
                     if isinstance(cell.cell_contents, dict) else ())
    }
    assert cells.get("bar") is None
    assert cells.get("seen") == 0

    # chain 2 reuses the same tick and completes cleanly in order
    for t in (3, 2, 1, 0):
        tick(t)
    cells = {
        k: v for cell in tick.__closure__
        for k, v in (cell.cell_contents.items()
                     if isinstance(cell.cell_contents, dict) else ())
    }
    assert cells.get("bar") is None
    assert cells.get("seen") == 0
