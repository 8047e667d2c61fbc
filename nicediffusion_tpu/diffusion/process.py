"""Gaussian diffusion process engine — forward q-process, DDPM/DDIM sampling,
losses, and guidance — built TPU-first.

Functional re-design of the reference engine
(/root/reference/nicediffusion/diffusion.py:22-438). Key departures, all
deliberate TPU-native choices:

  * The entire reverse chain runs as **one jitted jax.lax.scan** over the
    rescaled step index (replacing the host Python loop at reference
    diffusion.py:206-220), with every coefficient table folded into the
    compiled program — no per-step host->device copies (the reference's
    `extract`, diffusion.py:478-496, re-uploads numpy arrays every step).
  * Classifier-free guidance runs the conditional and null-class branches as
    **one doubled-batch UNet call** instead of two sequential calls
    (reference diffusion.py:278-284): all norms are GroupNorm (batch-stat
    free), so results are identical and the MXU sees twice the batch.
  * Parameters are passed explicitly, so "sample with EMA weights" is just
    calling with a different pytree (vs. the reference's in-place parameter
    swapping, diffusion.py:184-189, 222-225).
  * RNG is explicit `jax.random` key threading (one fold per step).

Schedule tables are precomputed in float64 on the host (ops/schedule.py),
cast to float32 at use — exactly the reference's numerics.
"""

from __future__ import annotations

import enum
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import discretized_gaussian_log_likelihood, kl_div, mean_flat
from ..ops.schedule import DiffusionSchedule

__all__ = ["Diffusion", "VarType", "LossType"]


class VarType(enum.Enum):
    """Sampling variance modes (reference diffusion.py:552-572)."""

    SMALL = enum.auto()
    LARGE = enum.auto()
    LEARNED = enum.auto()
    LEARNED_INTERPOLATION = enum.auto()

    @staticmethod
    def parse(s: "str | VarType") -> "VarType":
        if isinstance(s, VarType):
            return s
        try:
            return {
                "small": VarType.SMALL,
                "large": VarType.LARGE,
                "learned": VarType.LEARNED,
                "learned_interpolation": VarType.LEARNED_INTERPOLATION,
            }[s]
        except KeyError:
            raise NotImplementedError(s) from None

    @property
    def is_learned(self) -> bool:
        return self in (VarType.LEARNED, VarType.LEARNED_INTERPOLATION)


class LossType(enum.Enum):
    """Training loss modes (reference diffusion.py:575-595)."""

    SIMPLE = enum.auto()
    KL = enum.auto()
    KL_RESCALED = enum.auto()
    HYBRID = enum.auto()

    @staticmethod
    def parse(s: "str | LossType") -> "LossType":
        if isinstance(s, LossType):
            return s
        try:
            return {
                "simple": LossType.SIMPLE,
                "KL": LossType.KL,
                "KL_rescaled": LossType.KL_RESCALED,
                "hybrid": LossType.HYBRID,
            }[s]
        except KeyError:
            raise NotImplementedError(s) from None


def _make_progress_tick(steps_to_do: int):
    """Host-side tqdm ticked from inside a compiled scan — keeps the
    reference's progress-bar UX (diffusion.py:207-212) without any host
    round-trip on the data path."""
    import tqdm

    state: dict = {"bar": None, "seen": 0}

    def _tick(t):
        # Reorder-safe across unordered callback delivery: every chain
        # delivers exactly steps_to_do ticks, so the bar closes on the
        # steps_to_do-th tick (count-based) rather than on t==0 — a t==0
        # close with a straggling t>0 callback behind it would reopen an
        # orphan bar. Display position is still max-of-step-index, so
        # out-of-order ticks never move the bar backwards.
        t = int(t)
        if state["bar"] is None:
            state["bar"] = tqdm.tqdm(total=steps_to_do)
        bar = state["bar"]
        state["seen"] += 1
        bar.n = max(bar.n, steps_to_do - t)
        bar.refresh()
        if state["seen"] >= steps_to_do:
            bar.n = steps_to_do
            bar.close()
            state["bar"] = None
            state["seen"] = 0

    return _tick


def _runs(flags: list) -> list[tuple[int, int, bool]]:
    """Compress a static per-position flag list into contiguous
    (start, length, flag) runs — the scan segmentation for
    limited-interval guidance."""
    runs, start = [], 0
    for i in range(1, len(flags) + 1):
        if i == len(flags) or flags[i] != flags[start]:
            runs.append((start, i - start, flags[start]))
            start = i
    return runs


def _bcast(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-timestep coefficients and broadcast over trailing dims.

    Device-side analogue of reference `extract` (diffusion.py:478-496) — the
    table is already a device constant baked into the jitted program.
    """
    out = jnp.take(table, t)
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


class Diffusion:
    """Diffusion chain handler: `.diffuse()`, `.denoise()`, `.loss()`.

    Mirrors the reference constructor surface (diffusion.py:23-130) minus the
    device plumbing (XLA owns placement). `model` is a flax module (e.g.
    nicediffusion_tpu.models.DiffusionModel); its parameters are passed
    explicitly to every method, which is how EMA sampling works.

    `classifier` is an optional callable `(x_nhwc, t_rescaled) -> logits`
    used for classifier guidance; per the reference quirk it receives the
    *rescaled* timestep, not the mapped original one (diffusion.py:301).
    """

    def __init__(
        self,
        model: Any,
        original_num_steps: int,
        rescaled_num_steps: int,
        sampling_var_type: str | VarType,
        loss_type: str | LossType,
        betas: Sequence[float] | np.ndarray | None = None,
        beta_schedule: str = "linear",
        guidance_method: str | None = None,
        guidance_strength: float | None = None,
        classifier: Callable | None = None,
        use_ddim: bool = False,
        ddim_eta: float | None = None,
        clip_x: "bool | str" = True,
        sampler: str | None = None,
        respacing: str = "even",
        dynamic_threshold: float = 0.995,
        timestep_indices=None,
        prediction_type: str = "eps",
    ):
        if guidance_method not in (None, "classifier", "classifier_free"):
            raise NotImplementedError(guidance_method)
        if model is not None and guidance_method is not None:
            assert model.conditional, "can only use guidance if model is conditional"
        if use_ddim:
            assert ddim_eta is not None, "please supply eta if you want to use ddim"
        # `sampler` supersedes the reference's boolean use_ddim flag:
        # 'ddpm' (ancestral), 'ddim' (eq. 12), or 'dpm++' (DPM-Solver++(2M),
        # a 2nd-order multistep ODE solver — TPU-native capability extension
        # with no reference analogue; same per-step cost as DDIM but ~2-4x
        # fewer steps for equal sample quality).
        if sampler is None:
            sampler = "ddim" if use_ddim else "ddpm"
        if sampler not in ("ddpm", "ddim", "dpm++"):
            raise NotImplementedError(sampler)
        if sampler == "ddim" and ddim_eta is None:
            ddim_eta = 0.0
        self.sampler = sampler

        self.model = model
        self.guidance = guidance_method
        self.strength = guidance_strength
        self.classifier = classifier
        self.use_ddim = use_ddim
        self.ddim_eta = ddim_eta
        # clip_x: True (clamp pred_x0 to [-1,1], the reference default,
        # diffusion.py:286-290), False, or 'dynamic' — Imagen-style dynamic
        # thresholding (arXiv:2205.11487 §2.3): clamp to the per-sample
        # `dynamic_threshold` percentile s of |pred_x0| (s >= 1) and divide
        # by s. Capability extension; prevents CFG saturation at high w.
        if clip_x not in (True, False, "dynamic"):
            raise NotImplementedError(clip_x)
        # Model-output convention (capability extension; the reference is
        # eps-only): 'eps' predicts the noise; 'v' predicts
        # v = alpha*eps - sigma*x0 (Salimans & Ho 2202.00512 App. D — the
        # numerically stable choice for few-step/distilled models). The
        # conversion eps = sigma*x_t + alpha*v happens once at the model
        # boundary (_split_out callers), so every sampler, loss, and
        # guidance path downstream is parameterisation-agnostic.
        if prediction_type not in ("eps", "v"):
            raise NotImplementedError(prediction_type)
        self.prediction_type = prediction_type
        self.clip_x = clip_x
        self.dynamic_threshold = dynamic_threshold
        self.sampling_var_type = VarType.parse(sampling_var_type)
        self.loss_type = LossType.parse(loss_type)
        self.original_num_steps = original_num_steps

        self.schedule = DiffusionSchedule.create(
            original_num_steps=original_num_steps,
            rescaled_num_steps=rescaled_num_steps,
            beta_schedule=beta_schedule,
            betas=betas,
            respacing=respacing,
            timestep_indices=timestep_indices,
        )
        self.rescaled_num_steps = self.schedule.rescaled_num_steps
        self.timestep_map = jnp.asarray(self.schedule.timestep_map, dtype=jnp.int32)

        # Coefficient tables as float32 device constants (folded into jit).
        s = self.schedule
        as32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        self._sqrt_acp = as32(s.sqrt_alphas_cumprod)
        self._sqrt_1macp = as32(s.sqrt_one_minus_alphas_cumprod)
        self._sqrt_recip_acp = as32(s.sqrt_reciprocal_alphas_cumprod)
        self._sqrt_recipm1_acp = as32(s.sqrt_reciprocal_alphas_minus_one_cumprod)
        self._acp = as32(s.alphas_cumprod)
        self._acp_prev = as32(s.alphas_cumprod_prev)
        self._post_coef_x0 = as32(s.posterior_mean_coef_x0)
        self._post_coef_xt = as32(s.posterior_mean_coef_xt)
        self._log_post_var = as32(s.log_posterior_var_clipped)
        self._log_betas = as32(s.log_betas)
        self._log_var_large = as32(s.log_var_large)
        self._log_var_small = as32(s.log_var_small)

        # DPM-Solver++(2M) per-step coefficient tables, precomputed on the
        # host in float64 (like every other schedule table) so the t==0
        # boundary (sigma_prev == 0, h -> inf) is resolved exactly with no
        # inf/nan arithmetic inside the compiled scan. With the half-log-SNR
        # lambda_t = log(alpha_t / sigma_t), the t -> t-1 transition is
        #   x <- (sigma_prev / sigma_t) * x + alpha_prev * (1 - e^{-h}) * D
        #   D  = (1 + m_t) * x0_t - m_t * x0_{t+1},  m_t = h_t / (2 h_{t+1})
        # (DPM-Solver++ eq. 4.3/4.4 in multistep form). m is forced to 0 at
        # the first step (no history) and the last (first-order final step,
        # standard practice since h_0 = inf).
        acp64 = np.asarray(s.alphas_cumprod, dtype=np.float64)
        acp_prev64 = np.asarray(s.alphas_cumprod_prev, dtype=np.float64)
        alpha_t = np.sqrt(acp64)
        sigma_t = np.sqrt(1.0 - acp64)
        alpha_p = np.sqrt(acp_prev64)
        sigma_p = np.sqrt(1.0 - acp_prev64)
        # e^{-h} = (sigma_prev * alpha_t) / (sigma_t * alpha_prev): exactly 0
        # at t==0 where sigma_prev == 0
        exp_mh = (sigma_p * alpha_t) / (sigma_t * alpha_p)
        n = len(acp64)
        with np.errstate(divide="ignore"):
            lam = 0.5 * np.log(acp64 / (1.0 - acp64))
            lam_p = 0.5 * np.log(
                acp_prev64 / np.maximum(1.0 - acp_prev64, 1e-300)
            )
        h = lam_p - lam  # h[0] may be inf (unused: m[0] = 0)
        m = np.zeros(n, dtype=np.float64)
        if n > 2:
            m[1 : n - 1] = h[1 : n - 1] / (2.0 * h[2:n])
        self._dpmpp_c_xt = as32(sigma_p / sigma_t)
        self._dpmpp_c_d = as32(alpha_p * (1.0 - exp_mh))
        self._dpmpp_m = as32(m)

        # Extra static kwargs forwarded to every model call (e.g.
        # low_res=<image batch> to drive a SuperResolutionModel — a sampling
        # path the reference never wires up, model.py:479-499). Set via
        # `with_model_kwargs` to keep the instance hashable for jit caching.
        self.model_kwargs: dict = {}
        self._sampler_cache: dict = {}

    def with_model_kwargs(self, **kwargs) -> "Diffusion":
        """Set extra model-call kwargs (clears compiled-sampler cache).

        Kwargs are forwarded verbatim; under classifier-free guidance the
        model batch is doubled, so batched kwargs must be pre-doubled.
        """
        self.model_kwargs = kwargs
        self._sampler_cache = {}
        return self

    # ------------------------------------------------------------------
    # Forward (q) process
    # ------------------------------------------------------------------

    def q_sample(self, x_0, t, noise):
        """Sample q(x_t | x_0) (DDPM eq. 4; reference diffusion.py:232-240)."""
        return (
            _bcast(self._sqrt_acp, t, x_0.ndim) * x_0
            + _bcast(self._sqrt_1macp, t, x_0.ndim) * noise
        )

    def diffuse(self, x_0, rng=None, steps_to_do=None, noise=None):
        """Jump straight to q(x_t | x_0) at rescaled step `steps_to_do - 1`
        (reference diffusion.py:132-153)."""
        if steps_to_do is None or steps_to_do > self.rescaled_num_steps:
            steps_to_do = self.rescaled_num_steps
        if noise is None:
            assert rng is not None, "pass rng or explicit noise"
            noise = jax.random.normal(rng, x_0.shape, dtype=x_0.dtype)
        t = jnp.full((x_0.shape[0],), steps_to_do - 1, dtype=jnp.int32)
        return self.q_sample(x_0, t, noise)

    # ------------------------------------------------------------------
    # Model output handling
    # ------------------------------------------------------------------

    @staticmethod
    def _variables(params):
        """Accept either a bare params pytree or a full flax variables dict
        (e.g. ``{"params": ..., "quant": ...}`` from the int8 serving path,
        ops/quant.py build_int8_variables)."""
        if isinstance(params, dict) and "params" in params:
            return params
        return {"params": params}

    def _apply_model(self, params, x, t, y):
        """Run the UNet at the mapped original timestep (diffusion.py:246)."""
        mapped = jnp.take(self.timestep_map, t)
        kwargs = dict(self.model_kwargs)
        if self.model.conditional:
            kwargs["y"] = y
        return self.model.apply(self._variables(params), x, mapped, **kwargs)

    def _resolve_log_var(self, raw_log_var, t, ndim):
        """Resolve the log-variance per sampling_var_type
        (reference diffusion.py:248-263). `raw_log_var` is the model's second
        channel half (learned modes) or None (fixed modes)."""
        vt = self.sampling_var_type
        if vt == VarType.LEARNED:
            return raw_log_var
        elif vt == VarType.LEARNED_INTERPOLATION:
            min_log = _bcast(self._log_post_var, t, ndim)
            max_log = _bcast(self._log_betas, t, ndim)
            frac = (raw_log_var + 1) / 2
            return frac * max_log + (1 - frac) * min_log
        elif vt == VarType.LARGE:
            return _bcast(self._log_var_large, t, ndim)
        elif vt == VarType.SMALL:
            return _bcast(self._log_var_small, t, ndim)
        raise NotImplementedError(vt)

    def _split_out(self, out):
        """Split the model output into (eps, raw_log_var-or-None)
        (reference diffusion.py:248-252)."""
        if self.sampling_var_type.is_learned:
            eps, raw = jnp.split(out, 2, axis=-1)
            return eps, raw
        return out, None

    def _to_eps(self, pred, x_t, t):
        """Convert the model's native prediction to epsilon. For 'v':
        eps = sigma_t * x_t + alpha_t * v (from v = alpha*eps - sigma*x0
        and x_t = alpha*x0 + sigma*eps). Identity for 'eps'."""
        if self.prediction_type == "eps":
            return pred
        # f64-derived host tables, like every other coefficient lookup
        a = _bcast(self._sqrt_acp, t, x_t.ndim)
        s = _bcast(self._sqrt_1macp, t, x_t.ndim)
        return s * x_t + a * pred

    def get_eps_and_log_var(self, params, x_t, t, y=None):
        """Predicted epsilon and (learned or fixed) log variance
        (reference diffusion.py:242-264)."""
        pred, raw = self._split_out(self._apply_model(params, x_t, t, y))
        return self._to_eps(pred, x_t, t), self._resolve_log_var(raw, t, x_t.ndim)

    def _cfg_combine(self, out2):
        """CFG arithmetic on a doubled-batch model output: `(1+w)*eps_c -
        w*eps_0` (reference diffusion.py:278-284 / 341-347); the log_var
        half comes from the conditional branch, as in the reference."""
        cond, uncond = jnp.split(out2, 2, axis=0)
        if self.sampling_var_type.is_learned:
            eps_c, raw = jnp.split(cond, 2, axis=-1)
            eps_u, _ = jnp.split(uncond, 2, axis=-1)
            eps = (1 + self.strength) * eps_c - self.strength * eps_u
            return jnp.concatenate([eps, raw], axis=-1)
        return (1 + self.strength) * cond - self.strength * uncond

    def _guided_eps(self, params, x, t, y, *, want_log_var: bool,
                    guided: bool = True):
        """Epsilon (+ log_var) with classifier-free guidance fused into a
        single doubled-batch model call when active.

        ``guided=False`` forces the plain conditional call (one model
        forward instead of two) even when classifier-free guidance is
        configured — the limited-interval guidance mechanism (Kynkäänniemi
        et al. 2024, arXiv:2404.07724)."""
        if self.guidance != "classifier_free" or not guided:
            out = self._apply_model(params, x, t, y)
        else:
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            y2 = jnp.concatenate([y, jnp.zeros_like(y)], axis=0)
            out = self._cfg_combine(self._apply_model(params, x2, t2, y2))
            # (for 'v' models the CFG mix in v-space equals the mix in
            # eps-space: the v->eps map is affine in v at fixed x_t)

        pred, raw = self._split_out(out)
        eps = self._to_eps(pred, x, t)
        if not want_log_var:
            return eps, None
        return eps, self._resolve_log_var(raw, t, x.ndim)

    # ------------------------------------------------------------------
    # Encoder-cached model calls ("Faster Diffusion", arXiv:2312.09608)
    # ------------------------------------------------------------------

    def _apply_model_split(self, params, x, t, y, cache, refresh: bool):
        """Model call through the embed/encode/decode split (models/unet.py),
        reusing cached encoder features when ``refresh`` is False.

        The timestep embedding and the decoder always run at the *current*
        t; only the encoder stack (and its skip activations) is frozen to
        the last refresh step. Returns (out, cache)."""
        if self.model_kwargs:
            raise NotImplementedError(
                "encoder_cache does not support extra model kwargs "
                "(e.g. SuperResolutionModel low_res)"
            )
        mapped = jnp.take(self.timestep_map, t)
        apply = self.model.apply
        variables = self._variables(params)
        emb = apply(
            variables, mapped,
            y if self.model.conditional else None, method=self.model.embed,
        )
        if refresh:
            h, xs = apply(variables, x, emb, method=self.model.encode)
            cache = (h, tuple(xs))
        h, xs = cache
        out = apply(
            variables, h, list(xs), emb, method=self.model.decode
        )
        return out, cache

    def _guided_eps_cached(
        self, params, x, t, y, cache, refresh: bool, *, want_log_var: bool,
        guided: bool = True
    ):
        """_guided_eps via the encoder-cached path; returns
        ((eps, log_var), cache)."""
        if self.guidance != "classifier_free" or not guided:
            out, cache = self._apply_model_split(params, x, t, y, cache, refresh)
        else:
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            y2 = jnp.concatenate([y, jnp.zeros_like(y)], axis=0)
            out2, cache = self._apply_model_split(
                params, x2, t2, y2, cache, refresh
            )
            out = self._cfg_combine(out2)

        pred, raw = self._split_out(out)
        eps = self._to_eps(pred, x, t)
        if not want_log_var:
            return (eps, None), cache
        return (eps, self._resolve_log_var(raw, t, x.ndim)), cache

    def _classifier_grad(self, x, t, y):
        """grad_x log p(y | x, t) via jax.grad (replaces torch.autograd.grad,
        reference diffusion.py:299-304). Classifier sees the rescaled t."""

        def log_prob(xx):
            log_probs = jax.nn.log_softmax(self.classifier(xx, t), axis=-1)
            return jnp.sum(
                jnp.take_along_axis(log_probs, y.reshape(-1, 1), axis=-1)
            )

        return jax.grad(log_prob)(x)

    # ------------------------------------------------------------------
    # Reverse (p) steps — pure functions of (params, x, t, rng)
    # ------------------------------------------------------------------

    def ddpm_step(self, params, x_t, t, rng=None, y=None, noise=None,
                  eps_log_var=None):
        """One DDPM ancestral step (reference diffusion.py:266-316).

        Returns (sample, pred_x0). `t` is a (B,) rescaled-index array;
        `noise` may be injected for parity tests; `eps_log_var` may carry a
        precomputed (eps, log_var) pair (encoder-cached sampling).
        """
        if eps_log_var is None:
            eps_log_var = self._guided_eps(params, x_t, t, y, want_log_var=True)
        eps, log_var = eps_log_var

        pred_x0 = self._clip_x0(
            _bcast(self._sqrt_recip_acp, t, x_t.ndim) * x_t
            - _bcast(self._sqrt_recipm1_acp, t, x_t.ndim) * eps
        )

        mean = (
            _bcast(self._post_coef_x0, t, x_t.ndim) * pred_x0
            + _bcast(self._post_coef_xt, t, x_t.ndim) * x_t
        )

        if self.guidance == "classifier":
            grad = self._classifier_grad(x_t, t, y)
            mean = mean + self.strength * grad * jnp.exp(log_var)

        if noise is None:
            noise = jax.random.normal(rng, x_t.shape, dtype=jnp.float32)
        mask = (1.0 - (t == 0).astype(jnp.float32)).reshape(
            (x_t.shape[0],) + (1,) * (x_t.ndim - 1)
        )
        sample = mean + mask * jnp.exp(0.5 * log_var) * noise
        return sample.astype(jnp.float32), pred_x0

    def _clip_x0(self, pred_x0):
        """Apply the configured x0 clamp: hard [-1,1] (reference), none, or
        Imagen dynamic thresholding (per-sample percentile clamp+rescale)."""
        if self.clip_x == "dynamic":
            s = jnp.quantile(
                jnp.abs(pred_x0.reshape(pred_x0.shape[0], -1)),
                self.dynamic_threshold, axis=1,
            )
            s = jnp.maximum(s, 1.0).reshape(
                (-1,) + (1,) * (pred_x0.ndim - 1)
            )
            return jnp.clip(pred_x0, -s, s) / s
        if self.clip_x:
            return jnp.clip(pred_x0, -1, 1)
        return pred_x0

    def _eps_guided_x0(self, params, x_t, t, y, eps):
        """Shared DDIM/DPM++ tail: classifier guidance applied to eps
        (OpenAI Alg. 2, reference diffusion.py:330-337), then the x0
        projection with optional clipping. Returns (eps, pred_x0)."""
        if self.guidance == "classifier":
            grad = self._classifier_grad(x_t, t, y)
            eps = eps - self.strength * grad * _bcast(self._sqrt_1macp, t, x_t.ndim)
        pred_x0 = (
            _bcast(self._sqrt_recip_acp, t, x_t.ndim) * x_t
            - _bcast(self._sqrt_recipm1_acp, t, x_t.ndim) * eps
        )
        return eps, self._clip_x0(pred_x0)

    def ddim_step(self, params, x_t, t, rng=None, y=None, noise=None,
                  eps_log_var=None):
        """One DDIM step, eq. 12 of DDIM (reference diffusion.py:318-369)."""
        if eps_log_var is None:
            eps_log_var = self._guided_eps(params, x_t, t, y, want_log_var=False)
        eps, _ = eps_log_var
        eps, pred_x0 = self._eps_guided_x0(params, x_t, t, y, eps)

        alpha_bar = _bcast(self._acp, t, x_t.ndim)
        alpha_bar_prev = _bcast(self._acp_prev, t, x_t.ndim)
        var = (
            self.ddim_eta**2
            * (1.0 - alpha_bar_prev)
            * (1.0 - alpha_bar / alpha_bar_prev)
            / (1.0 - alpha_bar)
        )
        mean = pred_x0 * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(
            1 - alpha_bar_prev - var
        ) * eps

        if noise is None:
            noise = jax.random.normal(rng, x_t.shape, dtype=jnp.float32)
        mask = (1.0 - (t == 0).astype(jnp.float32)).reshape(
            (x_t.shape[0],) + (1,) * (x_t.ndim - 1)
        )
        sample = mean + mask * jnp.sqrt(var) * noise
        return sample.astype(jnp.float32), pred_x0

    def dpmpp_step(self, params, x_t, t, x0_prev, y=None, first=False,
                   eps_log_var=None):
        """One DPM-Solver++(2M) multistep update (deterministic).

        `x0_prev` is the previous step's pred_x0; `first` marks the first
        executed step, where no history exists and the update falls back to
        first order (m forced to 0 — needed when a partial denoise starts
        mid-chain at an index whose table m is nonzero). Returns
        (x_next, pred_x0); thread pred_x0 back in as the next step's
        x0_prev. Classifier guidance applies to eps, as in the DDIM branch
        (reference diffusion.py:330-337). No reference analogue — capability
        extension.
        """
        if eps_log_var is None:
            eps_log_var = self._guided_eps(params, x_t, t, y, want_log_var=False)
        eps, _ = eps_log_var
        eps, pred_x0 = self._eps_guided_x0(params, x_t, t, y, eps)

        m = _bcast(self._dpmpp_m, t, x_t.ndim)
        m = jnp.where(first, jnp.zeros_like(m), m)
        d = (1.0 + m) * pred_x0 - m * x0_prev
        x_next = (
            _bcast(self._dpmpp_c_xt, t, x_t.ndim) * x_t
            + _bcast(self._dpmpp_c_d, t, x_t.ndim) * d
        )
        return x_next.astype(jnp.float32), pred_x0

    # ------------------------------------------------------------------
    # Full reverse chain as a single jitted scan
    # ------------------------------------------------------------------

    def _make_sampler(
        self, steps_to_do: int, progress: bool, encoder_cache: int = 0,
        gi: tuple[int, int] | None = None,
    ):
        if encoder_cache:
            return self._make_cached_sampler(
                steps_to_do, progress, int(encoder_cache), gi
            )
        want_lv = self.sampler == "ddpm"
        _tick = _make_progress_tick(steps_to_do) if progress else None

        # Static guided/unguided runs over the descending-t scan order.
        # With guidance restricted to t in [gi[0], gi[1]) the chain splits
        # into at most three contiguous segments, each its own scan whose
        # body compiles either the doubled-batch CFG call or the single
        # conditional call — the skipped forward is never traced, so the
        # saving is real compile-time structure, not a runtime branch.
        flags = [
            gi is None or (gi[0] <= t < gi[1])
            for t in range(steps_to_do - 1, -1, -1)
        ]

        # Only the multistep sampler threads pred_x0 history through the
        # carry. Keep the ddpm/ddim carry at (x, key): an extra carried
        # [B,H,W,C] buffer is not free — on the v5e chip the always-carried
        # x0_prev cost the int8 DDPM-250 chain 12% (1.546 -> 1.359
        # samples/sec; bisected to the round-3 restructure) by perturbing
        # XLA's scan buffering around the fused quantize epilogues.
        pack, unpack = self._carry_fns()

        def sampler(params, rng, x, y):
            def make_body(guided):
                def body(carry, t_scalar):
                    xc, key, x0_prev = unpack(carry)
                    key, step_key = jax.random.split(key)
                    t = jnp.full((xc.shape[0],), t_scalar, dtype=jnp.int32)
                    eps_lv = self._guided_eps(
                        params, xc, t, y, want_log_var=want_lv, guided=guided
                    )
                    xc, x0_prev = self._one_step(
                        params, xc, x0_prev, t_scalar, step_key, y, eps_lv,
                        steps_to_do, _tick,
                    )
                    return pack(xc, key, x0_prev), None
                return body

            ts = jnp.arange(steps_to_do - 1, -1, -1)
            carry = pack(x, rng, jnp.zeros_like(x))
            for start, length, guided in _runs(flags):
                carry, _ = jax.lax.scan(
                    make_body(guided), carry, ts[start:start + length]
                )
            return carry[0]

        return jax.jit(sampler)

    def _carry_fns(self):
        """(pack, unpack) for the scan carry: (x, key, x0_prev) for the
        multistep dpm++ sampler, (x, key) otherwise — see _make_sampler."""
        if self.sampler == "dpm++":
            return (lambda xc, key, x0: (xc, key, x0),
                    lambda carry: carry)
        return (lambda xc, key, x0: (xc, key),
                lambda carry: (*carry, None))

    def _one_step(self, params, xc, x0_prev, t_scalar, step_key, y, eps_lv,
                  steps_to_do, tick):
        """Apply one reverse update of the configured sampler from a
        precomputed (eps, log_var); shared by every scan body."""
        t = jnp.full((xc.shape[0],), t_scalar, dtype=jnp.int32)
        if self.sampler == "dpm++":
            xc, x0_prev = self.dpmpp_step(
                params, xc, t, x0_prev, y,
                first=t_scalar == steps_to_do - 1, eps_log_var=eps_lv,
            )
        elif self.sampler == "ddim":
            xc, _ = self.ddim_step(
                params, xc, t, step_key, y, eps_log_var=eps_lv
            )
        else:
            xc, _ = self.ddpm_step(
                params, xc, t, step_key, y, eps_log_var=eps_lv
            )
        if tick is not None:
            jax.debug.callback(tick, t_scalar, ordered=False)
        return xc, x0_prev

    def _make_cached_sampler(
        self, steps_to_do: int, progress: bool, k: int,
        gi: tuple[int, int] | None = None,
    ):
        """Sampler with encoder-feature caching ("Faster Diffusion",
        arXiv:2312.09608): the chain runs in super-steps of ``k`` — the
        first step of each group computes the encoder stack fresh, the
        remaining k-1 reuse its skip activations and bottom feature while
        the timestep embedding and decoder run at the current t. Opt-in
        and lossy (like the int8 serving path); k=1 is exactly the plain
        sampler. The tail ``steps % k`` steps (nearest t=0, the most
        quality-sensitive) always run uncached. The cache never crosses
        the scan boundary — each group rebuilds it — so the scan carry
        stays (x, key) (+ x0_prev for the multistep dpm++ sampler, see
        _carry_fns).

        ``gi=(lo, hi)`` composes limited-interval guidance: a group is
        guided iff ANY of its steps falls in [lo, hi) — the interval is
        widened outward to group boundaries (the cache batch must be
        consistent within a group), so caching never shrinks the guided
        range the user asked for."""
        assert k >= 1
        # k beyond the chain length would leave head == 0 (no caching at
        # all); clamp so the user still gets 1 refresh + k-1 cached steps
        k = min(k, steps_to_do)
        if not hasattr(self.model, "encode"):
            raise NotImplementedError(
                "encoder_cache requires a model exposing "
                "embed/encode/decode (models/unet.py DiffusionModel)"
            )
        want_lv = self.sampler == "ddpm"
        tail = steps_to_do % k
        head = steps_to_do - tail

        _tick = _make_progress_tick(steps_to_do) if progress else None

        # guided flag per group of k (scan order: highest t first). A group
        # is guided iff any of its steps lands in [lo, hi).
        def _in_gi(t):
            return gi is None or (gi[0] <= t < gi[1])

        group_flags = [
            any(_in_gi(steps_to_do - 1 - g * k - j) for j in range(k))
            for g in range(head // k)
        ]
        tail_flags = [_in_gi(t) for t in range(tail - 1, -1, -1)]

        pack, unpack = self._carry_fns()

        def sampler(params, rng, x, y):
            def make_group_body(guided):
                def group_body(carry, ts_group):
                    xc, key, x0_prev = unpack(carry)
                    cache = None
                    for j in range(k):  # python-unrolled; j==0 refreshes
                        t = jnp.full(
                            (xc.shape[0],), ts_group[j], dtype=jnp.int32
                        )
                        eps_lv, cache = self._guided_eps_cached(
                            params, xc, t, y, cache, refresh=j == 0,
                            want_log_var=want_lv, guided=guided,
                        )
                        key, step_key = jax.random.split(key)
                        xc, x0_prev = self._one_step(
                            params, xc, x0_prev, ts_group[j], step_key, y,
                            eps_lv, steps_to_do, _tick,
                        )
                    return pack(xc, key, x0_prev), None
                return group_body

            def make_plain_body(guided):
                def plain_body(carry, t_scalar):
                    xc, key, x0_prev = unpack(carry)
                    t = jnp.full((xc.shape[0],), t_scalar, dtype=jnp.int32)
                    eps_lv = self._guided_eps(
                        params, xc, t, y, want_log_var=want_lv, guided=guided
                    )
                    key, step_key = jax.random.split(key)
                    xc, x0_prev = self._one_step(
                        params, xc, x0_prev, t_scalar, step_key, y, eps_lv,
                        steps_to_do, _tick,
                    )
                    return pack(xc, key, x0_prev), None
                return plain_body

            ts = jnp.arange(steps_to_do - 1, -1, -1)
            carry = pack(x, rng, jnp.zeros_like(x))
            groups = ts[:head].reshape(head // k, k) if head else None
            for start, length, guided in _runs(group_flags):
                carry, _ = jax.lax.scan(
                    make_group_body(guided), carry,
                    groups[start:start + length],
                )
            for start, length, guided in _runs(tail_flags):
                carry, _ = jax.lax.scan(
                    make_plain_body(guided), carry,
                    ts[head + start:head + start + length],
                )
            return carry[0]

        return jax.jit(sampler)

    def denoise(
        self,
        params,
        rng,
        x=None,
        y=None,
        start_step=None,
        steps_to_do=None,
        batch_size: int = 1,
        progress: bool = False,
        encoder_cache: int | None = None,
        guidance_interval: tuple[float, float] | None = None,
    ):
        """Run the reverse chain (reference diffusion.py:155-226).

        `params` may be the live or the EMA pytree — EMA sampling is just a
        different argument (no weight swapping). Starts from N(0, I) when `x`
        is None. The whole chain is one compiled scan; the
        (steps, progress, encoder_cache, guidance_interval) tuple is
        compilation-cached. `encoder_cache=k` reuses encoder features for
        k-1 of every k steps (opt-in, lossy — see _make_cached_sampler).

        `guidance_interval=(lo, hi)` restricts classifier-free guidance to
        the chain fraction [lo, hi) — 0.0 is the clean end (t=0), 1.0 the
        noise end (t=T). Outside the interval the step runs ONE conditional
        model call instead of the doubled CFG batch, so e.g. (0.0, 0.6)
        costs 0.6*2 + 0.4*1 = 1.6 forwards/step instead of 2 (1.25x).
        Opt-in and lossy vs the always-guided chain; limited-interval
        guidance is quality-positive at matched strength in the literature
        (Kynkäänniemi et al. 2024, arXiv:2404.07724). No reference
        analogue — capability extension.
        """
        if self.model.conditional:
            assert y is not None, "pass label iff model is class-conditional"
        else:
            assert y is None, "pass label iff model is class-conditional"

        if encoder_cache is not None and encoder_cache < 1:
            raise ValueError(
                f"encoder_cache must be >= 1 (got {encoder_cache}); k=1 is "
                "the exact uncached sampler, k>1 reuses encoder features "
                "for k-1 of every k steps"
            )

        if start_step is None:
            start_step = self.rescaled_num_steps
        if steps_to_do is None or steps_to_do > start_step:
            steps_to_do = start_step

        gi = None
        if guidance_interval is not None:
            if self.guidance != "classifier_free":
                raise ValueError(
                    "guidance_interval requires classifier-free guidance "
                    f"(this Diffusion uses {self.guidance!r})"
                )
            lo, hi = guidance_interval
            if not (0.0 <= lo < hi <= 1.0):
                raise ValueError(
                    f"guidance_interval must satisfy 0 <= lo < hi <= 1 "
                    f"(got {guidance_interval})"
                )
            # fractions of the executed chain -> rescaled step bounds;
            # guided iff lo_step <= t < hi_step
            gi = (round(lo * steps_to_do), round(hi * steps_to_do))
            if gi == (0, steps_to_do):  # covers everything: exact sampler
                gi = None

        if x is None:
            assert start_step == self.rescaled_num_steps, (
                "cannot start from noise with current step that is not T"
            )
            rng, init_rng = jax.random.split(rng)
            x = jax.random.normal(
                init_rng,
                (batch_size, self.model.resolution, self.model.resolution,
                 self.model.in_channels),
                dtype=jnp.float32,
            )
        if y is not None:
            assert y.shape[0] == x.shape[0], "len(labels) != batch size"

        key = (int(steps_to_do), bool(progress), int(encoder_cache or 0), gi)
        if key not in self._sampler_cache:
            self._sampler_cache[key] = self._make_sampler(*key)
        return self._sampler_cache[key](params, rng, x, y)

    # ------------------------------------------------------------------
    # Training losses
    # ------------------------------------------------------------------

    def loss(self, params, x_0, t, rng, y=None, noise=None, dropout_rng=None):
        """Training loss in bits/dim (reference diffusion.py:375-410).

        SIMPLE: mean MSE(eps_pred, noise). KL / KL_RESCALED: VLB term
        (x rescaled_num_steps). HYBRID: L_simple + 0.001 * L_vlb with the VLB
        epsilon stop-gradiented so it only trains the variances (IDDPM eq. 16).
        """
        if noise is None:
            rng, noise_rng = jax.random.split(rng)
            noise = jax.random.normal(noise_rng, x_0.shape, dtype=x_0.dtype)

        x_t = self.q_sample(x_0, t, noise)

        mapped = jnp.take(self.timestep_map, t)
        kwargs = dict(self.model_kwargs)
        if self.model.conditional:
            kwargs["y"] = y
        apply_kwargs = {}
        if dropout_rng is not None:
            apply_kwargs = {"rngs": {"dropout": dropout_rng},
                            "deterministic": False}
        out = self.model.apply({"params": params}, x_t, mapped, **kwargs,
                               **apply_kwargs)
        pred, raw = self._split_out(out)
        log_var = self._resolve_log_var(raw, t, x_t.ndim)

        # SIMPLE regresses the model's NATIVE target ('eps': the noise;
        # 'v': alpha*noise - sigma*x_0 — regressing converted eps instead
        # would re-weight the loss by alpha_t^2 and lose the point of the
        # v-parameterisation); the VLB always consumes epsilon.
        if self.prediction_type == "v":
            a = _bcast(self._sqrt_acp, t, x_t.ndim)
            s = _bcast(self._sqrt_1macp, t, x_t.ndim)
            target = a * noise - s * x_0
        else:
            target = noise
        eps_pred = self._to_eps(pred, x_t, t)

        if self.loss_type == LossType.SIMPLE:
            return mean_flat((pred - target) ** 2)
        elif self.loss_type in (LossType.KL, LossType.KL_RESCALED):
            loss = self.variational_lower_bound(x_0, x_t, t, eps_pred, log_var)
            if self.loss_type == LossType.KL_RESCALED:
                loss = loss * self.rescaled_num_steps
            return loss
        else:  # HYBRID
            loss_simple = mean_flat((pred - target) ** 2)
            eps_detached = jax.lax.stop_gradient(eps_pred)
            loss_vlb = (
                self.variational_lower_bound(x_0, x_t, t, eps_detached, log_var)
                * self.rescaled_num_steps
            )
            return loss_simple + 0.001 * loss_vlb

    # ------------------------------------------------------------------
    # Evaluation: full-chain variational bound (bits/dim)
    # ------------------------------------------------------------------

    def bpd(self, params, x_0, rng, y=None):
        """Full-chain NLL upper bound in bits/dim for a batch of images.

        TPU-native analogue of IDDPM's calc_bpd_loop: one jitted scan over
        every rescaled timestep computes the per-t VLB term (KL for t>0,
        discretized NLL at t==0) on a fresh q-sample of x_t, plus the prior
        term KL(q(x_T | x_0) || N(0, I)). The reference has no evaluation
        metrics at all ("add proper evaluation metrics" is an explicit TODO,
        reference README.md:65) — capability extension.

        Returns a dict: total_bpd [B], prior_bpd [B], vlb_terms [T, B],
        mse_terms [T, B] (per-t eps MSE, useful for diagnosing schedules).
        The [T, B] profiles are in natural timestep order: row i is
        rescaled timestep t == i. x_0 is NHWC in [-1, 1]; y as in loss().
        """
        if "bpd" in self._sampler_cache:
            return self._sampler_cache["bpd"](params, x_0, rng, y)

        @jax.jit
        def run(params, x_0, rng, y):
            def body(key, t_scalar):
                key, nkey = jax.random.split(key)
                t = jnp.full((x_0.shape[0],), t_scalar, dtype=jnp.int32)
                noise = jax.random.normal(nkey, x_0.shape, dtype=x_0.dtype)
                x_t = self.q_sample(x_0, t, noise)
                eps_pred, log_var = self.get_eps_and_log_var(
                    params, x_t, t, y
                )
                vlb = self.variational_lower_bound(
                    x_0, x_t, t, eps_pred, log_var
                )
                mse = mean_flat((eps_pred - noise) ** 2)
                return key, (vlb, mse)

            ts = jnp.arange(self.rescaled_num_steps - 1, -1, -1)
            _, (vlb_terms, mse_terms) = jax.lax.scan(body, rng, ts)
            # scan visited t = T-1..0; flip to natural order (row i = t = i)
            vlb_terms = vlb_terms[::-1]
            mse_terms = mse_terms[::-1]

            # prior: KL( N(sqrt(acp_T) x0, (1 - acp_T) I) || N(0, I) )
            t_last = jnp.full(
                (x_0.shape[0],), self.rescaled_num_steps - 1, dtype=jnp.int32
            )
            mean_T = _bcast(self._sqrt_acp, t_last, x_0.ndim) * x_0
            log_var_T = jnp.broadcast_to(
                jnp.log1p(-_bcast(self._acp, t_last, x_0.ndim)), x_0.shape
            )
            prior = kl_div(
                mean_T, log_var_T, jnp.zeros_like(mean_T),
                jnp.zeros_like(log_var_T),
            )
            prior_bpd = mean_flat(prior) / np.log(2.0)

            return {
                "total_bpd": jnp.sum(vlb_terms, axis=0) + prior_bpd,
                "prior_bpd": prior_bpd,
                "vlb_terms": vlb_terms,
                "mse_terms": mse_terms,
            }

        self._sampler_cache["bpd"] = run
        return run(params, x_0, rng, y)

    def variational_lower_bound(self, x_0, x_t, t, eps_pred, log_var):
        """Per-t VLB term in bits/dim (reference diffusion.py:412-438)."""
        true_mean = (
            _bcast(self._post_coef_x0, t, x_0.ndim) * x_0
            + _bcast(self._post_coef_xt, t, x_t.ndim) * x_t
        )
        true_log_var = jnp.broadcast_to(
            _bcast(self._log_post_var, t, x_0.ndim), x_0.shape
        )

        pred_x0 = (
            _bcast(self._sqrt_recip_acp, t, x_t.ndim) * x_t
            - _bcast(self._sqrt_recipm1_acp, t, x_t.ndim) * eps_pred
        )
        mean = (
            _bcast(self._post_coef_x0, t, x_t.ndim) * pred_x0
            + _bcast(self._post_coef_xt, t, x_t.ndim) * x_t
        )

        log_var = jnp.broadcast_to(log_var, x_0.shape)
        kl = kl_div(true_mean, true_log_var, mean, log_var)
        kl = mean_flat(kl) / np.log(2.0)

        nll = -discretized_gaussian_log_likelihood(x_0, mean, log_var)
        nll = mean_flat(nll) / np.log(2.0)

        return jnp.where(t == 0, nll, kl)
