"""Distillation for fast serving: guided (stage 1) + progressive (stage 2).

`GuidedDistiller` bakes classifier-free guidance into a single-forward
student (Meng et al., arXiv:2210.03142) — removing the 2x CFG cost per
step; `ProgressiveDistiller` then halves sampling steps by training a
student to match two teacher DDIM steps (Salimans & Ho, arXiv:2202.00512).

Capability extension with no reference analogue (the reference has no
fast-sampling story at all); complements the exact DPM-Solver++ sampler:
distillation trades a short training run for a permanent 2x (per round)
reduction in sampling steps at matched quality.

TPU-native shape: the whole distillation step — q-sample, two teacher DDIM
steps, implied one-step target, student x0-prediction, truncated-SNR loss,
AdamW update, EMA — is one jitted, donated XLA program; the teacher/student
grids are nested exactly (the student keeps the teacher's odd rescaled
indices via DiffusionSchedule(timestep_indices=...), so both share
alphas_cumprod values and the original-chain timestep embedding space,
letting the student initialise from the teacher's weights).

Math (eps-parameterisation, teacher eta=0): for student step j the teacher
runs rescaled steps t1 = 2j+1 then 2j, landing at the boundary with
alpha'' = sqrt(acp_prev[2j]), sigma'' = sqrt(1 - acp_prev[2j]). The
one-step target the student must hit is

    x~0 = (z'' - (sigma''/sigma_t) z_t) / (alpha'' - (sigma''/sigma_t) alpha_t)

(the x0 a single DDIM step from t1 to the boundary would need to produce
z''; eq. 7 of the paper). At j = 0 the boundary is alpha''=1, sigma''=0
and x~0 = z'' exactly.

Loss conditioning (``loss_space``): the paper's truncated-SNR x0-space
loss w * ||x^0_s - x~0||^2 with w = max(alpha^2/sigma^2, 1) (App. E) is
designed for x/v-parameterised students. For the EPS-parameterised
students used here it is algebraically max(1, sigma^2/alpha^2) *
||eps_s - eps_target||^2 — an eps-space gradient amplifier that reaches
4.1e5 at the top of a 250-step cosine grid (16 of 250 grid points exceed
100x), which measurably destabilised an 8000-step guided-distillation run
(loss spike 1.34 -> 4.14; BASELINE.md round 4). Gradients are now
globally norm-clipped (``grad_clip``, default 1.0), and the default loss
space differs per stage, each choice measured on the quality harness
(BASELINE.md round-4 quality table):

- ``GuidedDistiller``: ``"eps"`` — stage 1 matches the guided teacher's
  output on the SAME grid, and plain eps-MSE converges to ~3e-5 where the
  x0_snr run diverged.
- ``ProgressiveDistiller``: ``"x0_snr"`` — step-halving must be accurate
  where image structure forms (high t, low SNR); the eps weighting
  measurably worsened the distilled student's Fréchet (596 vs 277 at the
  2000-step harness budget), so the paper weighting stays, stabilised by
  the clip.

Both spaces share the same minimiser per (z, j) and both remain available
on either class.

v-parameterised students (``student_prediction_type="v"``): the student's
Diffusion is built with ``prediction_type="v"`` (diffusion/process.py
converts v -> eps once at the model boundary), which is the Salimans & Ho
App.-D recipe for few-step/distilled models. Both distillers stay
parameterisation-agnostic because the loss compares epsilons: for a
v student, eps_s - eps_t = alpha * (v_s - v_t) at fixed z, so the
``x0_snr`` loss max(1, s^2/a^2) * ||Δeps||^2 becomes
max(a^2, s^2) * ||Δv||^2 — the paper's well-conditioned bounded weighting
(in [1/2, 1]) falls out algebraically, which is why ``loss_space`` defaults
to ``"x0_snr"`` whenever the student is v-parameterised. The natural
pipeline is: stage 1 with ``student_prediction_type="v"`` (bakes guidance
AND reparameterises in one same-grid distillation), then stage 2 with
``prediction_type="v"`` in diffusion_args (teacher and student both v,
exact initialisation).

Variance-head distillation (``var_weight``): by default the halving loss
trains only the eps/v head, so halved students could not sample
stochastically (DDPM needs the learned variance; measured Fréchet 715 vs
340 with the stale inherited head, BASELINE.md round 4). With
``var_weight`` set:

- ``GuidedDistiller`` pins the student's resolved log-variance to the
  teacher's (same grid, so the teacher's variance IS the target; Meng et
  al. 2210.03142 distill learned-variance models this way) — keeping the
  head valid as the shared trunk drifts during training.
- ``ProgressiveDistiller`` trains the student's log-variance with the
  IDDPM VLB term evaluated on the STUDENT's own halved grid with the eps
  prediction stop-gradiented (exactly the hybrid-loss variance channel,
  IDDPM eq. 16, but on the student chain) — the likelihood-optimal
  variance for one student step, learned from data rather than composed
  teacher moments.
"""

from __future__ import annotations

from typing import Any, Iterator

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.process import Diffusion

__all__ = [
    "DistillState",
    "GuidedDistiller",
    "ProgressiveDistiller",
    "make_student_diffusion",
]

# Force one tiny device->host fetch every N training steps. Without it the
# host dispatches the whole run ahead of the device and every queued call
# pins its serialized arguments — through the axon relay an 8000-step
# ProgressiveDistiller run grew to 130 GB host RSS and was OOM-killed
# (observed 2026-08-19). One int fetch per 32 steps bounds the queue at a
# negligible throughput cost.
_DISPATCH_SYNC = 32


class DistillState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any


def _make_optimizer(
    lr: float,
    weight_decay: float,
    iterations: int,
    grad_clip: float | None,
    lr_schedule: str,
):
    """AdamW with optional global-norm clipping and warmup-cosine decay.

    ``lr_schedule="constant"`` keeps the flat rate; ``"warmup_cosine"``
    ramps linearly to ``lr`` then cosine-decays to 0.1*lr over the run —
    the recipe used for real distillation budgets (tools/quality_eval.py)."""
    if lr_schedule == "warmup_cosine":
        warmup = min(200, max(iterations // 20, 1))
        rate = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup,
            decay_steps=max(iterations, warmup + 1), end_value=0.1 * lr,
        )
    elif lr_schedule == "constant":
        rate = lr
    else:
        raise ValueError(
            f"unknown lr_schedule {lr_schedule!r} (constant | warmup_cosine)"
        )
    tx = optax.adamw(rate, b1=0.9, b2=0.999, weight_decay=weight_decay)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def _distill_loss(loss_space: str, eps_s, eps_target, a, s):
    """MSE between student and target epsilon in the chosen space.

    "eps": uniform-weight epsilon MSE (well-conditioned for the
    eps-parameterised students here). "x0_snr": the paper's truncated-SNR
    x0-space loss, equal to max(1, s^2/a^2) * eps-MSE per sample."""
    if loss_space == "eps":
        return jnp.mean((eps_s - eps_target) ** 2)
    if loss_space == "x0_snr":
        w = jnp.maximum(a**2 / s**2, 1.0)  # truncated SNR (App. E)
        x0_s = -(s / a) * eps_s  # offsets cancel in the difference
        x0_t = -(s / a) * eps_target
        return jnp.mean(w * (x0_s - x0_t) ** 2)
    raise ValueError(f"unknown loss_space {loss_space!r} (eps | x0_snr)")


def make_student_diffusion(model, diffusion_args: dict, teacher: Diffusion,
                           prediction_type: str | None = None):
    """Student Diffusion on the teacher's odd rescaled indices (exact
    nesting: student acp[j] == teacher acp[2j+1]). ``prediction_type``
    overrides the teacher's output convention for the student (e.g. an
    eps teacher distilled into a v student)."""
    n = teacher.rescaled_num_steps
    assert n % 2 == 0, f"teacher steps must be even to halve, got {n}"
    student_indices = np.asarray(teacher.timestep_map)[1::2]
    args = dict(diffusion_args)
    args.update(
        rescaled_num_steps=n // 2,
        guidance_method=None,
        guidance_strength=None,
        use_ddim=True,
        ddim_eta=0.0,
        timestep_indices=student_indices,
    )
    if prediction_type is not None:
        args.update(prediction_type=prediction_type)
    return Diffusion(model=model, **args)


class GuidedDistiller:
    """Stage-1 guided distillation (Meng et al., arXiv:2210.03142 §3.1):
    train a SINGLE-forward conditional student to match the classifier-
    free-guided teacher — the fused doubled-batch call plus CFG combine at
    strength ``guidance_strength`` — on the same timestep grid.

    This is the structural fix for the 2x CFG serving cost: the returned
    student samples **unguided** (one model forward per step, guidance
    baked into the weights) and is drop-in for EVERY sampler including
    stochastic DDPM — the timestep grid is unchanged, so the teacher's
    learned-variance head (untouched by the eps-only loss) stays valid at
    every grid point. It is also the correct teacher for
    `ProgressiveDistiller` — whose guidance-stripping (previously a
    documented quality loss, tools/quality_eval.py distill row) becomes
    exact once guidance lives in the weights.

    Loss: MSE against the guided teacher's epsilon at a uniformly drawn
    rescaled step (``loss_space="eps"`` default — see the module docstring
    for why the paper's truncated-SNR x0 weighting, kept as
    ``loss_space="x0_snr"``, destabilises eps-parameterised students).
    The student initialises from the teacher.
    """

    def __init__(
        self,
        model,
        teacher_params,
        diffusion_args: dict,
        dataloader: Iterator,
        iterations: int,
        guidance_strength: float,
        lr: float = 1e-4,
        weight_decay: float = 0.0,
        ema_rate: float = 0.9999,
        seed: int = 0,
        loss_space: str | None = None,
        grad_clip: float | None = 1.0,
        lr_schedule: str = "constant",
        student_prediction_type: str | None = None,
        var_weight: float | None = None,
    ):
        assert model.conditional, (
            "guided distillation needs a class-conditional model "
            "(the CFG teacher calls the null class internally)"
        )
        # Unlike stage 2, stage 1 keeps the teacher's timestep grid, so the
        # teacher's learned-variance head stays exactly valid at every grid
        # point — the student inherits the sampler configuration from
        # diffusion_args (including stochastic DDPM) instead of being
        # forced onto DDIM. Only the guidance is stripped: it lives in the
        # weights after distillation.
        t_args = dict(diffusion_args)
        t_args.update(
            guidance_method="classifier_free",
            guidance_strength=guidance_strength,
        )
        s_args = dict(diffusion_args)
        s_args.update(guidance_method=None, guidance_strength=None)
        if student_prediction_type is not None:
            # same-grid reparameterisation (e.g. eps teacher -> v student,
            # Salimans & Ho App. D): bake guidance and convert the output
            # convention in one distillation pass. The eps-space target is
            # unchanged — only the student's native head differs.
            s_args.update(prediction_type=student_prediction_type)
        self.model = model
        self.teacher = Diffusion(model=model, **t_args)
        self.student = Diffusion(model=model, **s_args)
        # device-resident: numpy teacher params (e.g. restored from a
        # msgpack/npz checkpoint) would be re-serialized and re-shipped
        # through the TPU relay on EVERY jitted step — measured ~10x
        # slowdown with unbounded host RSS growth (2026-08-20)
        self.teacher_params = jax.tree.map(jnp.asarray, teacher_params)
        self.loader = dataloader
        self.iterations = iterations
        self.rng = jax.random.PRNGKey(seed)

        if loss_space is None:
            # v students need the bounded max(a^2, s^2) v-space weighting
            # (module docstring); plain eps-MSE would downweight high t by
            # a^2 exactly where image structure forms.
            loss_space = (
                "x0_snr" if self.student.prediction_type == "v" else "eps"
            )
        self.loss_space = loss_space
        # var_weight: pin the student's resolved log-variance to the guided
        # teacher's (stage 1 shares the teacher's grid, so the teacher's
        # variance is exactly the right target at every grid point)
        self.var_weight = var_weight
        self.optimizer = _make_optimizer(
            lr, weight_decay, iterations, grad_clip, lr_schedule
        )
        self.ema_rate = ema_rate
        params = jax.tree.map(lambda p: jnp.array(p), teacher_params)
        self.state = DistillState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            ema_params=jax.tree.map(jnp.copy, params),
        )
        self._step_fn = self._build_step()

    def _build_step(self):
        def loss_fn(params, teacher_params, x0, y, j, noise):
            z = self.student.q_sample(x0, j, noise)
            nd = z.ndim
            a = jnp.sqrt(
                jnp.take(self.teacher._acp, j)
            ).reshape((-1,) + (1,) * (nd - 1))
            s = jnp.sqrt(
                1 - jnp.take(self.teacher._acp, j)
            ).reshape((-1,) + (1,) * (nd - 1))

            want_lv = self.var_weight is not None
            eps_t, lv_t = self.teacher._guided_eps(
                teacher_params, z, j, y, want_log_var=want_lv
            )
            eps_t = jax.lax.stop_gradient(eps_t)

            eps_s, lv_s = self.student._guided_eps(
                params, z, j, y, want_log_var=want_lv
            )
            loss_eps = _distill_loss(self.loss_space, eps_s, eps_t, a, s)
            loss_var = jnp.zeros(())
            if want_lv:
                # variance distillation: same grid, so the guided teacher's
                # resolved log-variance is the exact target (2210.03142)
                loss_var = self.var_weight * jnp.mean(
                    (lv_s - jax.lax.stop_gradient(lv_t)) ** 2
                )
            return loss_eps + loss_var, (loss_eps, loss_var)

        def step(state: DistillState, teacher_params, batch, labels, rng):
            j_rng, n_rng = jax.random.split(rng)
            j = jax.random.randint(
                j_rng, (batch.shape[0],), 0,
                self.student.rescaled_num_steps,
            )
            noise = jax.random.normal(n_rng, batch.shape, dtype=batch.dtype)
            (loss, (l_eps, l_var)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, teacher_params, batch, labels, j, noise)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            r = self.ema_rate
            ema = jax.tree.map(
                lambda e, p: r * e + (1 - r) * p, state.ema_params, params
            )
            return (
                DistillState(state.step + 1, params, opt_state, ema),
                {"loss": loss, "loss_eps": l_eps, "loss_var": l_var,
                 "grad_norm": optax.global_norm(grads)},
            )

        return jax.jit(step, donate_argnums=(0,))

    def run(self, log_every: int | None = None):
        """Train; returns (student_params, student_diffusion). Same
        live-params (not EMA) convention as ProgressiveDistiller.run."""
        for it in range(self.iterations):
            batch, labels = next(self.loader)
            batch = jnp.asarray(batch)
            assert labels is not None, "guided distillation needs labels"
            labels = jnp.asarray(labels)
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, metrics = self._step_fn(
                self.state, self.teacher_params, batch, labels, step_rng
            )
            if (it + 1) % _DISPATCH_SYNC == 0:
                int(self.state.step)  # bound the async dispatch queue
            if log_every and (it + 1) % log_every == 0:
                var_part = (
                    f" (eps={float(metrics['loss_eps']):.5f}"
                    f" var={float(metrics['loss_var']):.5f})"
                    if self.var_weight is not None else ""
                )
                print(
                    f"guided-distill step {it + 1}/{self.iterations}: "
                    f"loss={float(metrics['loss']):.5f}{var_part} "
                    f"gnorm={float(metrics['grad_norm']):.3f}"
                )
        return self.state.params, self.student


class ProgressiveDistiller:
    """Distills `model` from `teacher_params` at N steps down to N/2 (one
    `run()` = one halving round; chain rounds by re-instantiating with the
    returned student as the new teacher — see scripts/distill.py)."""

    def __init__(
        self,
        model,
        teacher_params,
        diffusion_args: dict,
        dataloader: Iterator,
        iterations: int,
        lr: float = 1e-4,
        weight_decay: float = 0.0,
        ema_rate: float = 0.9999,
        seed: int = 0,
        loss_space: str | None = None,
        grad_clip: float | None = 1.0,
        lr_schedule: str = "constant",
        student_prediction_type: str | None = None,
        var_weight: float | None = None,
    ):
        args = dict(diffusion_args)
        args.update(guidance_method=None, guidance_strength=None,
                    use_ddim=True, ddim_eta=0.0)
        self.model = model
        self.teacher = Diffusion(model=model, **args)
        self.student = make_student_diffusion(
            model, diffusion_args, self.teacher,
            prediction_type=student_prediction_type,
        )
        # device-resident (same relay re-shipping hazard as GuidedDistiller)
        self.teacher_params = jax.tree.map(jnp.asarray, teacher_params)
        self.loader = dataloader
        self.iterations = iterations
        self.rng = jax.random.PRNGKey(seed)

        # None -> the stage-2 measured optimum (x0_snr — the halving must
        # be accurate where image structure forms; module docstring), which
        # is also the bounded v-space weighting for v students.
        self.loss_space = "x0_snr" if loss_space is None else loss_space
        # var_weight: train the student's log-variance head with the IDDPM
        # VLB term on the student's own halved grid (eps stop-gradiented,
        # exactly the hybrid-loss variance channel) so halved students can
        # sample stochastic DDPM — without it the head is inherited stale
        # from the teacher (measured non-viable, BASELINE.md round 4).
        self.var_weight = var_weight
        self.optimizer = _make_optimizer(
            lr, weight_decay, iterations, grad_clip, lr_schedule
        )
        self.ema_rate = ema_rate
        # student initialises FROM the teacher (paper §2). Real copies, not
        # views: the step donates the student state while the teacher
        # params stay a live argument (aliased buffers would trip XLA's
        # donation check)
        params = jax.tree.map(lambda p: jnp.array(p), teacher_params)
        self.state = DistillState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            ema_params=jax.tree.map(jnp.copy, params),
        )
        self._step_fn = self._build_step()

    # -- distillation target ------------------------------------------------

    def _target_x0(self, teacher_params, z, j, y):
        """Two teacher DDIM steps from rescaled index t1 = 2j+1, then the
        implied one-step x0 target."""
        t1 = 2 * j + 1
        t2 = 2 * j
        zero = jnp.zeros_like(z)
        z1, _ = self.teacher.ddim_step(teacher_params, z, t1, y=y, noise=zero)
        z2, _ = self.teacher.ddim_step(teacher_params, z1, t2, y=y, noise=zero)

        nd = z.ndim
        acp_t = self.teacher._acp
        acp_pp = self.teacher._acp_prev
        a_t = jnp.sqrt(jnp.take(acp_t, t1)).reshape((-1,) + (1,) * (nd - 1))
        s_t = jnp.sqrt(1 - jnp.take(acp_t, t1)).reshape((-1,) + (1,) * (nd - 1))
        a_b = jnp.sqrt(jnp.take(acp_pp, t2)).reshape((-1,) + (1,) * (nd - 1))
        s_b = jnp.sqrt(1 - jnp.take(acp_pp, t2)).reshape((-1,) + (1,) * (nd - 1))
        ratio = s_b / s_t
        return (z2 - ratio * z) / (a_b - ratio * a_t), (a_t, s_t)

    # -- jitted step --------------------------------------------------------

    def _build_step(self):
        def loss_fn(params, teacher_params, x0, y, j, noise):
            # q-sample at the student's grid point j (== teacher 2j+1)
            z = self.student.q_sample(x0, j, noise)
            target, (a_t, s_t) = self._target_x0(
                teacher_params, z, j, y
            )
            # the epsilon a student must predict for its one DDIM step to
            # land where the teacher's two did: x~0 = (z - s*eps)/a inverted
            eps_t = jax.lax.stop_gradient((z - a_t * target) / s_t)

            want_lv = self.var_weight is not None
            eps_s, lv_s = self.student._guided_eps(
                params, z, j, y, want_log_var=want_lv
            )
            loss_eps = _distill_loss(self.loss_space, eps_s, eps_t, a_t, s_t)
            loss_var = jnp.zeros(())
            if want_lv:
                # variance head: likelihood-optimal log-variance for ONE
                # student step, via the VLB on the student's halved grid
                # with the distillation-trained eps stopped (IDDPM eq. 16
                # structure; mean over batch, bits/dim scale)
                vlb = self.student.variational_lower_bound(
                    x0, z, j, jax.lax.stop_gradient(eps_s), lv_s
                )
                loss_var = self.var_weight * jnp.mean(vlb)
            return loss_eps + loss_var, (loss_eps, loss_var)

        def step(state: DistillState, teacher_params, batch, labels, rng):
            j_rng, n_rng = jax.random.split(rng)
            j = jax.random.randint(
                j_rng, (batch.shape[0],), 0,
                self.student.rescaled_num_steps,
            )
            noise = jax.random.normal(n_rng, batch.shape, dtype=batch.dtype)
            (loss, (l_eps, l_var)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, teacher_params, batch, labels, j, noise)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            r = self.ema_rate
            ema = jax.tree.map(
                lambda e, p: r * e + (1 - r) * p, state.ema_params, params
            )
            return (
                DistillState(state.step + 1, params, opt_state, ema),
                {"loss": loss, "loss_eps": l_eps, "loss_var": l_var,
                 "grad_norm": optax.global_norm(grads)},
            )

        return jax.jit(step, donate_argnums=(0,))

    def run(self, log_every: int | None = None):
        """One halving round; returns (student_params, student_diffusion).

        Returns the live optimised params, NOT the EMA copy: at typical
        distillation budgets (10^3-10^4 steps) a 0.9999-decay EMA still
        carries most of its weight on the teacher initialisation
        (0.9999^2000 = 0.82), which would silently discard the round's
        training. The EMA remains available as `self.state.ema_params`
        for long runs where it has converged.
        """
        for it in range(self.iterations):
            batch, labels = next(self.loader)
            batch = jnp.asarray(batch)
            labels = jnp.asarray(labels) if (
                labels is not None and self.model.conditional
            ) else None
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, metrics = self._step_fn(
                self.state, self.teacher_params, batch, labels, step_rng
            )
            if (it + 1) % _DISPATCH_SYNC == 0:
                int(self.state.step)  # bound the async dispatch queue
            if log_every and (it + 1) % log_every == 0:
                var_part = (
                    f" (eps={float(metrics['loss_eps']):.5f}"
                    f" var={float(metrics['loss_var']):.5f})"
                    if self.var_weight is not None else ""
                )
                print(
                    f"distill step {it + 1}/{self.iterations}: "
                    f"loss={float(metrics['loss']):.5f}{var_part} "
                    f"gnorm={float(metrics['grad_norm']):.3f}"
                )
        return self.state.params, self.student
