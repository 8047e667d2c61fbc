"""Progressive distillation tests (training/distill.py; Salimans & Ho
2202.00512 — capability extension, no reference analogue): exact grid
nesting, the implied one-step target against the delta-data closed form,
a full halving round on a tiny UNet (loss decreases, student samples at
N/2), and CLI plumbing for faithful distilled-grid sampling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nicediffusion_tpu.diffusion.process import Diffusion
from nicediffusion_tpu.models.unet import DiffusionModel
from nicediffusion_tpu.training.distill import (
    ProgressiveDistiller,
    make_student_diffusion,
)

from test_dpmpp import DeltaOracle, _original_acp

TINY = dict(
    resolution=8, in_channels=1, model_channels=32, out_channels=1,
    num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2),
    num_heads=2, num_classes=None, dropout=0.0, resblock_updown=True,
    use_adaptive_gn=True, split_qkv_first=True,
)

# 160/16 divides evenly: eq.-19 yields exactly 16 kept indices (the
# reference's respacing can return a different count otherwise, e.g.
# 200/16 -> 17)
DARGS = dict(
    original_num_steps=160, rescaled_num_steps=16,
    sampling_var_type="small", loss_type="simple", beta_schedule="cosine",
)


def test_student_grid_nests_in_teacher():
    teacher = Diffusion(model=None, **DARGS, use_ddim=True, ddim_eta=0.0)
    student = make_student_diffusion(None, DARGS, teacher)
    assert student.rescaled_num_steps == 8
    t_map = np.asarray(teacher.timestep_map)
    s_map = np.asarray(student.timestep_map)
    np.testing.assert_array_equal(s_map, t_map[1::2])
    # shared alphas_cumprod at the nested points
    np.testing.assert_allclose(
        np.asarray(student._acp), np.asarray(teacher._acp)[1::2], rtol=1e-6
    )
    # student boundary j -> teacher acp_prev[2j]
    np.testing.assert_allclose(
        np.asarray(student._acp_prev),
        np.asarray(teacher._acp_prev)[0::2], rtol=1e-6
    )


def test_target_is_mu_for_delta_teacher():
    """For delta data the teacher's 2-step DDIM is exact, so the implied
    one-step target must be exactly mu at every step index."""
    probe = Diffusion(model=None, **DARGS, use_ddim=True, ddim_eta=0.0)
    mu = 0.4 * jnp.ones((1, 8, 8, 1), dtype=jnp.float32)
    oracle = DeltaOracle(mu, _original_acp(probe))

    def loader():
        while True:
            yield np.zeros((4, 8, 8, 1), np.float32), None

    distiller = ProgressiveDistiller(
        model=oracle, teacher_params={"w": jnp.zeros(1)},
        diffusion_args=DARGS, dataloader=loader(), iterations=0,
    )
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 1))
    for jj in (0, 3, 7):
        j = jnp.full((4,), jj, dtype=jnp.int32)
        target, _ = distiller._target_x0({"w": jnp.zeros(1)}, z, j, None)
        np.testing.assert_allclose(
            np.asarray(target), np.broadcast_to(np.asarray(mu), z.shape),
            atol=1e-4, err_msg=f"j={jj}",
        )


@pytest.mark.slow
def test_distillation_round_end_to_end():
    model = DiffusionModel(**TINY)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)),
        jnp.zeros((1,), jnp.int32),
    )["params"]

    rng = np.random.default_rng(0)
    data = (0.6 * np.sin(
        np.linspace(0, 3, 8)[None, :, None, None]
        + rng.uniform(0, 6, size=(64, 1, 1, 1))
    )).astype(np.float32) * np.ones((1, 1, 8, 1), np.float32)

    def loader():
        while True:
            idx = rng.integers(0, 64, size=(8,))
            yield data[idx], None

    distiller = ProgressiveDistiller(
        model=model, teacher_params=params, diffusion_args=DARGS,
        dataloader=loader(), iterations=30, lr=3e-4, seed=1,
    )
    losses = []
    orig_step = distiller._step_fn

    def tracked(*a):
        s, m = orig_step(*a)
        losses.append(float(m["loss"]))
        return s, m

    distiller._step_fn = tracked
    student_params, student = distiller.run()
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])

    out = student.denoise(student_params, jax.random.PRNGKey(2), batch_size=2)
    assert out.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_second_round_teacher_keeps_student_grid():
    """Round r+1's teacher must sample on round r's student grid (an even
    re-respacing at N/2 lands on different timesteps — regression for the
    multi-round grid mismatch)."""
    teacher1 = Diffusion(model=None, **DARGS, use_ddim=True, ddim_eta=0.0)
    student1 = make_student_diffusion(None, DARGS, teacher1)
    # what scripts/distill.py now builds for round 2
    args2 = dict(
        DARGS, rescaled_num_steps=student1.rescaled_num_steps,
        timestep_indices=np.asarray(student1.timestep_map),
    )
    teacher2 = Diffusion(model=None, **args2, use_ddim=True, ddim_eta=0.0)
    np.testing.assert_array_equal(
        np.asarray(teacher2.timestep_map), np.asarray(student1.timestep_map)
    )
    # and the wrong (even) respacing really is a different grid
    wrong = Diffusion(
        model=None,
        **dict(DARGS, rescaled_num_steps=student1.rescaled_num_steps),
        use_ddim=True, ddim_eta=0.0,
    )
    assert not np.array_equal(
        np.asarray(wrong.timestep_map), np.asarray(student1.timestep_map)
    )
    # round-2 student nests again
    student2 = make_student_diffusion(None, args2, teacher2)
    np.testing.assert_array_equal(
        np.asarray(student2.timestep_map),
        np.asarray(student1.timestep_map)[1::2],
    )


def test_odd_teacher_steps_rejected():
    args = dict(DARGS, original_num_steps=90, rescaled_num_steps=9)
    teacher = Diffusion(model=None, **args, use_ddim=True, ddim_eta=0.0)
    with pytest.raises(AssertionError):
        make_student_diffusion(None, args, teacher)


def test_cli_timestep_indices_flag():
    from nicediffusion_tpu.utils.cli import get_dicts_from_args, make_argparser

    parser = make_argparser("diff_sample")
    args = parser.parse_args(
        ["--model_path", "64x64_diffusion.pt", "--batch_size", "2",
         "--num_samples", "1", "--timestep_indices", "60/140/220/300"]
    )
    _, _, d = get_dicts_from_args(args)
    assert d["timestep_indices"] == [60, 140, 220, 300]
    diff = Diffusion(model=None, **{
        k: v for k, v in d.items() if k != "classifier"
    })
    assert diff.rescaled_num_steps == 4
    np.testing.assert_array_equal(
        np.asarray(diff.timestep_map), [60, 140, 220, 300]
    )


# ---------------------------------------------------------------------------
# Stage-1 guided distillation (Meng et al. 2210.03142; GuidedDistiller)
# ---------------------------------------------------------------------------

TINY_COND = dict(TINY, num_classes=5)


def _cond_setup(seed=0):
    model = DiffusionModel(**TINY_COND)
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 8, 8, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )["params"]
    # jitter away the zero-initialised output convs: a fresh UNet predicts
    # exactly 0 for every input, which would make the guided teacher and
    # the conditional student trivially identical at any strength
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed + 100), len(leaves))
    params = jax.tree.unflatten(treedef, [
        p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
        for p, k in zip(leaves, keys)
    ])
    rng = np.random.default_rng(seed)
    data = (0.6 * np.sin(
        np.linspace(0, 3, 8)[None, :, None, None]
        + rng.uniform(0, 6, size=(64, 1, 1, 1))
    )).astype(np.float32) * np.ones((1, 1, 8, 1), np.float32)
    labels = rng.integers(1, 5, size=(64,))  # 0 is the CFG null class

    def loader():
        while True:
            idx = rng.integers(0, 64, size=(8,))
            yield data[idx], labels[idx]

    return model, params, loader


def test_guided_distill_zero_strength_loss_is_zero():
    """At w=0 the guided teacher IS the conditional single forward, and the
    student initialises from the teacher — so the stage-1 loss must be ~0
    at init. Sharp check that the target/student paths agree exactly."""
    from nicediffusion_tpu.training.distill import GuidedDistiller

    model, params, loader = _cond_setup()
    gd = GuidedDistiller(
        model=model, teacher_params=params, diffusion_args=DARGS,
        dataloader=loader(), iterations=1, guidance_strength=0.0, seed=3,
    )
    batch, labels = next(gd.loader)
    gd.rng, step_rng = jax.random.split(gd.rng)
    _, metrics = gd._step_fn(
        gd.state, gd.teacher_params, jnp.asarray(batch),
        jnp.asarray(labels), step_rng,
    )
    assert float(metrics["loss"]) < 1e-8


def test_guided_distill_round_end_to_end():
    """Nonzero w: initial loss > 0 (guided teacher != conditional student),
    training reduces it, and the returned student samples UNGUIDED on the
    full grid (1 forward/step, same rescaled_num_steps as the teacher)."""
    from nicediffusion_tpu.training.distill import GuidedDistiller

    model, params, loader = _cond_setup(seed=1)
    gd = GuidedDistiller(
        model=model, teacher_params=params, diffusion_args=DARGS,
        dataloader=loader(), iterations=30, guidance_strength=2.0,
        lr=3e-4, seed=4,
    )
    assert gd.student.guidance is None
    assert gd.student.rescaled_num_steps == gd.teacher.rescaled_num_steps

    losses = []
    orig_step = gd._step_fn

    def tracked(*a):
        s, m = orig_step(*a)
        losses.append(float(m["loss"]))
        return s, m

    gd._step_fn = tracked
    student_params, student = gd.run()
    assert np.isfinite(losses).all()
    assert losses[0] > 1e-5  # guided teacher differs from the student
    assert np.mean(losses[-10:]) < np.mean(losses[:10])

    y = jnp.asarray([1, 2], jnp.int32)
    out = student.denoise(
        student_params, jax.random.PRNGKey(5), y=y, batch_size=2
    )
    assert out.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_guided_then_progressive_chain():
    """Stage 1's student is a valid stage-2 teacher: the halving round's
    guidance-stripping is exact once guidance lives in the weights."""
    from nicediffusion_tpu.training.distill import (
        GuidedDistiller,
        ProgressiveDistiller,
    )

    model, params, loader = _cond_setup(seed=2)
    gd = GuidedDistiller(
        model=model, teacher_params=params, diffusion_args=DARGS,
        dataloader=loader(), iterations=3, guidance_strength=0.8, seed=6,
    )
    s1_params, _ = gd.run()

    pd = ProgressiveDistiller(
        model=model, teacher_params=s1_params, diffusion_args=DARGS,
        dataloader=loader(), iterations=3, seed=7,
    )
    s2_params, s2 = pd.run()
    assert s2.rescaled_num_steps == DARGS["rescaled_num_steps"] // 2
    y = jnp.asarray([1], jnp.int32)
    out = s2.denoise(s2_params, jax.random.PRNGKey(8), y=y, batch_size=1)
    assert out.shape == (1, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_guided_student_inherits_sampler():
    """Stage 1 keeps the teacher's grid, so the learned-variance head stays
    valid and the student must inherit the diffusion_args sampler (DDPM by
    default) instead of being forced onto DDIM like stage-2 students."""
    from nicediffusion_tpu.training.distill import GuidedDistiller

    model, params, loader = _cond_setup()
    gd = GuidedDistiller(
        model=model, teacher_params=params, diffusion_args=DARGS,
        dataloader=loader(), iterations=1, guidance_strength=0.8,
    )
    assert gd.student.sampler == "ddpm"  # DARGS sets no sampler override
    assert gd.student.guidance is None

    gd_ddim = GuidedDistiller(
        model=model, teacher_params=params,
        diffusion_args=dict(DARGS, use_ddim=True, ddim_eta=0.0),
        dataloader=loader(), iterations=1, guidance_strength=0.8,
    )
    assert gd_ddim.student.sampler == "ddim"

    # stage-2 students stay deterministic: their halved grid invalidates
    # the teacher's variance head
    pd = ProgressiveDistiller(
        model=model, teacher_params=params, diffusion_args=DARGS,
        dataloader=loader(), iterations=1,
    )
    assert pd.student.sampler == "ddim"


def test_loss_space_algebra():
    """The paper's truncated-SNR x0 loss IS eps-MSE amplified by
    max(1, s^2/a^2) — the conditioning hazard that motivates the 'eps'
    default (module docstring; the factor reaches 4.1e5 at the top of a
    250-step cosine grid)."""
    from nicediffusion_tpu.training.distill import _distill_loss

    key = jax.random.PRNGKey(0)
    eps_s = jax.random.normal(key, (4, 8, 8, 1))
    eps_t = eps_s + 0.1 * jax.random.normal(jax.random.fold_in(key, 1),
                                            (4, 8, 8, 1))
    for acp in (0.9999, 0.5, 2.43e-6):  # low-t, mid, top-of-cosine-chain
        a = jnp.full((4, 1, 1, 1), np.sqrt(acp))
        s = jnp.full((4, 1, 1, 1), np.sqrt(1 - acp))
        l_eps = float(_distill_loss("eps", eps_s, eps_t, a, s))
        l_x0 = float(_distill_loss("x0_snr", eps_s, eps_t, a, s))
        amp = max(1.0, (1 - acp) / acp)
        np.testing.assert_allclose(l_x0, amp * l_eps, rtol=1e-4)
    # the measured amplification at the top of the 250-step cosine grid
    assert max(1.0, (1 - 2.43e-6) / 2.43e-6) > 4e5

    with pytest.raises(ValueError):
        _distill_loss("nope", eps_s, eps_t, a, s)


def test_guided_distill_zero_strength_loss_is_zero_x0_space():
    """The w=0 exactness invariant holds in the paper-faithful loss space
    too (both spaces share the same minimiser per (z, j))."""
    from nicediffusion_tpu.training.distill import GuidedDistiller

    model, params, loader = _cond_setup()
    gd = GuidedDistiller(
        model=model, teacher_params=params, diffusion_args=DARGS,
        dataloader=loader(), iterations=1, guidance_strength=0.0, seed=3,
        loss_space="x0_snr",
    )
    batch, labels = next(gd.loader)
    gd.rng, step_rng = jax.random.split(gd.rng)
    _, metrics = gd._step_fn(
        gd.state, gd.teacher_params, jnp.asarray(batch),
        jnp.asarray(labels), step_rng,
    )
    assert float(metrics["loss"]) < 1e-6


def test_make_optimizer_variants():
    from nicediffusion_tpu.training.distill import _make_optimizer

    params = {"w": jnp.ones((3,))}
    for sched in ("constant", "warmup_cosine"):
        for clip in (1.0, None):
            tx = _make_optimizer(1e-3, 0.0, 100, clip, sched)
            state = tx.init(params)
            upd, _ = tx.update({"w": jnp.ones((3,))}, state, params)
            assert np.isfinite(np.asarray(upd["w"])).all()
    # warmup_cosine starts at lr ~0: the first update must be ~0
    tx = _make_optimizer(1e-3, 0.0, 1000, 1.0, "warmup_cosine")
    state = tx.init(params)
    upd, _ = tx.update({"w": jnp.ones((3,))}, state, params)
    assert float(jnp.abs(upd["w"]).max()) < 1e-6
    with pytest.raises(ValueError):
        _make_optimizer(1e-3, 0.0, 100, 1.0, "nope")


def test_guided_distill_requires_conditional_model():
    from nicediffusion_tpu.training.distill import GuidedDistiller

    model = DiffusionModel(**TINY)  # unconditional
    with pytest.raises(AssertionError):
        GuidedDistiller(
            model=model, teacher_params={}, diffusion_args=DARGS,
            dataloader=iter(()), iterations=1, guidance_strength=0.8,
        )


# ---------------------------------------------------------------------------
# v-parameterised students + variance-head distillation (VERDICT r4 #3/#4)
# ---------------------------------------------------------------------------


def test_student_prediction_type_wiring():
    """student_prediction_type='v' builds a v-native student against an
    eps teacher (Salimans & Ho App. D), and the loss space auto-defaults
    to the bounded x0_snr weighting for v students (module docstring)."""
    from nicediffusion_tpu.training.distill import GuidedDistiller

    teacher = Diffusion(model=None, **DARGS, use_ddim=True, ddim_eta=0.0)
    sv = make_student_diffusion(None, DARGS, teacher, prediction_type="v")
    assert sv.prediction_type == "v"

    model, params, loader = _cond_setup()
    gd = GuidedDistiller(
        model=model, teacher_params=params, diffusion_args=DARGS,
        dataloader=loader(), iterations=1, guidance_strength=0.8,
        student_prediction_type="v",
    )
    assert gd.teacher.prediction_type == "eps"
    assert gd.student.prediction_type == "v"
    assert gd.loss_space == "x0_snr"

    gd_eps = GuidedDistiller(
        model=model, teacher_params=params, diffusion_args=DARGS,
        dataloader=loader(), iterations=1, guidance_strength=0.8,
    )
    assert gd_eps.loss_space == "eps"  # the measured eps-student default

    pd = ProgressiveDistiller(
        model=model, teacher_params=params, diffusion_args=DARGS,
        dataloader=loader(), iterations=1, student_prediction_type="v",
    )
    assert pd.teacher.prediction_type == "eps"
    assert pd.student.prediction_type == "v"

    # native v halving: both sides inherit prediction_type from
    # diffusion_args (the stage-1-converted pipeline)
    pd_v = ProgressiveDistiller(
        model=model, teacher_params=params,
        diffusion_args=dict(DARGS, prediction_type="v"),
        dataloader=loader(), iterations=1,
    )
    assert pd_v.teacher.prediction_type == "v"
    assert pd_v.student.prediction_type == "v"


def test_v_student_guided_distill_trains():
    """A v student distilling an eps CFG teacher: the jitted step runs,
    losses are finite, and training moves the student's epsilon toward the
    guided teacher's at a FIXED probe point. (The raw step-loss trend is
    not a reliable signal here: the x0_snr magnitude varies by orders of
    magnitude with which j's each batch samples, so the probe compares
    before/after at identical inputs instead.)"""
    from nicediffusion_tpu.training.distill import GuidedDistiller

    model, params, loader = _cond_setup(seed=3)
    gd = GuidedDistiller(
        model=model, teacher_params=params, diffusion_args=DARGS,
        dataloader=loader(), iterations=24, guidance_strength=0.8,
        lr=3e-4, student_prediction_type="v", seed=9,
    )
    z = jax.random.normal(jax.random.PRNGKey(20), (8, 8, 8, 1))
    yp = jnp.asarray([1, 2, 3, 4, 1, 2, 3, 4], jnp.int32)
    jp = jnp.asarray([1, 3, 5, 7, 9, 11, 13, 15], jnp.int32)
    eps_t, _ = gd.teacher._guided_eps(params, z, jp, yp, want_log_var=False)

    def probe(student_params):
        eps_s, _ = gd.student._guided_eps(
            student_params, z, jp, yp, want_log_var=False
        )
        return float(jnp.mean((eps_s - eps_t) ** 2))

    before = probe(jax.tree.map(jnp.copy, gd.state.params))

    losses = []
    orig_step = gd._step_fn

    def tracked(*a):
        s, m = orig_step(*a)
        losses.append(float(m["loss"]))
        return s, m

    gd._step_fn = tracked
    student_params, student = gd.run()
    assert np.isfinite(losses).all()
    # the eps-init weights reinterpreted as v are wrong away from t=0, so
    # the initial gap is substantial and training must shrink it
    assert before > 1e-4
    assert probe(student_params) < before
    y = jnp.asarray([1, 2], jnp.int32)
    out = student.denoise(
        student_params, jax.random.PRNGKey(5), y=y, batch_size=2
    )
    assert out.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()


TINY_LV = dict(TINY_COND, out_channels=2)
DARGS_LV = dict(DARGS, sampling_var_type="learned_interpolation",
                loss_type="hybrid")


def _cond_setup_lv(seed=0):
    """Learned-variance conditional setup (out channels = eps | raw var)."""
    model = DiffusionModel(**TINY_LV)
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 8, 8, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )["params"]
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed + 100), len(leaves))
    params = jax.tree.unflatten(treedef, [
        p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
        for p, k in zip(leaves, keys)
    ])
    rng = np.random.default_rng(seed)
    data = (0.6 * np.sin(
        np.linspace(0, 3, 8)[None, :, None, None]
        + rng.uniform(0, 6, size=(64, 1, 1, 1))
    )).astype(np.float32) * np.ones((1, 1, 8, 1), np.float32)
    labels = rng.integers(1, 5, size=(64,))

    def loader():
        while True:
            idx = rng.integers(0, 64, size=(8,))
            yield data[idx], labels[idx]

    return model, params, loader


def test_guided_var_weight_exact_at_zero_strength():
    """w=0 + var_weight: the student IS the teacher at init, so both the
    eps term and the variance-matching term must vanish — a sharp check
    that the var loss compares like-for-like resolved log-variances."""
    from nicediffusion_tpu.training.distill import GuidedDistiller

    model, params, loader = _cond_setup_lv()
    gd = GuidedDistiller(
        model=model, teacher_params=params, diffusion_args=DARGS_LV,
        dataloader=loader(), iterations=1, guidance_strength=0.0,
        var_weight=1.0, seed=3,
    )
    batch, labels = next(gd.loader)
    gd.rng, step_rng = jax.random.split(gd.rng)
    _, metrics = gd._step_fn(
        gd.state, gd.teacher_params, jnp.asarray(batch),
        jnp.asarray(labels), step_rng,
    )
    assert float(metrics["loss"]) < 1e-8


def test_progressive_var_weight_trains_variance_head():
    """Without var_weight the halving loss gives the variance half of the
    output conv ZERO gradient (the documented stale-head limitation); with
    var_weight the VLB term trains it. weight_decay defaults to 0, so the
    no-var run must leave the var-half kernel slice bit-identical."""
    model, params, loader = _cond_setup_lv(seed=1)

    def one_step(var_weight):
        pd = ProgressiveDistiller(
            model=model, teacher_params=params, diffusion_args=DARGS_LV,
            dataloader=loader(), iterations=1, var_weight=var_weight,
            seed=11,
        )
        batch, labels = next(pd.loader)
        pd.rng, step_rng = jax.random.split(pd.rng)
        state, metrics = pd._step_fn(
            pd.state, pd.teacher_params, jnp.asarray(batch),
            jnp.asarray(labels), step_rng,
        )
        assert np.isfinite(float(metrics["loss"]))
        return np.asarray(state.params["out"]["layers_2"]["kernel"])

    k0 = np.asarray(params["out"]["layers_2"]["kernel"])
    half = k0.shape[-1] // 2
    k_no = one_step(None)
    k_var = one_step(1.0)
    # eps half trains either way
    assert np.abs(k_no[..., :half] - k0[..., :half]).max() > 0
    # var half: untouched without var_weight, trained with it
    np.testing.assert_array_equal(k_no[..., half:], k0[..., half:])
    assert np.abs(k_var[..., half:] - k0[..., half:]).max() > 0


def test_progressive_var_weight_student_samples_ddpm():
    """A var-trained halved student must be able to run stochastic DDPM on
    its own nested grid (the serving mode var distillation unlocks)."""
    model, params, loader = _cond_setup_lv(seed=2)
    pd = ProgressiveDistiller(
        model=model, teacher_params=params, diffusion_args=DARGS_LV,
        dataloader=loader(), iterations=4, var_weight=1.0, seed=12,
    )
    s_params, s_diff = pd.run()
    ddpm_student = Diffusion(
        model=model, **dict(
            DARGS_LV, guidance_method=None, guidance_strength=None,
            rescaled_num_steps=s_diff.rescaled_num_steps,
            timestep_indices=np.asarray(s_diff.timestep_map),
        ),
    )
    y = jnp.asarray([1, 2], jnp.int32)
    out = ddpm_student.denoise(
        s_params, jax.random.PRNGKey(13), y=y, batch_size=2
    )
    assert out.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()
