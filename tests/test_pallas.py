"""Correctness tests for the Pallas TPU kernels, run in interpreter mode on
CPU against the reference einsum implementations (SURVEY.md §7 step 8:
kernels swap in only under parity tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nicediffusion_tpu.ops.attention import qkv_attention, split_qkv
from nicediffusion_tpu.ops.pallas.attention import (
    mha_attention,
    mha_attention_fused_qkv,
)


@pytest.mark.parametrize("n,d,h", [(64, 64, 4), (49, 16, 2), (256, 64, 6)])
def test_pallas_attention_matches_einsum(rng_np, n, d, h):
    """Fused kernel (interpret mode) == plain einsum attention, including
    non-aligned N (padding mask path) and small head dims."""
    b = 2
    q, k, v = (
        jnp.asarray(rng_np.normal(size=(b, h, n, d)).astype(np.float32))
        for _ in range(3)
    )
    out = mha_attention(q, k, v, interpret=True)

    scale = d**-0.5
    logits = jnp.einsum("bhtc,bhsc->bhts", q, k) * scale
    w = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("bhts,bhsc->bhtc", w, v)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("split_first", [True, False])
def test_qkv_attention_pallas_path_matches_einsum_path(rng_np, split_first):
    """The full op (split + kernel + merge) agrees across backends for both
    checkpoint qkv layouts."""
    b, n, c, heads = 2, 49, 64, 4
    qkv = jnp.asarray(rng_np.normal(size=(b, n, 3 * c)).astype(np.float32))

    ref = qkv_attention(qkv, heads, split_first, use_pallas=False)

    # pallas path, interpret mode: bypass the dispatch and call directly
    q, k, v = split_qkv(qkv, heads, split_first)
    out = mha_attention(q, k, v, interpret=True)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("split_first", [True, False])
@pytest.mark.parametrize("n,c,heads", [(64, 128, 4), (49, 128, 4), (256, 96, 3)])
def test_fused_qkv_kernel_matches_einsum_path(rng_np, split_first, n, c, heads):
    """The zero-transpose fused-layout kernel == the einsum path for both
    checkpoint layouts, aligned and unaligned N, non-128 head dims."""
    b = 2
    qkv = jnp.asarray(rng_np.normal(size=(b, n, 3 * c)).astype(np.float32))
    ref = qkv_attention(qkv, heads, split_first, use_pallas=False)
    out = mha_attention_fused_qkv(qkv, heads, split_first, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("shape", [(7, 7, 64), (28, 28, 128), (64, 64, 384)])
@pytest.mark.parametrize("mode", ["plain", "silu", "ada"])
def test_fused_groupnorm_matches_reference(rng_np, shape, mode):
    """Streaming GN kernel (interpret mode) == jnp reference for all three
    modes and both aligned and padded token counts."""
    import os

    from nicediffusion_tpu.ops import groupnorm as gn
    from nicediffusion_tpu.ops.pallas.groupnorm import group_norm_fused

    h, w, c = shape
    x = jnp.asarray(rng_np.normal(size=(2, h, w, c)).astype(np.float32))
    sc = jnp.asarray(rng_np.normal(size=(c,)).astype(np.float32))
    bi = jnp.asarray(rng_np.normal(size=(c,)).astype(np.float32))
    es = jnp.asarray(rng_np.normal(size=(2, c)).astype(np.float32)) * 0.1
    eh = jnp.asarray(rng_np.normal(size=(2, c)).astype(np.float32)) * 0.1

    os.environ["NICEDIFFUSION_NO_PALLAS"] = "1"
    try:
        if mode == "plain":
            ref = gn.group_norm(x, sc, bi)
            out = group_norm_fused(x, sc, bi, silu=False, interpret=True)
        elif mode == "silu":
            ref = gn.group_norm_silu(x, sc, bi)
            out = group_norm_fused(x, sc, bi, interpret=True)
        else:
            ref = gn.ada_group_norm_silu(x, sc, bi, es, eh)
            out = group_norm_fused(x, sc, bi, es, eh, interpret=True)
    finally:
        del os.environ["NICEDIFFUSION_NO_PALLAS"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_attention_gradients_match_einsum(rng_np, monkeypatch):
    """The custom-VJP backward (Pallas flash-backward kernel) must produce
    the same gradients as differentiating the einsum path directly — this is
    the path TPU training takes (pallas_call has no automatic VJP)."""
    from nicediffusion_tpu.ops.attention import (
        _einsum_attention,
        _pallas_attention,
    )

    b, n, c, heads = 2, 64, 128, 4
    qkv = jnp.asarray(rng_np.normal(size=(b, n, 3 * c)).astype(np.float32))

    # interpret mode runs the fwd and bwd kernels as plain JAX ops on CPU
    monkeypatch.setenv("NICEDIFFUSION_PALLAS_INTERPRET", "1")
    g_pallas = jax.grad(
        lambda q: jnp.sum(jnp.sin(_pallas_attention(q, heads, True)))
    )(qkv)
    g_einsum = jax.grad(
        lambda q: jnp.sum(jnp.sin(_einsum_attention(q, heads, True)))
    )(qkv)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_einsum), atol=1e-5
    )


def test_pallas_attention_bf16(rng_np):
    b, h, n, d = 2, 2, 64, 64
    q, k, v = (
        jnp.asarray(rng_np.normal(size=(b, h, n, d)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        for _ in range(3)
    )
    out = mha_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16

    scale = d**-0.5
    logits = jnp.einsum(
        "bhtc,bhsc->bhts", q, k, preferred_element_type=jnp.float32
    ) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    ref = jnp.einsum("bhts,bhsc->bhtc", w, v)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(ref, dtype=np.float32),
        atol=3e-2,  # bf16 accumulation differences
    )


def test_groupnorm_dispatch_and_gradients(rng_np, monkeypatch):
    """The default-on GN dispatch (round 2): forward through the kernel
    (interpret mode) and gradients through the custom-VJP recompute must
    both match the jnp reference path."""
    from nicediffusion_tpu.ops import groupnorm as gn

    x = jnp.asarray(rng_np.normal(size=(2, 8, 8, 64)).astype(np.float32))
    sc = jnp.asarray(rng_np.normal(size=(64,)).astype(np.float32))
    bi = jnp.asarray(rng_np.normal(size=(64,)).astype(np.float32))
    es = jnp.asarray(0.1 * rng_np.normal(size=(2, 64)).astype(np.float32))
    eh = jnp.asarray(0.1 * rng_np.normal(size=(2, 64)).astype(np.float32))

    def loss_ada(x, sc, bi, es, eh):
        return jnp.sum(jnp.sin(gn.ada_group_norm_silu(x, sc, bi, es, eh)))

    def loss_silu(x, sc, bi):
        return jnp.sum(jnp.sin(gn.group_norm_silu(x, sc, bi)))

    monkeypatch.setenv("NICEDIFFUSION_NO_PALLAS", "1")
    ref_out = gn.ada_group_norm_silu(x, sc, bi, es, eh)
    ref_grads = jax.grad(loss_ada, argnums=(0, 1, 2, 3, 4))(x, sc, bi, es, eh)
    ref_gsilu = jax.grad(loss_silu)(x, sc, bi)
    monkeypatch.delenv("NICEDIFFUSION_NO_PALLAS")

    monkeypatch.setenv("NICEDIFFUSION_PALLAS_INTERPRET", "1")
    out = gn.ada_group_norm_silu(x, sc, bi, es, eh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
    grads = jax.grad(loss_ada, argnums=(0, 1, 2, 3, 4))(x, sc, bi, es, eh)
    for a, b in zip(grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )
    gsilu = jax.grad(loss_silu)(x, sc, bi)
    np.testing.assert_allclose(
        np.asarray(gsilu), np.asarray(ref_gsilu), rtol=1e-4, atol=1e-4
    )


def test_groupnorm_large_block_single_buffer(rng_np, monkeypatch):
    """Blocks above the single-buffer threshold (the decoder-concat shapes
    that OOM'd VMEM in round 1) still produce exact results."""
    from nicediffusion_tpu.ops import groupnorm as gn
    from nicediffusion_tpu.ops.pallas import groupnorm as pgn

    assert 2 * 64 * 64 * 576 * 2 > pgn._SINGLE_BUFFER_BYTES
    x = jnp.asarray(
        rng_np.normal(size=(1, 64, 64, 576)).astype(np.float32)
    ).astype(jnp.bfloat16)
    sc = jnp.asarray(rng_np.normal(size=(576,)).astype(np.float32))
    bi = jnp.asarray(rng_np.normal(size=(576,)).astype(np.float32))

    monkeypatch.setenv("NICEDIFFUSION_NO_PALLAS", "1")
    ref = gn.group_norm_silu(x, sc, bi)
    monkeypatch.delenv("NICEDIFFUSION_NO_PALLAS")
    monkeypatch.setenv("NICEDIFFUSION_PALLAS_INTERPRET", "1")
    out = gn.group_norm_silu(x, sc, bi)
    # bf16 output: chunked f32 stat accumulation differs from the reference
    # by 1-2 ulps on ~0.1% of elements
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=1e-2, atol=3e-2,
    )


def test_bwd_kernel_covers_non_tile_multiple_sequences():
    """Regression: N=196 (EMNIST 14x14) pads to 200 under the old sublane-8
    rule, and the backward kernel's 128-row query tiling then left rows
    128..199 of dq UNWRITTEN (garbage/NaN on real TPU; interpret zero-fills
    which hid it). The wrapper now pads to a tile multiple; grads must match
    einsum autodiff at every row."""
    import os

    from nicediffusion_tpu.ops.attention import (
        _einsum_attention,
        qkv_attention,
    )

    os.environ["NICEDIFFUSION_PALLAS_INTERPRET"] = "1"
    try:
        for n in (49, 136, 196, 200, 256):
            c, heads = 32, 4
            qkv = jax.random.normal(
                jax.random.PRNGKey(n), (2, n, 3 * c), jnp.float32
            )
            g = jax.random.normal(
                jax.random.PRNGKey(n + 1), (2, n, c), jnp.float32
            )
            gp = jax.grad(
                lambda x: jnp.vdot(qkv_attention(x, heads, True, use_pallas=True), g)
            )(qkv)
            ge = jax.grad(
                lambda x: jnp.vdot(_einsum_attention(x, heads, True), g)
            )(qkv)
            assert np.isfinite(np.asarray(gp)).all(), n
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(ge), atol=2e-4, rtol=1e-3,
                err_msg=f"N={n}",
            )
    finally:
        os.environ.pop("NICEDIFFUSION_PALLAS_INTERPRET", None)


def test_groupnorm_rejects_indivisible_channels():
    """channels % num_groups != 0 must fail with an actionable ValueError
    (the same constraint as the reference's GroupNorm32(32, channels)),
    not an opaque downstream reshape error."""
    from nicediffusion_tpu.ops import groupnorm as gn

    x = jnp.zeros((1, 8, 8, 16))
    for fn in (
        lambda: gn.group_norm(x, jnp.ones(16), jnp.zeros(16)),
        lambda: gn.group_norm_silu(x, jnp.ones(16), jnp.zeros(16)),
        lambda: gn.ada_group_norm_silu(
            x, jnp.ones(16), jnp.zeros(16),
            jnp.zeros((1, 16)), jnp.zeros((1, 16)),
        ),
    ):
        with pytest.raises(ValueError, match="not divisible by num_groups"):
            fn()
