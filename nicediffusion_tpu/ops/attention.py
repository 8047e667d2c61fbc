"""Multi-head QKV self-attention over flattened image tokens.

The reference's AttentionBlock (reference model.py:214-291) supports two
weight layouts for the fused qkv projection, selected by ``split_qkv_first``:

  * ``True``  (model.py:266-277): the 3C output channels are laid out
    ``[q(C) | k(C) | v(C)]`` with heads contiguous inside each of q/k/v.
  * ``False`` (model.py:278-287, the guided-diffusion legacy order): channels
    are laid out per head, ``[h0:(q|k|v) | h1:(q|k|v) | ...]``.

Both compute identical softmax(q k^T / sqrt(d)) v attention — the flag only
changes how the checkpoint's qkv weight tensor is interpreted, so both must
exist for checkpoint parity. Softmax and the logits matmul run in float32
regardless of input dtype.

Sequence lengths here are tiny (<= resolution^2/4 tokens, e.g. 1024 for the
ImageNet models), so a single fused attention per (batch, head) fits easily
in VMEM; the Pallas fused version lives in nicediffusion_tpu.ops.pallas.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["split_qkv", "qkv_attention"]


def split_qkv(qkv: jax.Array, num_heads: int, split_qkv_first: bool):
    """Split a (B, N, 3C) fused projection into q, k, v of shape (B, H, N, hc).

    ``split_qkv_first`` selects the channel layout (see module docstring).
    """
    b, n, c3 = qkv.shape
    c = c3 // 3
    hc = c // num_heads
    if split_qkv_first:
        qkv = qkv.reshape(b, n, 3, num_heads, hc)
        q, k, v = (qkv[:, :, i] for i in range(3))  # (B, N, H, hc)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    else:
        qkv = qkv.reshape(b, n, num_heads, 3, hc)
        q, k, v = (qkv[:, :, :, i] for i in range(3))
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    return q, k, v


def _pallas_interpret() -> bool:
    """Interpret-mode escape hatch: run the Pallas kernels as plain JAX ops.

    Lets CPU tests and the multi-chip dryrun exercise the exact kernel code
    path (including its SPMD partitioning) without TPU hardware.
    """
    return bool(os.environ.get("NICEDIFFUSION_PALLAS_INTERPRET"))


def _pallas_enabled() -> bool:
    """Use the fused Pallas kernel on TPU unless explicitly disabled."""
    if os.environ.get("NICEDIFFUSION_NO_PALLAS"):
        return False
    if _pallas_interpret():
        return True
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _einsum_attention(qkv, num_heads: int, split_qkv_first: bool):
    """Reference jnp attention over the fused projection -> (B, N, C)."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    hc = c // num_heads
    q, k, v = split_qkv(qkv, num_heads, split_qkv_first)
    scale = hc**-0.5
    logits = jnp.einsum(
        "bhtc,bhsc->bhts", q, k, preferred_element_type=jnp.float32
    ) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bhsc->bhtc", weights, v)
    return out.transpose(0, 2, 1, 3).reshape(b, n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _pallas_attention(qkv, num_heads: int, split_qkv_first: bool):
    # SPMD-partitionable wrapper (custom_partitioning over the batch dim);
    # identical direct pallas_call lowering when only one device is visible.
    from .pallas.attention import fused_qkv_attention_sharded

    return fused_qkv_attention_sharded(
        qkv, num_heads, split_qkv_first, interpret=_pallas_interpret()
    ).astype(qkv.dtype)


def _pallas_attention_fwd(qkv, num_heads, split_qkv_first):
    out = _pallas_attention(qkv, num_heads, split_qkv_first)
    # the forward output is the softmax-trick residual:
    # rowsum(dp * p) == rowsum(g * o)
    return out, (qkv, out)


def _pallas_attention_bwd(num_heads, split_qkv_first, res, g):
    # Flash-style recompute backward as a Pallas kernel: recomputes the
    # softmax in VMEM and emits the qkv cotangent with no (N, N) HBM traffic
    # (pallas_call has no automatic VJP).
    from .pallas.attention import fused_qkv_attention_bwd_sharded

    qkv, out = res
    return (
        fused_qkv_attention_bwd_sharded(
            qkv, g.astype(qkv.dtype), out, num_heads, split_qkv_first,
            interpret=_pallas_interpret(),
        ),
    )


_pallas_attention.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


def qkv_attention(
    qkv: jax.Array,
    num_heads: int,
    split_qkv_first: bool,
    use_pallas: bool | None = None,
) -> jax.Array:
    """softmax(q k^T * hc^-0.5) v over a (B, N, 3C) fused projection.

    Returns (B, N, C). Scale matches reference model.py:245:
    ``(channels // num_heads) ** -0.5``. On TPU this dispatches to the fused
    Pallas kernel (ops/pallas/attention.py) — ablation shows the XLA einsum
    path spends ~half the UNet forward in the HBM round-trips of the (N, N)
    logits; the kernel keeps them in VMEM. `use_pallas=None` auto-detects.
    """
    b, n, c3 = qkv.shape
    c = c3 // 3
    hc = c // num_heads

    del b, n, hc  # shapes handled inside the implementations
    if use_pallas is None:
        use_pallas = _pallas_enabled()
    if use_pallas:
        # custom_vjp wrapper: fused Pallas kernels for both the forward and
        # the flash-style recompute backward (see above)
        return _pallas_attention(qkv, num_heads, split_qkv_first)
    # Both layouts emit the same output order (head h occupies channels
    # [h*hc, (h+1)*hc)) — verified against both torch branches.
    return _einsum_attention(qkv, num_heads, split_qkv_first).astype(qkv.dtype)
