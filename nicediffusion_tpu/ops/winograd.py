"""Winograd F(2x2, 3x3) convolution — 2.25x fewer MACs than direct 3x3.

ABLATION RESULT — measured on a v5e chip and kept as the documented
closure of the last FLOP-reduction avenue for the conv roofline
(BASELINE.md): despite 2.25x fewer MACs, this LOSES to XLA's direct conv
at the UNet's batch-64 shapes (0.66x at res 64, 0.84x at 32, 0.90x at 8;
only res 16 with its awkward 576 channels wins at 1.28x), degrades
further under GN+SiLU composition (3.2 vs 1.5 ms per residual-block
pattern), and is ~4.8x slower for the whole model forward (570 vs 118 ms)
— the 4x4-tile gathers, 6D transposes, and f32 transform intermediates
cost far more HBM traffic and relayout than the saved MACs, while XLA's
native conv already sustains ~97 TF/s isolated. (An earlier probe run
that showed winograd "winning" had anomalously slow direct-conv numbers —
re-measurement corrected it.) Opt-in via DiffusionModel(winograd=True)
for reproduction; never a default.

Method: 4x4 input tiles transformed with B^T d B, multiplied per transform
position as 16 batched (N*tiles, Cin) @ (Cin, Cout) matmuls on XLA
dot_general, inverse-transformed with A^T m A into 2x2 output tiles
(Lavin & Gray, arXiv:1509.09308).

The transform matrices contain only {0, +-1, +-0.5} — exactly representable
— so in true f32 the result matches direct conv to ~3e-7 relative (CPU
test). On the TPU MXU both paths round through bf16 multiply passes;
Winograd's reorganisation shifts those roundings by ~7e-3 relative (same
precision class, different summation order), which is why the fast path is
opt-in (models/unet.py `winograd=True`) and the f32/CPU parity path is
untouched.

No reference analogue (the reference uses whatever torch eager picks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["transform_weights_3x3", "winograd_conv_3x3"]

# F(2x2, 3x3) transform matrices (Lavin & Gray 2015, eq. 10)
_B_T = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
_G = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
)
_A_T = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def transform_weights_3x3(w):
    """(3, 3, Cin, Cout) HWIO kernel -> (4, 4, Cin, Cout) G g G^T.

    Cheap (16*9*Cin*Cout MACs, ~1e-5 of one conv); called per forward so
    parameters stay in canonical HWIO layout (checkpoints unchanged), and
    XLA hoists it out of the sampling scan as loop-invariant.
    """
    w32 = w.astype(jnp.float32)
    u = jnp.einsum("ij,jkco,lk->ilco", _G, w32, _G)
    return u.astype(w.dtype)


def winograd_conv_3x3(x, w, bias=None, out_dtype=None):
    """SAME-padded stride-1 3x3 conv of NHWC `x` with HWIO `w` via
    F(2x2, 3x3). Odd H/W are padded to even and sliced back. Matmuls
    accumulate in f32 (preferred_element_type) like the direct path.
    """
    n, h, w_sp, cin = x.shape
    cout = w.shape[-1]
    out_dtype = out_dtype or x.dtype

    u = transform_weights_3x3(w)

    pad_h, pad_w = h % 2, w_sp % 2
    # SAME pad (1 each side) + evenness pad on the far side
    xp = jnp.pad(x, ((0, 0), (1, 1 + pad_h), (1, 1 + pad_w), (0, 0)))
    th, tw = (h + pad_h) // 2, (w_sp + pad_w) // 2

    # overlapping 4x4 tiles at stride 2: (N, th, tw, 4, 4, C)
    idx_h = (2 * jnp.arange(th))[:, None] + jnp.arange(4)[None, :]
    idx_w = (2 * jnp.arange(tw))[:, None] + jnp.arange(4)[None, :]
    tiles = xp[:, idx_h][:, :, :, idx_w]  # (N, th, 4, tw, 4, C)
    tiles = tiles.transpose(0, 1, 3, 2, 4, 5)

    # input transform B^T d B: +-1 adds only — stays in the compute dtype
    v = jnp.einsum(
        "ij,npqjkc,lk->npqilc", _B_T.astype(x.dtype), tiles,
        _B_T.astype(x.dtype),
    )
    # 16 batched matmuls on the MXU, f32 accumulation
    v = v.reshape(n * th * tw, 16, cin).transpose(1, 0, 2)
    m = jax.lax.dot_general(
        v, u.reshape(16, cin, cout),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (16, N*P, Cout) f32
    m = m.transpose(1, 0, 2).reshape(n, th, tw, 4, 4, cout)

    # output transform A^T m A in f32, then cast once
    y = jnp.einsum("ij,npqjkc,lk->npqilc", _A_T, m, _A_T)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * th, 2 * tw, cout)
    y = y[:, :h, :w_sp, :]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
