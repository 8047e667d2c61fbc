"""Spatial resampling primitives (NHWC).

TPU-native equivalents of the reference's torch resampling calls:
  - 2x nearest-neighbour upsample  (reference model.py:77,  F.interpolate nearest)
  - 2x average-pool downsample     (reference model.py:111, F.avg_pool2d 2x2)
  - bilinear resize                (reference model.py:497 / scripts/sample.py:137,
                                    F.interpolate bilinear, align_corners=False)

The 2x nearest/avg cases are pure reshape/reduce ops that XLA fuses into
neighbouring convs and that match torch bit-for-bit in f32. Bilinear uses
jax.image.resize with half-pixel centres, which is torch's
align_corners=False convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["upsample_nearest_2x", "avg_pool_2x", "resize_bilinear"]


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """2x nearest-neighbour upsample of an NHWC tensor."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """2x2 stride-2 average pool of an NHWC tensor."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))


def resize_bilinear(x: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize of an NHWC tensor (align_corners=False semantics)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, height, width, c), method="linear")
