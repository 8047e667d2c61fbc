"""Real-ESRGAN 4x super-resolution stage (RRDBNet) in flax, NHWC.

TPU-native replacement for the reference's optional `basicsr` dependency
(reference scripts/sample.py:113-142 lazily imports
`basicsr.archs.rrdbnet_arch.RRDBNet(3, 3, num_feat=64, num_block=23,
num_grow_ch=32, scale=4)` and loads `RealESRGAN_x4plus.pth['params_ema']`).

Architecture (matching the RRDBNet paper/basicsr implementation so those
checkpoints convert):
  conv_first -> 23x RRDB -> conv_body (+ residual) -> 2x (nearest-2x up +
  conv + LeakyReLU) -> conv_hr -> conv_last
  RRDB  = 3 chained ResidualDenseBlocks, residual-scaled by 0.2
  RDB   = 5 densely-connected 3x3 convs (growth 32), LeakyReLU(0.2),
          residual-scaled by 0.2

Weight conversion reuses the Conv OIHW->HWIO transpose from
nicediffusion_tpu.utils.convert; basicsr names map as
``body.{i}.rdb{j}.conv{k}`` -> ``body_{i}.rdb{j}.conv{k}``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import upsample_nearest_2x

__all__ = ["RRDBNet", "convert_esrgan_state_dict", "esrgan_upsample_batches"]


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def _conv(features, name):
    return nn.Conv(features, (3, 3), padding=((1, 1), (1, 1)), name=name)


class ResidualDenseBlock(nn.Module):
    num_feat: int = 64
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        x1 = _lrelu(_conv(self.num_grow_ch, "conv1")(x))
        x2 = _lrelu(_conv(self.num_grow_ch, "conv2")(jnp.concatenate([x, x1], -1)))
        x3 = _lrelu(
            _conv(self.num_grow_ch, "conv3")(jnp.concatenate([x, x1, x2], -1))
        )
        x4 = _lrelu(
            _conv(self.num_grow_ch, "conv4")(jnp.concatenate([x, x1, x2, x3], -1))
        )
        x5 = _conv(self.num_feat, "conv5")(
            jnp.concatenate([x, x1, x2, x3, x4], -1)
        )
        return x5 * 0.2 + x


class RRDB(nn.Module):
    num_feat: int = 64
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, name="rdb1")(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, name="rdb2")(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, name="rdb3")(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    """RRDB super-resolution network, scale 4 (NHWC in [0, 1])."""

    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        feat = _conv(self.num_feat, "conv_first")(x)
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow_ch, name=f"body_{i}")(body)
        feat = feat + _conv(self.num_feat, "conv_body")(body)
        feat = _lrelu(_conv(self.num_feat, "conv_up1")(upsample_nearest_2x(feat)))
        feat = _lrelu(_conv(self.num_feat, "conv_up2")(upsample_nearest_2x(feat)))
        out = _conv(self.num_out_ch, "conv_last")(_lrelu(_conv(self.num_feat, "conv_hr")(feat)))
        return out


def convert_esrgan_state_dict(sd) -> dict:
    """Convert a basicsr RRDBNet torch state dict (e.g.
    RealESRGAN_x4plus.pth['params_ema']) to this module's params pytree."""
    params: dict = {}
    for name, tensor in sd.items():
        value = np.asarray(
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor
        )
        parts = name.split(".")
        # body.{i}.rdbX.convY -> body_{i}.rdbX.convY
        if parts[0] == "body":
            parts = [f"body_{parts[1]}"] + parts[2:]
        *mods, leaf = parts
        if leaf == "weight":
            leaf, value = "kernel", value.transpose(2, 3, 1, 0)
        node = params
        for m in mods:
            node = node.setdefault(m, {})
        node[leaf] = value
    return params


def load_esrgan_params(path: str = "models/RealESRGAN_x4plus.pth") -> dict:
    """Load + convert the Real-ESRGAN checkpoint the reference uses
    (reference sample.py:129-131)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "params_ema" in sd:
        sd = sd["params_ema"]
    return convert_esrgan_state_dict(sd)


def esrgan_upsample_batches(
    samples: Sequence[tuple], model_path: str = "models/RealESRGAN_x4plus.pth",
    batch_chunk: int = 4,
):
    """4x-upsample the sampling CLI's (input, output, labels) batches
    (reference sample.py:128-142): outputs go through the ESRGAN net in
    [0, 1]; inputs are bilinearly 4x'd for the side-by-side display."""
    from ..ops.resize import resize_bilinear

    net = RRDBNet()
    params = load_esrgan_params(model_path)
    apply = jax.jit(lambda p, x: net.apply({"params": p}, x))

    upscaled = []
    for data, out, labels in samples:
        x = jnp.asarray(out, dtype=jnp.float32) / 255.0
        chunks = [
            np.asarray(apply(params, x[i : i + batch_chunk]))
            for i in range(0, x.shape[0], batch_chunk)
        ]
        sr = np.concatenate(chunks, axis=0) * 255.0
        sr = np.clip(sr, 0, 255).astype(np.uint8)
        data4 = np.asarray(
            resize_bilinear(
                jnp.asarray(data, dtype=jnp.float32),
                data.shape[1] * 4,
                data.shape[2] * 4,
            )
        ).astype(np.uint8)
        upscaled.append((data4, sr, labels))
    return upscaled
