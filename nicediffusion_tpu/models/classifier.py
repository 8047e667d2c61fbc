"""Noisy-image classifier for classifier guidance (EncoderUNet, NHWC).

The reference never implements this — `--classifier_path` raises
NotImplementedError (reference utils.py:168-172) even though its guidance
math accepts any classifier module (reference diffusion.py:72, 296-305).
The checkpoints users actually have (OpenAI `64x64_classifier.pt` etc.) are
guided-diffusion ``EncoderUNetModel``s: the UNet's encoder trunk + middle
block, followed by a norm/SiLU/attention-pool classification head. This
module is the TPU-native flax equivalent, reusing the exact same blocks as
models/unet.py so converted checkpoints are bit-compatible with the parity
suite's tolerances.

Architecture notes (guided-diffusion unet.py ``EncoderUNetModel`` /
``AttentionPool2d``, reproduced from its public semantics):

  * encoder trunk: identical to DiffusionModel's ``downsampling`` +
    ``middle_block`` stacks (reference model.py:363-412), including BigGAN
    up/down residual blocks and AdaGN.
  * the in-trunk attention blocks use the guided-diffusion *legacy* head
    order (our ``split_qkv_first=False`` — reference model.py:278-287).
  * attention pool: tokens = [mean(x) | x] + positional embedding, a fused
    qkv projection, multi-head attention in the *new* order
    (``split_qkv_first=True``), an output projection, and the first (mean)
    token as the pooled feature.
  * 'adaptive' pool (GN -> SiLU -> global mean -> zero-init 1x1 conv) is
    also provided for completeness.

Module naming mirrors the torch tree after the reference rename map
(``downsampling_{i}.layers_{j}``, ``out.layers_{k}``) so
utils/convert.convert_torch_state_dict works mechanically on
guided-diffusion classifier checkpoints.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import qkv_attention
from ..ops.math import timestep_embedding
from .unet import (
    AttentionBlock,
    Downsample,
    EmbedMLP,
    GroupNormOp,
    ResidualBlock,
    StepSequential,
    _conv,
)

__all__ = ["AttentionPool", "EncoderUNet"]


class AttentionPool(nn.Module):
    """CLIP-style attention pooling (guided-diffusion AttentionPool2d).

    (B, H, W, C) -> (B, out_features): prepend the mean token, add a learned
    positional embedding, run one multi-head attention over all tokens, and
    return the projected mean-token output.
    """

    num_head_channels: int
    out_features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = h * w
        assert c % self.num_head_channels == 0
        tokens = x.reshape(b, n, c)
        tokens = jnp.concatenate(
            [tokens.mean(axis=1, keepdims=True), tokens], axis=1
        )
        # torch stores (C, N+1); the converter transposes to (N+1, C)
        pos = self.param(
            "positional_embedding",
            lambda key, shape: jax.random.normal(key, shape) / c**0.5,
            (n + 1, c),
        )
        tokens = tokens + pos[None].astype(tokens.dtype)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv_proj")(tokens)
        # AttentionPool2d hardcodes the new attention order (q|k|v split
        # first), regardless of the trunk's order
        out = qkv_attention(
            qkv, c // self.num_head_channels, split_qkv_first=True
        )
        out = nn.Dense(self.out_features, dtype=self.dtype, name="c_proj")(out)
        return out[:, 0].astype(jnp.float32)


class _AttentionPoolHead(nn.Module):
    """GN -> SiLU -> AttentionPool, named out.layers_0 / out.layers_2 to
    mirror torch ``out = Sequential(norm, SiLU, AttentionPool2d)``."""

    features: int
    num_head_channels: int
    out_features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = GroupNormOp(self.features, mode="silu", name="layers_0")(x)
        return AttentionPool(
            num_head_channels=self.num_head_channels,
            out_features=self.out_features,
            dtype=self.dtype,
            name="layers_2",
        )(x)


class _AdaptivePoolHead(nn.Module):
    """GN -> SiLU -> global mean pool -> zero-init 1x1 conv, mirroring torch
    ``out = Sequential(norm, SiLU, AdaptiveAvgPool2d(1), zero_conv,
    Flatten)`` (conv at Sequential index 3)."""

    features: int
    out_features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = GroupNormOp(self.features, mode="silu", name="layers_0")(x)
        x = x.mean(axis=(1, 2), keepdims=True)
        x = _conv(
            self.out_features, 1, zero_init=True, dtype=self.dtype,
            name="layers_3",
        )(x)
        return x[:, 0, 0, :].astype(jnp.float32)


class EncoderUNet(nn.Module):
    """Half-UNet noisy classifier: ``(x[B,H,W,C], timestep[B]) -> logits``.

    ``timestep`` follows whatever convention the checkpoint was trained
    with; when driven by Diffusion's classifier-guidance hook it receives
    the *rescaled* timestep (the reference quirk, reference diffusion.py:301).
    """

    resolution: int
    in_channels: int
    model_channels: int
    out_channels: int  # number of classes
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_heads: int = 1
    num_head_channels: int | None = None
    resblock_updown: bool = False
    use_adaptive_gn: bool = False
    # guided-diffusion classifiers use the legacy head order in the trunk
    split_qkv_first: bool = False
    pool: str = "attention"
    dtype: jnp.dtype | None = None

    def setup(self):
        dtype = self.dtype
        self.step_embed = EmbedMLP(4 * self.model_channels, dtype=dtype)

        def make_res(out_ch=None, down=False):
            return ResidualBlock(
                out_channels=out_ch,
                downsample=down,
                use_adaptive_gn=self.use_adaptive_gn,
                dropout=self.dropout,
                dtype=dtype,
            )

        def make_attn():
            return AttentionBlock(
                num_heads=self.num_heads,
                num_head_channels=self.num_head_channels,
                split_qkv_first=self.split_qkv_first,
                dtype=dtype,
            )

        # encoder trunk — same construction as DiffusionModel.setup
        # (reference model.py:363-412), minus skip tracking
        curr_channels = int(self.model_channels * self.channel_mult[0])
        curr_res = self.resolution
        downsampling = [StepSequential([_conv(curr_channels, 3, dtype=dtype)])]
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                layers = [make_res(out_ch=int(self.model_channels * mult))]
                curr_channels = int(self.model_channels * mult)
                if curr_res in self.attention_resolutions:
                    layers.append(make_attn())
                downsampling.append(StepSequential(layers))
            curr_channels = int(self.model_channels * mult)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    downsampling.append(
                        StepSequential([make_res(out_ch=curr_channels, down=True)])
                    )
                else:
                    downsampling.append(
                        StepSequential(
                            [Downsample(out_channels=curr_channels,
                                        with_conv=self.conv_resample,
                                        dtype=dtype)]
                        )
                    )
                curr_res //= 2
        self.downsampling = downsampling
        self.middle_block = StepSequential(
            [make_res(), make_attn(), make_res()]
        )

        if self.pool == "attention":
            assert self.num_head_channels is not None, (
                "attention pool needs num_head_channels"
            )
            self.out = _AttentionPoolHead(
                features=curr_channels,
                num_head_channels=self.num_head_channels,
                out_features=self.out_channels,
                dtype=dtype,
            )
        elif self.pool == "adaptive":
            self.out = _AdaptivePoolHead(
                features=curr_channels,
                out_features=self.out_channels,
                dtype=dtype,
            )
        else:
            raise NotImplementedError(f"pool={self.pool!r}")

    def __call__(self, x, timestep, *, deterministic: bool = True):
        emb = self.step_embed(timestep_embedding(timestep, self.model_channels))
        x = x.astype(self.dtype or x.dtype)
        for module in self.downsampling:
            x = module(x, emb, deterministic=deterministic)
        x = self.middle_block(x, emb, deterministic=deterministic)
        return self.out(x)
