"""TPU-native UNet epsilon-predictor (flax.linen, NHWC).

Re-design of the reference DiffusionModel / SuperResolutionModel
(/root/reference/nicediffusion/model.py:294-499) for TPU:

  * NHWC layouts throughout (torch checkpoints are transposed by
    nicediffusion_tpu.utils.convert).
  * GroupNorm + SiLU (+ AdaGN scale-shift) as fused ops
    (nicediffusion_tpu.ops.groupnorm) rather than separate modules.
  * Attention as one fused einsum attention over flattened tokens
    (nicediffusion_tpu.ops.attention), both qkv weight layouts supported.
  * Optional jax.checkpoint (remat) per block instead of the reference's
    hand-rolled CheckpointFunction (reference utils.py:220-260) — with
    correct RNG semantics for dropout, unlike the reference.
  * Configurable compute dtype (bfloat16 on TPU; float32 for parity tests);
    params always stored float32.

Module tree naming mirrors the torch module tree one-to-one
(``downsampling.{i}.{j}`` -> ``downsampling_{i}.layers_{j}`` etc.) so that
checkpoint conversion is a mechanical rename + transpose.

Architecture semantics matched to the reference:
  * BigGAN-style ResidualBlock with optional in-block up/down resample of
    both the hidden path and the skip path (model.py:150-159, 188-211).
  * AdaGN ``(1+s)*GN(h)+b`` vs additive embedding (model.py:199-206).
  * zero-initialised final convs of every block and the output head
    (model.py:177-178, 253-254, 448).
  * attention at the configured feature-map resolutions; heads from
    num_head_channels when given, else num_heads (model.py:236-242).
  * sinusoidal [cos|sin] timestep embedding -> 2-layer MLP; class embedding
    added to the step embedding (model.py:345-361, 456-459).
  * decoder consumes one encoder skip per block by channel concat, with the
    2x upsample appended inside the level's last block (model.py:414-443).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import qkv_attention
from ..ops.groupnorm import ada_group_norm_silu, group_norm, group_norm_silu
from ..ops.math import timestep_embedding
from ..ops.resize import avg_pool_2x, resize_bilinear, upsample_nearest_2x

__all__ = ["DiffusionModel", "SuperResolutionModel"]


class Int8Conv(nn.Module):
    """Conv with int8 x int8 -> int32 MXU compute (serving fast path).

    Holds the exact same parameters ('kernel' HWIO f32, 'bias') as nn.Conv,
    so checkpoints load unchanged. Three modes, selected by which flax
    collections the caller supplies (ops/quant.py build_int8_variables
    drives the calibrate -> freeze sequence):

      * calibration (``mutable=['calib']``): runs the FLOAT conv and sows
        the input-activation absmax into the 'calib' collection;
      * freeze (``mutable=['quant']``, 'calib' provided): quantizes the
        weights per output channel ONCE and stores {kernel_q int8,
        inv_act f32 scalar, deq f32 [Cout]} into 'quant';
      * serving ('quant' provided): static-scale int8 conv — the only
        per-call overhead beyond the int8 MXU conv is a round/clip that
        XLA fuses into the producing op's epilogue. Measured 1.15-1.5x
        bf16 on the UNet's GN+SiLU->conv patterns (tools/int8_probe2.py),
        where round-2's dynamic path lost half its gain to the per-call
        absmax reduce and in-scan weight requantization.

    Without any of those collections this falls back to the dynamic
    per-tensor path (kept as an ablation; BASELINE.md round-2 shows it
    does NOT pay off end-to-end). Opt-in and lossy — see
    scripts/sample.py --dtype int8.
    """

    features: int
    kernel_size: int
    stride: int = 1
    zero_init: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import (
            int8_conv,
            int8_conv_static,
            static_quant_triple,
        )

        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init
            else nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        out_dtype = self.dtype or x.dtype

        if self.is_mutable_collection("calib"):
            self.sow(
                "calib", "absmax", jnp.max(jnp.abs(x.astype(jnp.float32)))
            )
            pad = ((k // 2, k // 2),) * 2
            o = jax.lax.conv_general_dilated(
                x.astype(out_dtype), kernel.astype(out_dtype),
                (self.stride, self.stride), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            return (o + bias.astype(jnp.float32)).astype(out_dtype)

        if self.is_mutable_collection("quant"):
            w_q, inv_act, deq = static_quant_triple(
                kernel, self.get_variable("calib", "absmax")
            )
            self.variable("quant", "kernel_q", lambda: w_q)
            self.variable("quant", "inv_act", lambda: inv_act)
            self.variable("quant", "deq", lambda: deq)

        if self.has_variable("quant", "kernel_q"):
            return int8_conv_static(
                x,
                self.get_variable("quant", "kernel_q"),
                self.get_variable("quant", "inv_act"),
                self.get_variable("quant", "deq"),
                bias=bias, stride=self.stride, out_dtype=out_dtype,
            )

        return int8_conv(
            x, kernel, bias=bias, stride=self.stride, out_dtype=out_dtype,
        )


class Int8Dense(nn.Module):
    """Dense with the same calibrate/freeze/serve modes as Int8Conv.

    Used for the attention qkv/output projections when the model is built
    ``quantized=True`` — the projections are plain (B*N, C) x (C, F)
    matmuls whose input is a GN (qkv) or attention-kernel (proj) output,
    so the static round/clip quantize fuses into the producer's epilogue
    exactly like the conv case. Parameters ('kernel' (I, O) f32, 'bias')
    match nn.Dense, so checkpoints load unchanged.
    """

    features: int
    zero_init: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import (
            int8_dense,
            int8_dense_static,
            static_quant_triple,
        )

        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init
            else nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        out_dtype = self.dtype or x.dtype

        if self.is_mutable_collection("calib"):
            self.sow(
                "calib", "absmax", jnp.max(jnp.abs(x.astype(jnp.float32)))
            )
            o = jnp.dot(
                x.astype(out_dtype), kernel.astype(out_dtype),
                preferred_element_type=jnp.float32,
            )
            return (o + bias.astype(jnp.float32)).astype(out_dtype)

        if self.is_mutable_collection("quant"):
            w_q, inv_act, deq = static_quant_triple(
                kernel, self.get_variable("calib", "absmax")
            )
            self.variable("quant", "kernel_q", lambda: w_q)
            self.variable("quant", "inv_act", lambda: inv_act)
            self.variable("quant", "deq", lambda: deq)

        if self.has_variable("quant", "kernel_q"):
            return int8_dense_static(
                x,
                self.get_variable("quant", "kernel_q"),
                self.get_variable("quant", "inv_act"),
                self.get_variable("quant", "deq"),
                bias=bias, out_dtype=out_dtype,
            )

        return int8_dense(x, kernel, bias=bias, out_dtype=out_dtype)


class WinogradConv(nn.Module):
    """Stride-1 3x3 conv via Winograd F(2x2, 3x3) (ops/winograd.py).

    ABLATION PATH — measured SLOWER than XLA's direct conv in-model on a
    v5e chip despite 2.25x fewer MACs (see ops/winograd.py header for the
    numbers); kept opt-in for reproduction of that result, never default.
    Holds the exact same parameters ('kernel' HWIO, 'bias') as nn.Conv, so
    checkpoints load unchanged; same-precision-class bf16 numerics."""

    features: int
    zero_init: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        from ..ops.winograd import winograd_conv_3x3

        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init
            else nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dtype = self.dtype or x.dtype
        return winograd_conv_3x3(
            x.astype(dtype), kernel.astype(dtype), bias=bias,
            out_dtype=dtype,
        )


def _conv(features, kernel, stride=1, zero_init=False, dtype=None, name=None,
          quantized=False, winograd=False):
    if quantized:
        return Int8Conv(
            features=features, kernel_size=kernel, stride=stride,
            zero_init=zero_init, dtype=dtype, name=name,
        )
    if winograd and kernel == 3 and stride == 1:
        return WinogradConv(
            features=features, zero_init=zero_init, dtype=dtype, name=name,
        )
    k = (kernel, kernel)
    pad = ((kernel // 2, kernel // 2),) * 2
    return nn.Conv(
        features=features,
        kernel_size=k,
        strides=(stride, stride),
        padding=pad,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        dtype=dtype,
        name=name,
    )


class GroupNormOp(nn.Module):
    """Parameter container for a GroupNorm, applied via the fused ops.

    mode: 'plain' -> GN only; 'silu' -> GN+SiLU; 'ada' -> AdaGN+SiLU taking
    (x, emb_scale, emb_shift).
    """

    features: int
    mode: str = "plain"
    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, emb_scale=None, emb_shift=None):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.mode == "ada":
            return ada_group_norm_silu(
                x, scale, bias, emb_scale, emb_shift, self.num_groups, self.eps
            )
        elif self.mode == "silu":
            return group_norm_silu(x, scale, bias, self.num_groups, self.eps)
        else:
            return group_norm(x, scale, bias, self.num_groups, self.eps)


class Upsample(nn.Module):
    """2x nearest upsample, optional 3x3 conv (reference model.py:51-80)."""

    out_channels: int | None = None
    with_conv: bool = True
    dtype: jnp.dtype | None = None
    quantized: bool = False
    winograd: bool = False

    @nn.compact
    def __call__(self, x):
        x = upsample_nearest_2x(x)
        if self.with_conv:
            features = self.out_channels if self.out_channels is not None else x.shape[-1]
            x = _conv(features, 3, dtype=self.dtype, name="conv",
                      quantized=self.quantized, winograd=self.winograd)(x)
        return x


class Downsample(nn.Module):
    """2x downsample via stride-2 conv or avg-pool (reference model.py:83-112)."""

    out_channels: int | None = None
    with_conv: bool = True
    dtype: jnp.dtype | None = None
    quantized: bool = False
    winograd: bool = False

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            features = self.out_channels if self.out_channels is not None else x.shape[-1]
            return _conv(features, 3, stride=2, dtype=self.dtype, name="conv",
                         quantized=self.quantized, winograd=self.winograd)(x)
        return avg_pool_2x(x)


class ResidualBlock(nn.Module):
    """BigGAN-style residual block with timestep conditioning.

    Mirrors reference model.py:117-211: GN+SiLU -> optional in-block
    up/down resample of both paths (conv-less) -> 3x3 conv; timestep embedding
    through SiLU -> Linear, injected either as AdaGN scale-shift or additively
    before the second GN; SiLU -> dropout -> zero-init 3x3 conv; skip is
    identity / 1x1 conv / 3x3 conv depending on channel match and use_conv.
    """

    out_channels: int | None = None
    upsample: bool = False
    downsample: bool = False
    use_conv: bool = False
    use_adaptive_gn: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype | None = None
    quantized: bool = False
    winograd: bool = False

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        # `deterministic` is positional (not kw-only) so nn.remat can mark it
        # static (jax.checkpoint static_argnums only covers positional args)
        in_ch = x.shape[-1]
        out_ch = self.out_channels if self.out_channels is not None else in_ch

        h = GroupNormOp(in_ch, mode="silu", name="in_norm")(x)
        if self.upsample:
            h = upsample_nearest_2x(h)
            x = upsample_nearest_2x(x)
        elif self.downsample:
            h = avg_pool_2x(h)
            x = avg_pool_2x(x)
        h = _conv(out_ch, 3, dtype=self.dtype, name="in_conv",
                  quantized=self.quantized, winograd=self.winograd)(h)

        # timestep embedding: SiLU then Linear (reference model.py:197)
        emb = nn.silu(emb)
        if self.use_adaptive_gn:
            emb = nn.Dense(2 * out_ch, dtype=self.dtype, name="step_embedding")(emb)
            emb_scale, emb_shift = jnp.split(emb, 2, axis=-1)
            h = GroupNormOp(out_ch, mode="ada", name="out_norm")(
                h, emb_scale, emb_shift
            )
        else:
            emb = nn.Dense(out_ch, dtype=self.dtype, name="step_embedding")(emb)
            h = h + emb[:, None, None, :].astype(h.dtype)
            h = GroupNormOp(out_ch, mode="silu", name="out_norm")(h)

        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = _conv(out_ch, 3, zero_init=True, dtype=self.dtype,
                  name="out_conv", quantized=self.quantized, winograd=self.winograd)(h)

        if out_ch == in_ch:
            skip = x
        elif self.use_conv:
            skip = _conv(out_ch, 3, dtype=self.dtype, name="skip",
                         quantized=self.quantized, winograd=self.winograd)(x)
        else:
            skip = _conv(out_ch, 1, dtype=self.dtype, name="skip",
                         quantized=self.quantized, winograd=self.winograd)(x)
        return h + skip


class AttentionBlock(nn.Module):
    """Pre-norm multi-head self-attention over flattened HW tokens.

    Mirrors reference model.py:214-291; num_head_channels supersedes
    num_heads when given (model.py:236-242); zero-init output projection with
    residual add.
    """

    num_heads: int = 1
    num_head_channels: int | None = None
    split_qkv_first: bool = True
    dtype: jnp.dtype | None = None
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        if self.num_head_channels is None:
            heads = self.num_heads
        else:
            assert c % self.num_head_channels == 0, (
                f"channels {c} not divisible by num_head_channels "
                f"{self.num_head_channels}"
            )
            heads = c // self.num_head_channels

        h = GroupNormOp(c, mode="plain", name="norm")(x)
        h = h.reshape(b, hh * ww, c)
        if self.quantized:
            qkv = Int8Dense(3 * c, dtype=self.dtype, name="qkv_nin")(h)
        else:
            qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv_nin")(h)
        h = qkv_attention(qkv, heads, self.split_qkv_first)
        if self.quantized:
            h = Int8Dense(
                c, zero_init=True, dtype=self.dtype, name="proj_out"
            )(h)
        else:
            h = nn.Dense(
                c, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                name="proj_out",
            )(h)
        return x + h.reshape(b, hh, ww, c)


def _is_res_block(layer) -> bool:
    # nn.remat(ResidualBlock) produces a subclass, so isinstance covers both
    return isinstance(layer, ResidualBlock)


class StepSequential(nn.Module):
    """Sequential that passes the step embedding to step-aware children.

    Analogue of reference UsesStepsSequential (model.py:40-48). Children are
    named ``layers_{i}`` to mirror torch Sequential indices.
    """

    layers: Sequence[nn.Module]

    def __call__(self, x, emb, deterministic: bool = True):
        for layer in self.layers:
            if _is_res_block(layer):
                x = layer(x, emb, deterministic)
            else:
                x = layer(x)
        return x


class EmbedMLP(nn.Module):
    """Linear -> SiLU -> Linear timestep-embedding MLP (model.py:348-352).

    Children named layers_0 / layers_2 to mirror torch Sequential indices.
    """

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, dtype=self.dtype, name="layers_0")(x)
        x = nn.silu(x)
        return nn.Dense(self.features, dtype=self.dtype, name="layers_2")(x)


class OutHead(nn.Module):
    """GN -> SiLU -> zero-init 3x3 conv output head (model.py:445-449)."""

    features: int
    out_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = GroupNormOp(self.features, mode="silu", name="layers_0")(x)
        return _conv(
            self.out_channels, 3, zero_init=True, dtype=self.dtype, name="layers_2"
        )(x)


class DiffusionModel(nn.Module):
    """UNet epsilon predictor (reference model.py:294-476), NHWC.

    forward: (x[B,H,W,Cin], timestep[B], y[B] or None) -> [B,H,W,Cout].
    ``timestep`` is the *original-chain* timestep (the diffusion engine maps
    rescaled indices through timestep_map before calling the model).
    """

    resolution: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: int | None = None
    num_heads: int = 1
    num_head_channels: int | None = None
    resblock_updown: bool = False
    use_adaptive_gn: bool = False
    split_qkv_first: bool = True
    use_remat: bool = False
    dtype: jnp.dtype | None = None
    # int8 serving fast path: conv compute via int8 MXU MACs (ops/quant.py;
    # calibrate->freeze->serve for static scales, dynamic fallback
    # otherwise). Opt-in, lossy; the stem/head convs and attention stay in
    # the float path. Parameters are unchanged.
    quantized: bool = False
    # Additionally quantize the attention qkv/proj projections (Int8Dense).
    # Measured perf-NEUTRAL on the v5e chip (DDPM-250 CFG int8: 1.5493 vs
    # 1.5465 samples/sec — within noise; the projections are a small slice
    # of the FLOPs), so it defaults OFF to avoid adding quantization noise
    # for no speed gain. Kept as a measured ablation (BASELINE.md).
    quantized_attention: bool = False
    # Winograd F(2x2,3x3) path for stride-1 3x3 convs (ops/winograd.py):
    # 2.25x fewer MACs but measured SLOWER than XLA's direct conv in-model
    # (ablation — see ops/winograd.py). Opt-in for reproduction only.
    winograd: bool = False

    @property
    def conditional(self) -> bool:
        return self.num_classes is not None

    def setup(self):
        step_embed_dim = 4 * self.model_channels
        dtype = self.dtype
        # static_argnums=(3,) marks `deterministic` ((self, x, emb, det)) as
        # a static python bool for jax.checkpoint
        res_block = (
            nn.remat(ResidualBlock, static_argnums=(3,))
            if self.use_remat else ResidualBlock
        )
        attn_block = nn.remat(AttentionBlock) if self.use_remat else AttentionBlock

        self.step_embed = EmbedMLP(step_embed_dim, dtype=dtype)
        if self.conditional:
            self.class_embedding = nn.Embed(self.num_classes, step_embed_dim)

        def make_res(in_ch=None, out_ch=None, up=False, down=False):
            del in_ch  # flax infers input channels at call time
            return res_block(
                out_channels=out_ch,
                upsample=up,
                downsample=down,
                use_adaptive_gn=self.use_adaptive_gn,
                dropout=self.dropout,
                dtype=dtype,
                quantized=self.quantized,
                winograd=self.winograd,
            )

        def make_attn():
            return attn_block(
                num_heads=self.num_heads,
                num_head_channels=self.num_head_channels,
                split_qkv_first=self.split_qkv_first,
                dtype=dtype,
                quantized=self.quantized and self.quantized_attention,
            )

        # ---- encoder (reference model.py:363-402) ----
        curr_channels = input_channels = int(self.model_channels * self.channel_mult[0])
        curr_res = self.resolution
        downsampling = [
            StepSequential(
                [_conv(curr_channels, 3, dtype=dtype, winograd=self.winograd)]
            )
        ]
        input_block_channels = [curr_channels]
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                layers = [make_res(out_ch=int(self.model_channels * mult))]
                curr_channels = int(self.model_channels * mult)
                if curr_res in self.attention_resolutions:
                    layers.append(make_attn())
                input_block_channels.append(curr_channels)
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
                                        with_conv=self.conv_resample, dtype=dtype,
                                        quantized=self.quantized, winograd=self.winograd)]
                        )
                    )
                input_block_channels.append(curr_channels)
                curr_res //= 2
        self.downsampling = downsampling

        # ---- middle (reference model.py:404-412) ----
        self.middle_block = StepSequential(
            [make_res(), make_attn(), make_res()]
        )

        # ---- decoder (reference model.py:414-443) ----
        upsampling = []
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                input_block_channels.pop()
                layers = [make_res(out_ch=int(self.model_channels * mult))]
                curr_channels = int(self.model_channels * mult)
                if curr_res in self.attention_resolutions:
                    layers.append(make_attn())
                if level != 0 and i == self.num_res_blocks:
                    if self.resblock_updown:
                        layers.append(make_res(out_ch=curr_channels, up=True))
                    else:
                        layers.append(
                            Upsample(out_channels=curr_channels,
                                     with_conv=self.conv_resample, dtype=dtype,
                                     quantized=self.quantized, winograd=self.winograd)
                        )
                    curr_res *= 2
                upsampling.append(StepSequential(layers))
        self.upsampling = upsampling

        self.out = OutHead(input_channels, self.out_channels, dtype=dtype)

    # The forward pass is split into embed / encode / decode so the sampling
    # engine can cache encoder features across adjacent timesteps
    # ("Faster Diffusion", arXiv:2312.09608 — encoder activations vary
    # slowly in t; decoder + skip concats carry most of the per-step
    # change). __call__ composes them and is bitwise-identical to the
    # monolithic forward.

    def embed(self, timestep, y=None):
        """Timestep (+ class) embedding [B, 4*model_channels]."""
        assert (y is not None) == self.conditional, "pass y iff class-conditional"
        emb = self.step_embed(timestep_embedding(timestep, self.model_channels))
        if self.conditional:
            emb = emb + self.class_embedding(y)
        return emb

    def encode(self, x, emb, deterministic: bool = True):
        """Encoder stack -> (bottom feature, all skip activations)."""
        x = x.astype(self.dtype or x.dtype)
        xs = []
        for module in self.downsampling:
            x = module(x, emb, deterministic=deterministic)
            xs.append(x)
        return x, xs

    def decode(self, h, xs, emb, deterministic: bool = True):
        """Middle + decoder + head, consuming the encoder skips."""
        xs = list(xs)
        h = self.middle_block(h, emb, deterministic=deterministic)
        for module in self.upsampling:
            h = jnp.concatenate([h, xs.pop()], axis=-1)
            h = module(h, emb, deterministic=deterministic)
        return self.out(h).astype(jnp.float32)

    def __call__(self, x, timestep, y=None, *, deterministic: bool = True):
        emb = self.embed(timestep, y)
        h, xs = self.encode(x, emb, deterministic=deterministic)
        return self.decode(h, xs, emb, deterministic=deterministic)


class SuperResolutionModel(DiffusionModel):
    """Super-resolution UNet conditioned on a bilinearly-upsampled low-res
    image, channel-concatenated to the input (reference model.py:479-499).

    Construct with ``in_channels = 2 * image_channels`` (the converter and
    config layer handle the doubling, mirroring model.py:492).
    """

    def __call__(self, x, timestep, low_res=None, y=None, *, deterministic=True):
        assert low_res is not None, "must pass low_res to SuperResolutionModel"
        _, h, w, _ = x.shape
        upsampled = resize_bilinear(low_res, h, w)
        x = jnp.concatenate([x, upsampled], axis=-1)
        return super().__call__(x, timestep, y, deterministic=deterministic)
