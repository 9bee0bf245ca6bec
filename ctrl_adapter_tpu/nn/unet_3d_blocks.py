"""3D UNet building blocks for I2VGen-XL (NHWC, frames folded into batch).

Behavioral parity with diffusers' unet_3d_blocks as instantiated by the reference's
forked I2VGenXLUNet (`i2vgen_xl/models/unets/unet_i2vgen_xl.py:30-38,241-316`):
``TemporalConvLayer``, ``TransformerTemporalModel``, ``{CrossAttn,}DownBlock3D``,
``UNetMidBlock3DCrossAttn``, ``{CrossAttn,}UpBlock3D``.

Layout: hidden states are (batch*frames, h, w, c); temporal ops reshape to
(batch, frames, h, w, c) — channel axis never moves, so XLA keeps conv layouts stable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .attention import BasicTransformerBlock
from .resnet import Downsample2D, ResnetBlock2D, Upsample2D, group_norm
from .unet_blocks import Transformer2DModel


class TemporalConvLayer(nn.Module):
    """4-stage (3,1,1) conv residual block over the frame axis, zero-init final conv.

    Parity: diffusers TemporalConvLayer (conv1 in->out, conv2 out->in, conv3/4 in->in,
    conv4 zero-initialised so a fresh layer is identity).
    """

    in_dim: int
    out_dim: Optional[int] = None
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        out_dim = self.out_dim or self.in_dim
        bf, h, w, c = hidden_states.shape
        b = bf // num_frames
        x = hidden_states.reshape(b, num_frames, h, w, c)
        identity = x

        # Names mirror torch nn.Sequential indices: conv1 = (GN, SiLU, Conv) -> .0/.2;
        # conv2..4 = (GN, SiLU, Dropout, Conv) -> .0/.3.
        def stage(x, ch_out, idx, conv_pos, zero=False):
            x = group_norm(self.norm_num_groups, 1e-5, f"conv{idx}_0", self.dtype,
                           self.param_dtype)(x, silu=True)
            return nn.Conv(
                ch_out, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                name=f"conv{idx}_{conv_pos}",
                kernel_init=nn.initializers.zeros if zero else nn.initializers.lecun_normal(),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(x)

        x = stage(x, out_dim, 1, 2)
        x = stage(x, self.in_dim, 2, 3)
        x = stage(x, self.in_dim, 3, 3)
        x = stage(x, self.in_dim, 4, 3, zero=True)
        x = identity + x
        return x.reshape(bf, h, w, c)


class TransformerTemporalModel(nn.Module):
    """Per-pixel temporal transformer: GroupNorm (over b,f,h,w) -> proj_in ->
    BasicTransformerBlocks over the frame axis -> proj_out (+residual)."""

    num_attention_heads: int
    attention_head_dim: int
    in_channels: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (b*f, h, w, c)
        num_frames: int,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        bf, h, w, c = hidden_states.shape
        b = bf // num_frames
        inner_dim = self.num_attention_heads * self.attention_head_dim
        residual = hidden_states

        x = hidden_states.reshape(b, num_frames, h, w, c)
        # GroupNorm statistics over (frames, h, w, channel-group) per sample —
        # matching torch GroupNorm on (b, c, f, h, w).
        x = group_norm(self.norm_num_groups, 1e-6, "norm", self.dtype, self.param_dtype)(
            x
        ).astype(hidden_states.dtype)
        # (b, f, h, w, c) -> (b*h*w, f, c): frames are the sequence.
        x = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, num_frames, c)
        x = nn.Dense(inner_dim, name="proj_in", dtype=self.dtype, param_dtype=self.param_dtype)(x)

        for i in range(self.num_layers):
            x = BasicTransformerBlock(
                dim=inner_dim,
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                name=f"transformer_blocks_{i}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x, encoder_hidden_states=encoder_hidden_states)

        x = nn.Dense(c, name="proj_out", dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = x.reshape(b, h, w, num_frames, c).transpose(0, 3, 1, 2, 4).reshape(bf, h, w, c)
        return x + residual


class DownBlock3D(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    resnet_eps: float = 1e-5
    resnet_groups: int = 32
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, num_frames: int):
        output_states = ()
        for i in range(self.num_layers):
            hidden_states = ResnetBlock2D(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                temb_channels=temb.shape[-1],
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                name=f"resnets_{i}",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, temb)
            hidden_states = TemporalConvLayer(
                self.out_channels, self.out_channels, norm_num_groups=self.resnet_groups,
                name=f"temp_convs_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, num_frames)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = Downsample2D(
                self.out_channels, name="downsamplers_0",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class CrossAttnDownBlock3D(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    num_attention_heads: int = 8  # interpreted as head_dim divisor: heads = out/head_dim
    cross_attention_dim: int = 1024
    resnet_eps: float = 1e-5
    resnet_groups: int = 32
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, encoder_hidden_states, num_frames: int):
        # diffusers 3D blocks: Transformer2DModel(out//nah, nah) -> heads = out/head_dim
        heads = self.out_channels // self.num_attention_heads
        head_dim = self.num_attention_heads
        output_states = ()
        for i in range(self.num_layers):
            hidden_states = ResnetBlock2D(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                temb_channels=temb.shape[-1],
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                name=f"resnets_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, temb)
            hidden_states = TemporalConvLayer(
                self.out_channels, self.out_channels, norm_num_groups=self.resnet_groups,
                name=f"temp_convs_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, num_frames)
            hidden_states = Transformer2DModel(
                num_attention_heads=heads,
                attention_head_dim=head_dim,
                in_channels=self.out_channels,
                num_layers=1,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups,
                name=f"attentions_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, encoder_hidden_states)
            hidden_states = TransformerTemporalModel(
                num_attention_heads=heads,
                attention_head_dim=head_dim,
                in_channels=self.out_channels,
                norm_num_groups=self.resnet_groups,
                name=f"temp_attentions_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, num_frames)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = Downsample2D(
                self.out_channels, name="downsamplers_0",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class UNetMidBlock3DCrossAttn(nn.Module):
    in_channels: int
    num_layers: int = 1
    num_attention_heads: int = 8  # head_dim (see CrossAttnDownBlock3D)
    cross_attention_dim: int = 1024
    resnet_eps: float = 1e-5
    resnet_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, encoder_hidden_states, num_frames: int):
        heads = self.in_channels // self.num_attention_heads
        head_dim = self.num_attention_heads
        resnet = lambda name: ResnetBlock2D(  # noqa: E731
            in_channels=self.in_channels, out_channels=self.in_channels,
            temb_channels=temb.shape[-1], eps=self.resnet_eps, groups=self.resnet_groups,
            name=name, dtype=self.dtype, param_dtype=self.param_dtype,
        )
        temp_conv = lambda name: TemporalConvLayer(  # noqa: E731
            self.in_channels, self.in_channels, norm_num_groups=self.resnet_groups,
            name=name, dtype=self.dtype, param_dtype=self.param_dtype,
        )
        hidden_states = resnet("resnets_0")(hidden_states, temb)
        hidden_states = temp_conv("temp_convs_0")(hidden_states, num_frames)
        for i in range(self.num_layers):
            hidden_states = Transformer2DModel(
                num_attention_heads=heads, attention_head_dim=head_dim,
                in_channels=self.in_channels, num_layers=1,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups,
                name=f"attentions_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, encoder_hidden_states)
            hidden_states = TransformerTemporalModel(
                num_attention_heads=heads, attention_head_dim=head_dim,
                in_channels=self.in_channels, norm_num_groups=self.resnet_groups,
                name=f"temp_attentions_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, num_frames)
            hidden_states = resnet(f"resnets_{i + 1}")(hidden_states, temb)
            hidden_states = temp_conv(f"temp_convs_{i + 1}")(hidden_states, num_frames)
        return hidden_states


class UpBlock3D(nn.Module):
    in_channels: int
    prev_output_channel: int
    out_channels: int
    num_layers: int = 3
    resnet_eps: float = 1e-5
    resnet_groups: int = 32
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, res_hidden_states_tuple, temb, num_frames: int,
                 upsample_size=None):
        for i in range(self.num_layers):
            res_skip_channels = self.in_channels if (i == self.num_layers - 1) else self.out_channels
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            res_hidden = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden], axis=-1)
            hidden_states = ResnetBlock2D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels,
                temb_channels=temb.shape[-1], eps=self.resnet_eps, groups=self.resnet_groups,
                name=f"resnets_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, temb)
            hidden_states = TemporalConvLayer(
                self.out_channels, self.out_channels, norm_num_groups=self.resnet_groups,
                name=f"temp_convs_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, num_frames)
        if self.add_upsample:
            hidden_states = Upsample2D(
                self.out_channels, use_conv=True, name="upsamplers_0",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, upsample_size)
        return hidden_states


class CrossAttnUpBlock3D(nn.Module):
    in_channels: int
    prev_output_channel: int
    out_channels: int
    num_layers: int = 3
    num_attention_heads: int = 8  # head_dim (see CrossAttnDownBlock3D)
    cross_attention_dim: int = 1024
    resnet_eps: float = 1e-5
    resnet_groups: int = 32
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, res_hidden_states_tuple, temb, encoder_hidden_states,
                 num_frames: int, upsample_size=None):
        heads = self.out_channels // self.num_attention_heads
        head_dim = self.num_attention_heads
        for i in range(self.num_layers):
            res_skip_channels = self.in_channels if (i == self.num_layers - 1) else self.out_channels
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            res_hidden = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden], axis=-1)
            hidden_states = ResnetBlock2D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels,
                temb_channels=temb.shape[-1], eps=self.resnet_eps, groups=self.resnet_groups,
                name=f"resnets_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, temb)
            hidden_states = TemporalConvLayer(
                self.out_channels, self.out_channels, norm_num_groups=self.resnet_groups,
                name=f"temp_convs_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, num_frames)
            hidden_states = Transformer2DModel(
                num_attention_heads=heads, attention_head_dim=head_dim,
                in_channels=self.out_channels, num_layers=1,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups,
                name=f"attentions_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, encoder_hidden_states)
            hidden_states = TransformerTemporalModel(
                num_attention_heads=heads, attention_head_dim=head_dim,
                in_channels=self.out_channels, norm_num_groups=self.resnet_groups,
                name=f"temp_attentions_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, num_frames)
        if self.add_upsample:
            hidden_states = Upsample2D(
                self.out_channels, use_conv=True, name="upsamplers_0",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, upsample_size)
        return hidden_states
