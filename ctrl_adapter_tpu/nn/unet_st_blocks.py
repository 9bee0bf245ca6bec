"""Spatio-temporal UNet blocks for SVD (NHWC, frames folded into batch).

Behavioral parity with diffusers' SpatioTemporalResBlock / TransformerSpatioTemporalModel
and the {CrossAttn,}{Down,Up}BlockSpatioTemporal / UNetMidBlockSpatioTemporal family as
instantiated by the reference's forked SVD UNet
(`svd/models/unets/unet_spatio_temporal_condition.py:160-246,437-513`).

Note the diffusers eps asymmetry kept here: plain down/up spatio-temporal blocks use
resnet eps 1e-5; cross-attention blocks use 1e-6.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .attention import BasicTransformerBlock, TemporalBasicTransformerBlock
from .embeddings import TimestepEmbedding, get_timestep_embedding
from .resnet import (
    AlphaBlender,
    Downsample2D,
    ResnetBlock2D,
    TemporalResnetBlock,
    Upsample2D,
    group_norm,
)


class SpatioTemporalResBlock(nn.Module):
    """Spatial ResnetBlock2D -> temporal TemporalResnetBlock -> learned AlphaBlender."""

    in_channels: int
    out_channels: Optional[int] = None
    eps: float = 1e-6
    temporal_eps: Optional[float] = None
    merge_factor: float = 0.5
    merge_strategy: str = "learned_with_images"
    switch_spatial_to_temporal_mix: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (b*f, h, w, c)
        temb: Optional[jnp.ndarray],  # (b*f, d)
        image_only_indicator: jnp.ndarray,  # (b, f)
    ) -> jnp.ndarray:
        out_channels = self.out_channels or self.in_channels
        num_frames = image_only_indicator.shape[-1]

        hidden_states = ResnetBlock2D(
            in_channels=self.in_channels,
            out_channels=out_channels,
            temb_channels=None if temb is None else temb.shape[-1],
            eps=self.eps,
            name="spatial_res_block",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(hidden_states, temb)

        bf, h, w, c = hidden_states.shape
        b = bf // num_frames
        hs_5d = hidden_states.reshape(b, num_frames, h, w, c)
        temb_3d = None if temb is None else temb.reshape(b, num_frames, -1)
        temporal = TemporalResnetBlock(
            in_channels=out_channels,
            out_channels=out_channels,
            temb_channels=None if temb is None else temb.shape[-1],
            eps=self.temporal_eps if self.temporal_eps is not None else self.eps,
            name="temporal_res_block",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(hs_5d, temb_3d)
        mixed = AlphaBlender(
            alpha=self.merge_factor, merge_strategy=self.merge_strategy,
            switch_spatial_to_temporal_mix=self.switch_spatial_to_temporal_mix,
            name="time_mixer",
        )(hs_5d, temporal, image_only_indicator)
        return mixed.reshape(bf, h, w, c)


class TransformerSpatioTemporalModel(nn.Module):
    """Spatial + temporal transformer pair with frame positional embedding and learned
    time mixing — the structure the Ctrl-Adapter blocks mimic."""

    num_attention_heads: int
    attention_head_dim: int
    in_channels: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (b*f, h, w, c)
        encoder_hidden_states: jnp.ndarray,  # (b*f, 1, cross)
        image_only_indicator: jnp.ndarray,  # (b, f)
    ) -> jnp.ndarray:
        bf, h, w, c = hidden_states.shape
        num_frames = image_only_indicator.shape[-1]
        b = bf // num_frames
        inner_dim = self.num_attention_heads * self.attention_head_dim
        residual = hidden_states

        # time context: first-frame embedding broadcast over pixels
        tc_first = encoder_hidden_states.reshape(
            b, num_frames, -1, encoder_hidden_states.shape[-1]
        )[:, 0]  # (b, n, d)
        time_context = jnp.broadcast_to(
            tc_first[None], (h * w, b, tc_first.shape[1], tc_first.shape[2])
        ).reshape(h * w * b, -1, tc_first.shape[2])

        x = group_norm(32, 1e-6, "norm", self.dtype, self.param_dtype)(
            hidden_states
        ).astype(hidden_states.dtype)
        x = x.reshape(bf, h * w, c)
        x = nn.Dense(inner_dim, name="proj_in", dtype=self.dtype, param_dtype=self.param_dtype)(x)

        # frame-index positional embedding
        frame_idx = jnp.tile(jnp.arange(num_frames, dtype=jnp.float32), b)
        emb = get_timestep_embedding(frame_idx, self.in_channels, flip_sin_to_cos=True,
                                     downscale_freq_shift=0.0)
        emb = TimestepEmbedding(
            self.in_channels * 4, out_dim=self.in_channels, name="time_pos_embed",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(emb.astype(self.dtype))
        emb = emb[:, None, :]

        for i in range(self.num_layers):
            x = BasicTransformerBlock(
                dim=inner_dim,
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                name=f"transformer_blocks_{i}",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(x, encoder_hidden_states=encoder_hidden_states)

            x_mix = x + emb
            x_mix = TemporalBasicTransformerBlock(
                dim=inner_dim,
                time_mix_inner_dim=inner_dim,
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                name=f"temporal_transformer_blocks_{i}",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(x_mix, num_frames=num_frames, encoder_hidden_states=time_context)
            x = AlphaBlender(alpha=0.5, merge_strategy="learned_with_images",
                             name="time_mixer")(x, x_mix, image_only_indicator)

        x = nn.Dense(c, name="proj_out", dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return x.reshape(bf, h, w, c) + residual


class DownBlockSpatioTemporal(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, image_only_indicator):
        output_states = ()
        for i in range(self.num_layers):
            hidden_states = SpatioTemporalResBlock(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels, eps=1e-5,
                name=f"resnets_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, temb, image_only_indicator)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = Downsample2D(
                self.out_channels, name="downsamplers_0",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class CrossAttnDownBlockSpatioTemporal(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    transformer_layers_per_block: int = 1
    num_attention_heads: int = 5
    cross_attention_dim: int = 1024
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, encoder_hidden_states, image_only_indicator):
        output_states = ()
        for i in range(self.num_layers):
            hidden_states = SpatioTemporalResBlock(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels, eps=1e-6,
                name=f"resnets_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, temb, image_only_indicator)
            hidden_states = TransformerSpatioTemporalModel(
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.out_channels // self.num_attention_heads,
                in_channels=self.out_channels,
                num_layers=self.transformer_layers_per_block,
                cross_attention_dim=self.cross_attention_dim,
                name=f"attentions_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, encoder_hidden_states, image_only_indicator)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = Downsample2D(
                self.out_channels, name="downsamplers_0",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class UNetMidBlockSpatioTemporal(nn.Module):
    in_channels: int
    num_layers: int = 1
    transformer_layers_per_block: int = 1
    num_attention_heads: int = 20
    cross_attention_dim: int = 1024
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, encoder_hidden_states, image_only_indicator):
        resnet = lambda name: SpatioTemporalResBlock(  # noqa: E731
            in_channels=self.in_channels, out_channels=self.in_channels, eps=1e-5,
            name=name, dtype=self.dtype, param_dtype=self.param_dtype,
        )
        hidden_states = resnet("resnets_0")(hidden_states, temb, image_only_indicator)
        for i in range(self.num_layers):
            hidden_states = TransformerSpatioTemporalModel(
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.in_channels // self.num_attention_heads,
                in_channels=self.in_channels,
                num_layers=self.transformer_layers_per_block,
                cross_attention_dim=self.cross_attention_dim,
                name=f"attentions_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, encoder_hidden_states, image_only_indicator)
            hidden_states = resnet(f"resnets_{i + 1}")(hidden_states, temb, image_only_indicator)
        return hidden_states


class UpBlockSpatioTemporal(nn.Module):
    in_channels: int
    prev_output_channel: int
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, res_hidden_states_tuple, temb, image_only_indicator):
        for i in range(self.num_layers):
            res_skip_channels = self.in_channels if (i == self.num_layers - 1) else self.out_channels
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            res_hidden = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden], axis=-1)
            hidden_states = SpatioTemporalResBlock(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels, eps=1e-5,
                name=f"resnets_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, temb, image_only_indicator)
        if self.add_upsample:
            hidden_states = Upsample2D(
                self.out_channels, use_conv=True, name="upsamplers_0",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states)
        return hidden_states


class CrossAttnUpBlockSpatioTemporal(nn.Module):
    in_channels: int
    prev_output_channel: int
    out_channels: int
    num_layers: int = 3
    transformer_layers_per_block: int = 1
    num_attention_heads: int = 5
    cross_attention_dim: int = 1024
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, res_hidden_states_tuple, temb, encoder_hidden_states,
                 image_only_indicator):
        for i in range(self.num_layers):
            res_skip_channels = self.in_channels if (i == self.num_layers - 1) else self.out_channels
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            res_hidden = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden], axis=-1)
            hidden_states = SpatioTemporalResBlock(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels, eps=1e-6,
                name=f"resnets_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, temb, image_only_indicator)
            hidden_states = TransformerSpatioTemporalModel(
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.out_channels // self.num_attention_heads,
                in_channels=self.out_channels,
                num_layers=self.transformer_layers_per_block,
                cross_attention_dim=self.cross_attention_dim,
                name=f"attentions_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states, encoder_hidden_states, image_only_indicator)
        if self.add_upsample:
            hidden_states = Upsample2D(
                self.out_channels, use_conv=True, name="upsamplers_0",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states)
        return hidden_states
