"""AutoencoderKL with temporal decoder (SVD VAE), NHWC.

Parity target: diffusers AutoencoderKLTemporalDecoder as used by the reference SVD
pipeline (`svd/pipelines/svd_controlnet_adapter_pipeline.py:265-292` chunked decode):
standard 2D encoder + quant_conv; decoder with spatio-temporal res blocks
(merge_strategy="learned", switch_spatial_to_temporal_mix=True, temb-free) and a final
(3,1,1) time conv. There is NO post_quant_conv in this VAE.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.resnet import Upsample2D, group_norm
from ..nn.unet_st_blocks import SpatioTemporalResBlock
from .vae import Encoder, VAEAttention, VAEConfig


class MidBlockTemporalDecoder(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    attention_head_dim: int = 512
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, image_only_indicator: jnp.ndarray) -> jnp.ndarray:
        resnet = lambda i, ch_in: SpatioTemporalResBlock(  # noqa: E731
            in_channels=ch_in, out_channels=self.out_channels, eps=1e-6, temporal_eps=1e-5,
            merge_factor=0.0, merge_strategy="learned", switch_spatial_to_temporal_mix=True,
            name=f"resnets_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
        )
        x = resnet(0, self.in_channels)(x, None, image_only_indicator)
        for i in range(1, self.num_layers):
            x = VAEAttention(self.out_channels, name="attentions_0",
                             dtype=self.dtype, param_dtype=self.param_dtype)(x)
            x = resnet(i, self.out_channels)(x, None, image_only_indicator)
        return x


class UpBlockTemporalDecoder(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, image_only_indicator: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels, eps=1e-6, temporal_eps=1e-5,
                merge_factor=0.0, merge_strategy="learned",
                switch_spatial_to_temporal_mix=True,
                name=f"resnets_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(x, None, image_only_indicator)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, use_conv=True, name="upsamplers_0",
                           dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return x


class TemporalDecoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        cfg = self.config
        mid_ch = cfg.block_out_channels[-1]
        bf = z.shape[0]
        b = bf // num_frames
        image_only_indicator = jnp.zeros((b, num_frames), jnp.float32)

        x = nn.Conv(mid_ch, (3, 3), padding=((1, 1), (1, 1)), name="conv_in",
                    dtype=self.dtype, param_dtype=self.param_dtype)(z)
        x = MidBlockTemporalDecoder(
            mid_ch, mid_ch, num_layers=cfg.layers_per_block,
            attention_head_dim=mid_ch, name="mid_block",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x, image_only_indicator)

        reversed_channels = list(reversed(cfg.block_out_channels))
        output_channel = reversed_channels[0]
        for i, ch in enumerate(reversed_channels):
            prev_channel = output_channel
            output_channel = ch
            x = UpBlockTemporalDecoder(
                in_channels=prev_channel, out_channels=output_channel,
                num_layers=cfg.layers_per_block + 1,
                add_upsample=i != len(reversed_channels) - 1,
                name=f"up_blocks_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(x, image_only_indicator)

        x = group_norm(cfg.norm_num_groups, 1e-6, "conv_norm_out", self.dtype,
                       self.param_dtype)(x, silu=True)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv_out",
                    dtype=self.dtype, param_dtype=self.param_dtype)(x)

        # final temporal conv over frames: (b*f, h, w, 3) -> (b, f, h, w, 3)
        h, w = x.shape[1], x.shape[2]
        x5 = x.reshape(b, num_frames, h, w, cfg.out_channels)
        x5 = nn.Conv(cfg.out_channels, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                     name="time_conv_out", dtype=self.dtype, param_dtype=self.param_dtype)(x5)
        return x5.reshape(bf, h, w, cfg.out_channels)


class AutoencoderKLTemporalDecoder(nn.Module):
    config: VAEConfig = field(default_factory=VAEConfig)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.decoder = TemporalDecoder(self.config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype, param_dtype=self.param_dtype)

    def encode_moments(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x: jnp.ndarray, noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        mean, logvar = self.encode_moments(x)
        if noise is None:
            return mean
        return mean + jnp.exp(0.5 * logvar) * noise

    def decode(self, z: jnp.ndarray, num_frames: int = 1) -> jnp.ndarray:
        """z: (b*f, h, w, 4) unscaled latents -> (b*f, 8h, 8w, 3)."""
        return self.decoder(z, num_frames)

    def __call__(self, x: jnp.ndarray, num_frames: int = 1) -> jnp.ndarray:  # init helper
        mean, _ = self.encode_moments(x)
        return self.decode(mean, num_frames)
