"""AutoencoderKL (SD VAE), NHWC — encode/decode for SDXL, SD-v1.5 and I2VGen-XL.

Behavioral parity with diffusers AutoencoderKL as used by the reference for latent
encode at train time (`train.py:1027-1048`) and decode at inference
(`sdxl_controlnet_adapter_pipeline.py:1406-1418`, chunked video decode
`i2vgen_xl_controlnet_adapter_pipeline.py:398-418`).

TPU notes: encode/decode jit as standalone programs; the VAE mid-block attention is a
single-head full attention over (h/8*w/8) tokens — fine for 64-128 spatial. Chunked
video decode is handled at the pipeline level to bound memory.
Module nesting mirrors the diffusers state-dict layout for mechanical conversion.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.resnet import Downsample2D, ResnetBlock2D, Upsample2D, group_norm


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215  # 0.13025 for SDXL


class VAEAttention(nn.Module):
    """Single-head attention block in the VAE mid (diffusers Attention with
    residual_connection=True, biased QKV, spatial GroupNorm)."""

    channels: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        residual = x
        hidden = group_norm(self.norm_num_groups, 1e-6, "group_norm", self.dtype,
                            self.param_dtype)(x).astype(x.dtype)
        hidden = hidden.reshape(n, h * w, c)
        dense = lambda name: nn.Dense(  # noqa: E731
            c, name=name, dtype=self.dtype, param_dtype=self.param_dtype
        )
        q = dense("to_q")(hidden)[:, :, None, :]
        k = dense("to_k")(hidden)[:, :, None, :]
        v = dense("to_v")(hidden)[:, :, None, :]
        out = jax.nn.dot_product_attention(q, k, v)[:, :, 0, :]
        out = dense("to_out_0")(out)
        return out.reshape(n, h, w, c) + residual


class DownEncoderBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j in range(self.num_layers):
            x = ResnetBlock2D(
                in_channels=self.in_channels if j == 0 else self.out_channels,
                out_channels=self.out_channels,
                temb_channels=None, eps=1e-6, groups=self.norm_num_groups,
                name=f"resnets_{j}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(x, None)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, padding=0, name="downsamplers_0",
                             dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return x


class UpDecoderBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j in range(self.num_layers):
            x = ResnetBlock2D(
                in_channels=self.in_channels if j == 0 else self.out_channels,
                out_channels=self.out_channels,
                temb_channels=None, eps=1e-6, groups=self.norm_num_groups,
                name=f"resnets_{j}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(x, None)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, use_conv=True, name="upsamplers_0",
                           dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return x


class VAEMidBlock(nn.Module):
    channels: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        resnet = lambda name: ResnetBlock2D(  # noqa: E731
            in_channels=self.channels, out_channels=self.channels, temb_channels=None,
            eps=1e-6, groups=self.norm_num_groups, name=name,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        x = resnet("resnets_0")(x, None)
        x = VAEAttention(self.channels, self.norm_num_groups, name="attentions_0",
                         dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = resnet("resnets_1")(x, None)
        return x


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    name="conv_in", dtype=self.dtype, param_dtype=self.param_dtype)(x)
        output_channel = cfg.block_out_channels[0]
        for i, ch in enumerate(cfg.block_out_channels):
            input_channel = output_channel
            output_channel = ch
            x = DownEncoderBlock2D(
                in_channels=input_channel, out_channels=output_channel,
                num_layers=cfg.layers_per_block,
                add_downsample=i != len(cfg.block_out_channels) - 1,
                norm_num_groups=cfg.norm_num_groups,
                name=f"down_blocks_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(x)
        x = VAEMidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups, name="mid_block",
                        dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = group_norm(cfg.norm_num_groups, 1e-6, "conv_norm_out", self.dtype,
                       self.param_dtype)(x, silu=True)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv_out", dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return x


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        mid_ch = cfg.block_out_channels[-1]
        x = nn.Conv(mid_ch, (3, 3), padding=((1, 1), (1, 1)), name="conv_in",
                    dtype=self.dtype, param_dtype=self.param_dtype)(z)
        x = VAEMidBlock(mid_ch, cfg.norm_num_groups, name="mid_block",
                        dtype=self.dtype, param_dtype=self.param_dtype)(x)
        reversed_channels = list(reversed(cfg.block_out_channels))
        output_channel = reversed_channels[0]
        for i, ch in enumerate(reversed_channels):
            prev_channel = output_channel
            output_channel = ch
            x = UpDecoderBlock2D(
                in_channels=prev_channel, out_channels=output_channel,
                num_layers=cfg.layers_per_block + 1,
                add_upsample=i != len(cfg.block_out_channels) - 1,
                norm_num_groups=cfg.norm_num_groups,
                name=f"up_blocks_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
            )(x)
        x = group_norm(cfg.norm_num_groups, 1e-6, "conv_norm_out", self.dtype,
                       self.param_dtype)(x, silu=True)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv_out",
                    dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return x


class AutoencoderKL(nn.Module):
    config: VAEConfig = field(default_factory=VAEConfig)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype, param_dtype=self.param_dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype, param_dtype=self.param_dtype)

    def encode_moments(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (mean, logvar) of the latent Gaussian; x in [-1, 1] NHWC."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x: jnp.ndarray, noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Sampled (or mean, when noise is None) latent, NOT yet scaled."""
        mean, logvar = self.encode_moments(x)
        if noise is None:
            return mean
        return mean + jnp.exp(0.5 * logvar) * noise

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """z is the unscaled latent (caller divides by scaling_factor)."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # init helper
        mean, _ = self.encode_moments(x)
        return self.decode(mean)
