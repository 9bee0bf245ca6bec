"""Timestep / positional embeddings.

Re-implements (TPU-native, NHWC/jnp) the sinusoidal timestep projection and the 2-layer
MLP timestep embedding used throughout the reference stack:
reference `model/adapter_spatial_temporal.py:55-57,63-66` (Timesteps + TimestepEmbedding)
and `controlnet/controlnet.py:268-296` (UNet/ControlNet time embedding).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import jax


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """Sinusoidal embeddings, matching diffusers' ``get_timestep_embedding`` semantics.

    Args:
        timesteps: (N,) array of (possibly fractional) timestep values.
        embedding_dim: output channel count.
    Returns:
        (N, embedding_dim) float32 embeddings.
    """
    assert timesteps.ndim == 1, "timesteps must be 1-D"
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class Timesteps(nn.Module):
    """Stateless sinusoidal projection module (parity with diffusers ``Timesteps``)."""

    num_channels: int
    flip_sin_to_cos: bool = True
    downscale_freq_shift: float = 0.0
    scale: float = 1.0

    @nn.compact
    def __call__(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        return get_timestep_embedding(
            timesteps,
            self.num_channels,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift,
            scale=self.scale,
        )


class TimestepEmbedding(nn.Module):
    """Two-layer SiLU MLP over the sinusoidal projection.

    Torch param layout: ``linear_1.{weight,bias}``, ``linear_2.{weight,bias}``,
    optional ``cond_proj.weight`` (bias-free). Names are kept so checkpoint conversion
    is mechanical.
    """

    time_embed_dim: int
    out_dim: Optional[int] = None
    use_cond_proj: bool = False
    sample_proj_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, sample: jnp.ndarray, condition: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        if condition is not None and self.use_cond_proj:
            sample = sample + nn.Dense(
                sample.shape[-1],
                use_bias=False,
                name="cond_proj",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(condition)
        sample = nn.Dense(
            self.time_embed_dim,
            use_bias=self.sample_proj_bias,
            name="linear_1",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(sample)
        sample = nn.silu(sample)
        sample = nn.Dense(
            self.out_dim or self.time_embed_dim,
            use_bias=self.sample_proj_bias,
            name="linear_2",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(sample)
        return sample


class ImageProjection(nn.Module):
    """diffusers ``ImageProjection``: CLIP image embedding (b, d) -> ``num_image_text_embeds``
    context tokens (b, n, cross_attention_dim) via Linear + LayerNorm. Torch param
    layout preserved: ``image_embeds.{weight,bias}``, ``norm.{weight,bias}``."""

    cross_attention_dim: int
    num_image_text_embeds: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        b = image_embeds.shape[0]
        x = nn.Dense(
            self.num_image_text_embeds * self.cross_attention_dim,
            name="image_embeds", dtype=self.dtype, param_dtype=self.param_dtype,
        )(image_embeds)
        x = x.reshape(b, self.num_image_text_embeds, self.cross_attention_dim)
        return nn.LayerNorm(
            epsilon=1e-5, name="norm", dtype=self.dtype, param_dtype=self.param_dtype
        )(x)


class MultiIPAdapterImageProjection(nn.Module):
    """Wrapper matching diffusers' ``encoder_hid_proj.image_projection_layers.{i}``
    param nesting (single-adapter: i = 0)."""

    cross_attention_dim: int
    num_image_text_embeds: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        return ImageProjection(
            cross_attention_dim=self.cross_attention_dim,
            num_image_text_embeds=self.num_image_text_embeds,
            name="image_projection_layers_0",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(image_embeds)


class PixArtAlphaTextProjection(nn.Module):  # pragma: no cover - reserved for parity
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, caption: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_size, name="linear_1", dtype=self.dtype)(caption)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.hidden_size, name="linear_2", dtype=self.dtype)(x)
