"""I2VGen-XL UNet (conditional 3D UNet), NHWC, jit-friendly.

Parity target: the reference's forked diffusers I2VGenXLUNet
(`i2vgen_xl/models/unets/unet_i2vgen_xl.py`):
- conv_in over [noisy latents ; temporally-encoded image latents] (8 channels, `:185,653-656`);
- ``transformer_in`` temporal transformer at the stem (heads=8, head_dim=64, `:187-193`);
- context = [text emb ; 32x32-pooled image-latent embedding (64 tokens) ; projected
  CLIP image embedding (4 tokens)] (`:609-635`);
- time + fps embeddings summed, repeated per frame (`:600-607`);
- ControlNet residual injection on skip tensors + mid (`:681-714`).

Input layout here: sample (b, f, h, w, 4); image_latents (b, f, h, w, 4) — the
frame-position-masked VAE latents; outputs (b, f, h, w, 4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.attention import Attention, FeedForward
from ..nn.embeddings import TimestepEmbedding, Timesteps
from ..nn.resnet import group_norm
from ..nn.unet_3d_blocks import (
    CrossAttnDownBlock3D,
    CrossAttnUpBlock3D,
    DownBlock3D,
    TransformerTemporalModel,
    UNetMidBlock3DCrossAttn,
    UpBlock3D,
)
from ..ops.resize import adaptive_avg_pool2d


@dataclass(frozen=True)
class I2VGenXLUNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64  # heads per block = channels // this


class _GELUProj(nn.Module):
    """diffusers ``GELU`` activation module: Linear ``proj`` then exact gelu.
    Named submodule so checkpoint key ``ff.net.0.proj`` converts to
    ``ff/net_0/proj`` and loads mechanically."""

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        x = nn.Dense(self.features, name="proj", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        return jax.nn.gelu(x, approximate=False)


class _GELUFeedForward(nn.Module):
    """FeedForward with plain GELU activation (torch layout net.0.proj, net.2)."""

    dim_out: int
    inner_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _GELUProj(self.inner_dim, name="net_0", dtype=self.dtype,
                      param_dtype=self.param_dtype)(x)
        return nn.Dense(self.dim_out, name="net_2", dtype=self.dtype,
                        param_dtype=self.param_dtype)(x)


class I2VGenXLTransformerTemporalEncoder(nn.Module):
    """LayerNorm -> self-attn -> +res -> GELU FF -> +res over (b*h*w, f, c) sequences
    (reference `unet_i2vgen_xl.py:55-101`)."""

    dim: int
    num_attention_heads: int
    attention_head_dim: int
    ff_inner_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        norm = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype,
                            param_dtype=self.param_dtype)(hidden_states)
        attn = Attention(
            query_dim=self.dim, heads=self.num_attention_heads,
            dim_head=self.attention_head_dim, name="attn1",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(norm)
        hidden_states = attn + hidden_states
        ff = _GELUFeedForward(self.dim, self.ff_inner_dim, name="ff",
                              dtype=self.dtype, param_dtype=self.param_dtype)(hidden_states)
        return ff + hidden_states


class I2VGenXLUNet(nn.Module):
    config: I2VGenXLUNetConfig = field(default_factory=I2VGenXLUNetConfig)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (b, f, h, w, 4)
        timestep: jnp.ndarray,  # scalar or (b,)
        fps: jnp.ndarray,  # (b,)
        image_latents: jnp.ndarray,  # (b, f, h, w, 4)
        image_embeddings: jnp.ndarray,  # (b, 1, cross_dim) CLIP image emb
        encoder_hidden_states: jnp.ndarray,  # (b, 77, cross_dim) text emb
        down_block_additional_residuals: Optional[Sequence[jnp.ndarray]] = None,  # (b*f,h,w,c)
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        b, num_frames, height, width, channels = sample.shape
        time_embed_dim = cfg.block_out_channels[0] * 4
        head_dim = cfg.attention_head_dim

        # 1. time + fps embeddings (`:576-607`)
        timesteps = jnp.asarray(timestep)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (b,))
        time_proj = Timesteps(cfg.block_out_channels[0], True, 0.0, name="time_proj")
        t_emb = TimestepEmbedding(
            time_embed_dim, name="time_embedding", dtype=self.dtype, param_dtype=self.param_dtype
        )(time_proj(timesteps).astype(self.dtype))

        fps = jnp.broadcast_to(jnp.asarray(fps).reshape(-1), (b,))
        fps_proj = time_proj(fps).astype(self.dtype)
        fps_emb = nn.Dense(time_embed_dim, name="fps_embedding_0", dtype=self.dtype,
                           param_dtype=self.param_dtype)(fps_proj)
        fps_emb = nn.Dense(time_embed_dim, name="fps_embedding_2", dtype=self.dtype,
                           param_dtype=self.param_dtype)(nn.silu(fps_emb))
        emb = t_emb + fps_emb
        emb = jnp.repeat(emb, num_frames, axis=0)  # (b*f, d)

        # 2. context embeddings (`:609-635`)
        context = encoder_hidden_states  # (b, 77, cross)

        # image-latent context tokens from the first frame: conv -> pool 32 -> 2x
        # stride-2 conv -> (b, 8, 8, cross) -> 64 tokens
        il_first = image_latents[:, 0]  # (b, h, w, 4)
        x = nn.Conv(cfg.in_channels * 8, (3, 3), padding=((1, 1), (1, 1)),
                    name="image_latents_context_embedding_0",
                    dtype=self.dtype, param_dtype=self.param_dtype)(il_first)
        x = nn.silu(x)
        x = adaptive_avg_pool2d(x, (32, 32))
        x = nn.Conv(cfg.in_channels * 16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name="image_latents_context_embedding_3",
                    dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.cross_attention_dim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name="image_latents_context_embedding_5",
                    dtype=self.dtype, param_dtype=self.param_dtype)(x)
        il_context = x.reshape(b, -1, cfg.cross_attention_dim)
        context = jnp.concatenate([context, il_context], axis=1)

        # projected CLIP image embedding -> in_channels tokens
        ie = nn.Dense(time_embed_dim, name="context_embedding_0", dtype=self.dtype,
                      param_dtype=self.param_dtype)(image_embeddings)
        ie = nn.Dense(cfg.cross_attention_dim * cfg.in_channels, name="context_embedding_2",
                      dtype=self.dtype, param_dtype=self.param_dtype)(nn.silu(ie))
        ie = ie.reshape(b, cfg.in_channels, cfg.cross_attention_dim)
        context = jnp.concatenate([context, ie], axis=1)
        context = jnp.repeat(context, num_frames, axis=0)  # (b*f, n_ctx, cross)

        # 3. temporally-encoded image latents concatenated channel-wise (`:637-654`)
        il = image_latents.reshape(b * num_frames, height, width, channels)
        il = nn.Conv(cfg.in_channels * 4, (3, 3), padding=((1, 1), (1, 1)),
                     name="image_latents_proj_in_0",
                     dtype=self.dtype, param_dtype=self.param_dtype)(il)
        il = nn.silu(il)
        il = nn.Conv(cfg.in_channels * 4, (3, 3), padding=((1, 1), (1, 1)),
                     name="image_latents_proj_in_2",
                     dtype=self.dtype, param_dtype=self.param_dtype)(il)
        il = nn.silu(il)
        il = nn.Conv(cfg.in_channels, (3, 3), padding=((1, 1), (1, 1)),
                     name="image_latents_proj_in_4",
                     dtype=self.dtype, param_dtype=self.param_dtype)(il)
        # (b*f, h, w, c) -> (b*h*w, f, c): per-pixel temporal encoding
        il = il.reshape(b, num_frames, height, width, channels)
        il = il.transpose(0, 2, 3, 1, 4).reshape(b * height * width, num_frames, channels)
        il = I2VGenXLTransformerTemporalEncoder(
            dim=cfg.in_channels, num_attention_heads=2, attention_head_dim=cfg.in_channels,
            ff_inner_dim=cfg.in_channels * 4, name="image_latents_temporal_encoder",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(il)
        il = il.reshape(b, height, width, num_frames, channels).transpose(0, 3, 1, 2, 4)

        sample = jnp.concatenate([sample, il], axis=-1)  # (b, f, h, w, 8)
        sample = sample.reshape(b * num_frames, height, width, 2 * channels)

        # 4. stem: conv_in + temporal transformer (`:655-662`)
        sample = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                         name="conv_in", dtype=self.dtype, param_dtype=self.param_dtype)(sample)
        sample = TransformerTemporalModel(
            num_attention_heads=8, attention_head_dim=head_dim,
            in_channels=cfg.block_out_channels[0], norm_num_groups=cfg.norm_num_groups,
            name="transformer_in", dtype=self.dtype, param_dtype=self.param_dtype,
        )(sample, num_frames)

        # 5. down blocks
        down_block_res_samples: Tuple[jnp.ndarray, ...] = (sample,)
        output_channel = cfg.block_out_channels[0]
        n_blocks = len(cfg.block_out_channels)
        for i in range(n_blocks):
            input_channel = output_channel
            output_channel = cfg.block_out_channels[i]
            is_final = i == n_blocks - 1
            if not is_final:
                sample, res = CrossAttnDownBlock3D(
                    in_channels=input_channel, out_channels=output_channel,
                    num_layers=cfg.layers_per_block, num_attention_heads=head_dim,
                    cross_attention_dim=cfg.cross_attention_dim,
                    resnet_groups=cfg.norm_num_groups, add_downsample=True,
                    name=f"down_blocks_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
                )(sample, emb, context, num_frames)
            else:
                sample, res = DownBlock3D(
                    in_channels=input_channel, out_channels=output_channel,
                    num_layers=cfg.layers_per_block, resnet_groups=cfg.norm_num_groups,
                    add_downsample=False,
                    name=f"down_blocks_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
                )(sample, emb, num_frames)
            down_block_res_samples += res

        # ControlNet/adapter residuals onto skips (`:681-695`)
        if down_block_additional_residuals is not None:
            down_block_res_samples = tuple(
                skip + res.astype(skip.dtype)
                for skip, res in zip(down_block_res_samples, down_block_additional_residuals)
            )

        # 6. mid (+ residual, `:697-714`)
        sample = UNetMidBlock3DCrossAttn(
            in_channels=cfg.block_out_channels[-1], num_attention_heads=head_dim,
            cross_attention_dim=cfg.cross_attention_dim, resnet_groups=cfg.norm_num_groups,
            name="mid_block", dtype=self.dtype, param_dtype=self.param_dtype,
        )(sample, emb, context, num_frames)
        if mid_block_additional_residual is not None:
            sample = sample + mid_block_additional_residual.astype(sample.dtype)

        # 7. up blocks
        reversed_out = list(reversed(cfg.block_out_channels))
        output_channel = reversed_out[0]
        for i in range(n_blocks):
            prev_output_channel = output_channel
            output_channel = reversed_out[i]
            input_channel = reversed_out[min(i + 1, n_blocks - 1)]
            is_final = i == n_blocks - 1
            num_layers = cfg.layers_per_block + 1
            res_samples = down_block_res_samples[-num_layers:]
            down_block_res_samples = down_block_res_samples[:-num_layers]
            if i == 0:
                sample = UpBlock3D(
                    in_channels=input_channel, prev_output_channel=prev_output_channel,
                    out_channels=output_channel, num_layers=num_layers,
                    resnet_groups=cfg.norm_num_groups, add_upsample=not is_final,
                    name=f"up_blocks_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
                )(sample, res_samples, emb, num_frames)
            else:
                sample = CrossAttnUpBlock3D(
                    in_channels=input_channel, prev_output_channel=prev_output_channel,
                    out_channels=output_channel, num_layers=num_layers,
                    num_attention_heads=head_dim,
                    cross_attention_dim=cfg.cross_attention_dim,
                    resnet_groups=cfg.norm_num_groups, add_upsample=not is_final,
                    name=f"up_blocks_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
                )(sample, res_samples, emb, context, num_frames)

        # 8. out
        sample = group_norm(cfg.norm_num_groups, 1e-5, "conv_norm_out", self.dtype,
                            self.param_dtype)(sample, silu=True)
        sample = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                         name="conv_out", dtype=self.dtype, param_dtype=self.param_dtype)(sample)
        return sample.reshape(b, num_frames, height, width, cfg.out_channels)
