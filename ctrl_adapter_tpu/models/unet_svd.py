"""SVD UNet (UNetSpatioTemporalConditionModel), NHWC, jit-friendly.

Parity target: the reference's forked diffusers UNetSpatioTemporalConditionModel
(`svd/models/unets/unet_spatio_temporal_condition.py`): 8-channel conv_in (noisy
latents concat image latents), time embedding + added-time-ids (fps, motion bucket,
noise aug) embedding, spatio-temporal down/mid/up blocks, ControlNet residual
injection on skip tensors + mid (`:457-490`).

Input layout: sample (b, f, h, w, 8); output (b, f, h, w, 4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.embeddings import TimestepEmbedding, Timesteps
from ..nn.resnet import group_norm
from ..nn.unet_st_blocks import (
    CrossAttnDownBlockSpatioTemporal,
    CrossAttnUpBlockSpatioTemporal,
    DownBlockSpatioTemporal,
    UNetMidBlockSpatioTemporal,
    UpBlockSpatioTemporal,
)


@dataclass(frozen=True)
class SVDUNetConfig:
    in_channels: int = 8
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "DownBlockSpatioTemporal",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 1)
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 768  # 3 time ids x 256


class UNetSpatioTemporalConditionModel(nn.Module):
    config: SVDUNetConfig = field(default_factory=SVDUNetConfig)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (b, f, h, w, in_channels)
        timestep: jnp.ndarray,  # scalar or (b,) — EDM continuous t = 0.25 log sigma
        encoder_hidden_states: jnp.ndarray,  # (b, 1, 1024) CLIP image emb
        added_time_ids: jnp.ndarray,  # (b, 3): fps-1, motion bucket, noise aug
        down_block_additional_residuals: Optional[Sequence[jnp.ndarray]] = None,  # (b*f,h,w,c)
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        b, num_frames, height, width, _ = sample.shape
        time_embed_dim = cfg.block_out_channels[0] * 4

        # 1. time + added-time-id embeddings (`:389-420`)
        timesteps = jnp.asarray(timestep)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (b,))
        t_emb = Timesteps(cfg.block_out_channels[0], True, 0.0, name="time_proj")(timesteps)
        emb = TimestepEmbedding(
            time_embed_dim, name="time_embedding", dtype=self.dtype, param_dtype=self.param_dtype
        )(t_emb.astype(self.dtype))

        time_embeds = Timesteps(cfg.addition_time_embed_dim, True, 0.0, name="add_time_proj")(
            added_time_ids.reshape(-1)
        )
        time_embeds = time_embeds.reshape(b, -1).astype(emb.dtype)
        aug_emb = TimestepEmbedding(
            time_embed_dim, name="add_embedding", dtype=self.dtype, param_dtype=self.param_dtype
        )(time_embeds)
        emb = emb + aug_emb

        # 2. flatten frames into batch; broadcast conditioning (`:422-434`)
        sample = sample.reshape(b * num_frames, height, width, sample.shape[-1])
        emb = jnp.repeat(emb, num_frames, axis=0)
        encoder_hidden_states = jnp.repeat(encoder_hidden_states, num_frames, axis=0)
        image_only_indicator = jnp.zeros((b, num_frames), dtype=jnp.float32)

        sample = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                         name="conv_in", dtype=self.dtype, param_dtype=self.param_dtype)(sample)

        # 3. down blocks
        down_block_res_samples: Tuple[jnp.ndarray, ...] = (sample,)
        output_channel = cfg.block_out_channels[0]
        for i, block_type in enumerate(cfg.down_block_types):
            input_channel = output_channel
            output_channel = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            if block_type == "CrossAttnDownBlockSpatioTemporal":
                sample, res = CrossAttnDownBlockSpatioTemporal(
                    in_channels=input_channel, out_channels=output_channel,
                    num_layers=cfg.layers_per_block,
                    transformer_layers_per_block=cfg.transformer_layers_per_block[i],
                    num_attention_heads=cfg.num_attention_heads[i],
                    cross_attention_dim=cfg.cross_attention_dim,
                    add_downsample=not is_final,
                    name=f"down_blocks_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
                )(sample, emb, encoder_hidden_states, image_only_indicator)
            else:
                sample, res = DownBlockSpatioTemporal(
                    in_channels=input_channel, out_channels=output_channel,
                    num_layers=cfg.layers_per_block, add_downsample=not is_final,
                    name=f"down_blocks_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
                )(sample, emb, image_only_indicator)
            down_block_res_samples += res

        # ControlNet/adapter residual injection (`:457-471`)
        if down_block_additional_residuals is not None:
            down_block_res_samples = tuple(
                skip + res.astype(skip.dtype)
                for skip, res in zip(down_block_res_samples, down_block_additional_residuals)
            )

        # 4. mid (+ residual, `:476-490`)
        sample = UNetMidBlockSpatioTemporal(
            in_channels=cfg.block_out_channels[-1],
            transformer_layers_per_block=cfg.transformer_layers_per_block[-1],
            num_attention_heads=cfg.num_attention_heads[-1],
            cross_attention_dim=cfg.cross_attention_dim,
            name="mid_block", dtype=self.dtype, param_dtype=self.param_dtype,
        )(sample, emb, encoder_hidden_states, image_only_indicator)
        if mid_block_additional_residual is not None:
            sample = sample + mid_block_additional_residual.astype(sample.dtype)

        # 5. up blocks
        reversed_out = list(reversed(cfg.block_out_channels))
        reversed_heads = list(reversed(cfg.num_attention_heads))
        reversed_tlpb = list(reversed(cfg.transformer_layers_per_block))
        output_channel = reversed_out[0]
        n_blocks = len(cfg.block_out_channels)
        for i, block_type in enumerate(cfg.up_block_types):
            prev_output_channel = output_channel
            output_channel = reversed_out[i]
            input_channel = reversed_out[min(i + 1, n_blocks - 1)]
            is_final = i == n_blocks - 1
            num_layers = cfg.layers_per_block + 1
            res_samples = down_block_res_samples[-num_layers:]
            down_block_res_samples = down_block_res_samples[:-num_layers]
            if block_type == "CrossAttnUpBlockSpatioTemporal":
                sample = CrossAttnUpBlockSpatioTemporal(
                    in_channels=input_channel, prev_output_channel=prev_output_channel,
                    out_channels=output_channel, num_layers=num_layers,
                    transformer_layers_per_block=reversed_tlpb[i],
                    num_attention_heads=reversed_heads[i],
                    cross_attention_dim=cfg.cross_attention_dim,
                    add_upsample=not is_final,
                    name=f"up_blocks_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
                )(sample, res_samples, emb, encoder_hidden_states, image_only_indicator)
            else:
                sample = UpBlockSpatioTemporal(
                    in_channels=input_channel, prev_output_channel=prev_output_channel,
                    out_channels=output_channel, num_layers=num_layers,
                    add_upsample=not is_final,
                    name=f"up_blocks_{i}", dtype=self.dtype, param_dtype=self.param_dtype,
                )(sample, res_samples, emb, image_only_indicator)

        # 6. out
        sample = group_norm(32, 1e-5, "conv_norm_out", self.dtype, self.param_dtype)(
            sample, silu=True
        )
        sample = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                         name="conv_out", dtype=self.dtype, param_dtype=self.param_dtype)(sample)
        return sample.reshape(b, num_frames, height, width, cfg.out_channels)
