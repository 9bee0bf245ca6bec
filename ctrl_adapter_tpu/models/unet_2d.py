"""UNet2DConditionModel (SD-v1.5 / SDXL architectures), NHWC, jit-friendly.

Behavioral parity with diffusers' UNet2DConditionModel as consumed by the reference:
- SDXL backbone loaded stock at `train.py:488-496`;
- residual injection: ``down_block_additional_residuals`` are added to the down-block
  skip tensors (zip semantics: extra residuals beyond the UNet's skip count are
  ignored, which is how the 12-slot adapter output feeds the 9-skip SDXL UNet) and
  ``mid_block_additional_residual`` to the mid output — mirroring diffusers'
  is_controlnet branch driven by `train.py:1384-1391` /
  `sdxl_controlnet_adapter_pipeline.py:1356-1366`.

TPU-native: one flax module; CFG batches stay batched; text/time embeddings computed
once per step inside the jitted program.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.embeddings import TimestepEmbedding, Timesteps
from ..nn.resnet import group_norm
from ..nn.unet_blocks import (
    CrossAttnDownBlock2D,
    CrossAttnUpBlock2D,
    DownBlock2D,
    UNetMidBlock2DCrossAttn,
    UpBlock2D,
)


@dataclass(frozen=True)
class UNet2DConfig:
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 1)
    num_attention_heads: Tuple[int, ...] = (8, 8, 8, 8)
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    use_linear_projection: bool = False
    upcast_attention: bool = False
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    resnet_time_scale_shift: str = "default"
    # SDXL text_time conditioning
    addition_embed_type: Optional[str] = None  # None | "text_time"
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: Optional[int] = None
    # LCM-style guidance-embedding conditioning (diffusers ``time_cond_proj_dim``):
    # when set, ``timestep_cond`` (b, time_cond_proj_dim) is projected by the
    # bias-free ``time_embedding.cond_proj`` and added to the sinusoidal t-emb
    # before the MLP (reference `sdxl_controlnet_adapter_pipeline.py:1250-1256`).
    time_cond_proj_dim: Optional[int] = None
    # IP-Adapter (diffusers ``encoder_hid_dim_type="ip_image_proj"``): CLIP image
    # embeddings from ``added_cond_kwargs["image_embeds"]`` are projected to
    # ``ip_num_image_text_embeds`` context tokens and attended by an extra K/V
    # branch in every cross-attention (reference `sdxl_...py:1354-1360`).
    encoder_hid_dim_type: Optional[str] = None  # None | "ip_image_proj"
    ip_num_image_text_embeds: int = 4
    ip_scale: float = 1.0


SD15_CONFIG = UNet2DConfig()

SDXL_CONFIG = UNet2DConfig(
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(320, 640, 1280),
    transformer_layers_per_block=(1, 2, 10),
    num_attention_heads=(5, 10, 20),
    cross_attention_dim=2048,
    use_linear_projection=True,
    addition_embed_type="text_time",
    addition_time_embed_dim=256,
    projection_class_embeddings_input_dim=2816,
)


class UNet2DConditionModel(nn.Module):
    config: UNet2DConfig = field(default_factory=lambda: SD15_CONFIG)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (n, h, w, in_channels)
        timestep: jnp.ndarray,  # scalar or (n,)
        encoder_hidden_states: jnp.ndarray,  # (n, seq, cross_dim)
        added_cond_kwargs: Optional[dict] = None,  # {"text_embeds", "time_ids"} for SDXL
        down_block_additional_residuals: Optional[Sequence[jnp.ndarray]] = None,
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
        timestep_cond: Optional[jnp.ndarray] = None,  # (n, time_cond_proj_dim)
    ) -> jnp.ndarray:
        cfg = self.config
        time_embed_dim = cfg.block_out_channels[0] * 4

        # 1. time (+ SDXL text_time) embedding
        timesteps = jnp.asarray(timestep)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = Timesteps(
            cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift, name="time_proj"
        )(timesteps)
        emb = TimestepEmbedding(
            time_embed_dim,
            use_cond_proj=cfg.time_cond_proj_dim is not None,
            name="time_embedding",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(
            t_emb.astype(self.dtype),
            condition=None if timestep_cond is None else timestep_cond.astype(self.dtype),
        )

        if cfg.addition_embed_type == "text_time":
            assert added_cond_kwargs is not None, "SDXL requires text_embeds/time_ids"
            text_embeds = added_cond_kwargs["text_embeds"]  # (n, 1280)
            time_ids = added_cond_kwargs["time_ids"]  # (n, 6)
            time_embeds = Timesteps(
                cfg.addition_time_embed_dim, cfg.flip_sin_to_cos, cfg.freq_shift,
                name="add_time_proj",
            )(time_ids.reshape(-1))
            time_embeds = time_embeds.reshape(text_embeds.shape[0], -1)
            add_embeds = jnp.concatenate([text_embeds, time_embeds.astype(text_embeds.dtype)], axis=-1)
            aug_emb = TimestepEmbedding(
                time_embed_dim, name="add_embedding", dtype=self.dtype, param_dtype=self.param_dtype
            )(add_embeds.astype(self.dtype))
            emb = emb + aug_emb

        # 1b. IP-Adapter image tokens (diffusers encoder_hid_proj for
        # encoder_hid_dim_type == "ip_image_proj")
        ip_hidden_states = None
        if cfg.encoder_hid_dim_type == "ip_image_proj":
            assert added_cond_kwargs is not None and "image_embeds" in added_cond_kwargs, (
                "ip_image_proj requires added_cond_kwargs['image_embeds']"
            )
            from ..nn.embeddings import MultiIPAdapterImageProjection

            ip_hidden_states = MultiIPAdapterImageProjection(
                cross_attention_dim=cfg.cross_attention_dim,
                num_image_text_embeds=cfg.ip_num_image_text_embeds,
                name="encoder_hid_proj",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(added_cond_kwargs["image_embeds"].astype(self.dtype))

        # 2. conv_in
        sample = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
            name="conv_in", dtype=self.dtype, param_dtype=self.param_dtype,
        )(sample)

        # 3. down blocks
        down_block_res_samples: Tuple[jnp.ndarray, ...] = (sample,)
        output_channel = cfg.block_out_channels[0]
        for i, block_type in enumerate(cfg.down_block_types):
            input_channel = output_channel
            output_channel = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            if block_type == "CrossAttnDownBlock2D":
                sample, res = CrossAttnDownBlock2D(
                    in_channels=input_channel,
                    out_channels=output_channel,
                    num_layers=cfg.layers_per_block,
                    transformer_layers_per_block=cfg.transformer_layers_per_block[i],
                    num_attention_heads=cfg.num_attention_heads[i],
                    cross_attention_dim=cfg.cross_attention_dim,
                    resnet_eps=cfg.norm_eps,
                    resnet_groups=cfg.norm_num_groups,
                    add_downsample=not is_final,
                    use_linear_projection=cfg.use_linear_projection,
                    upcast_attention=cfg.upcast_attention,
                    resnet_time_scale_shift=cfg.resnet_time_scale_shift,
                    name=f"down_blocks_{i}",
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )(sample, emb, encoder_hidden_states, ip_hidden_states, cfg.ip_scale)
            else:
                sample, res = DownBlock2D(
                    in_channels=input_channel,
                    out_channels=output_channel,
                    num_layers=cfg.layers_per_block,
                    resnet_eps=cfg.norm_eps,
                    resnet_groups=cfg.norm_num_groups,
                    add_downsample=not is_final,
                    resnet_time_scale_shift=cfg.resnet_time_scale_shift,
                    name=f"down_blocks_{i}",
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )(sample, emb)
            down_block_res_samples += res

        # ControlNet/adapter residual injection on skip connections (zip semantics).
        if down_block_additional_residuals is not None:
            down_block_res_samples = tuple(
                skip + res.astype(skip.dtype)
                for skip, res in zip(down_block_res_samples, down_block_additional_residuals)
            )

        # 4. mid
        sample = UNetMidBlock2DCrossAttn(
            in_channels=cfg.block_out_channels[-1],
            transformer_layers_per_block=cfg.transformer_layers_per_block[-1],
            num_attention_heads=cfg.num_attention_heads[-1],
            cross_attention_dim=cfg.cross_attention_dim,
            resnet_eps=cfg.norm_eps,
            resnet_groups=cfg.norm_num_groups,
            use_linear_projection=cfg.use_linear_projection,
            upcast_attention=cfg.upcast_attention,
            resnet_time_scale_shift=cfg.resnet_time_scale_shift,
            name="mid_block",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(sample, emb, encoder_hidden_states, ip_hidden_states, cfg.ip_scale)

        if mid_block_additional_residual is not None:
            sample = sample + jnp.asarray(mid_block_additional_residual).astype(sample.dtype)

        # 5. up blocks
        reversed_block_out = list(reversed(cfg.block_out_channels))
        output_channel = reversed_block_out[0]
        for i, block_type in enumerate(cfg.up_block_types):
            prev_output_channel = output_channel
            output_channel = reversed_block_out[i]
            input_channel = reversed_block_out[min(i + 1, len(cfg.block_out_channels) - 1)]
            is_final = i == len(cfg.block_out_channels) - 1
            num_layers = cfg.layers_per_block + 1
            res_samples = down_block_res_samples[-num_layers:]
            down_block_res_samples = down_block_res_samples[:-num_layers]
            rev_idx = len(cfg.block_out_channels) - 1 - i
            if block_type == "CrossAttnUpBlock2D":
                sample = CrossAttnUpBlock2D(
                    in_channels=input_channel,
                    prev_output_channel=prev_output_channel,
                    out_channels=output_channel,
                    num_layers=num_layers,
                    transformer_layers_per_block=cfg.transformer_layers_per_block[rev_idx],
                    num_attention_heads=cfg.num_attention_heads[rev_idx],
                    cross_attention_dim=cfg.cross_attention_dim,
                    resnet_eps=cfg.norm_eps,
                    resnet_groups=cfg.norm_num_groups,
                    add_upsample=not is_final,
                    use_linear_projection=cfg.use_linear_projection,
                    upcast_attention=cfg.upcast_attention,
                    resnet_time_scale_shift=cfg.resnet_time_scale_shift,
                    name=f"up_blocks_{i}",
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )(sample, res_samples, emb, encoder_hidden_states, ip_hidden_states, cfg.ip_scale)
            else:
                sample = UpBlock2D(
                    in_channels=input_channel,
                    prev_output_channel=prev_output_channel,
                    out_channels=output_channel,
                    num_layers=num_layers,
                    resnet_eps=cfg.norm_eps,
                    resnet_groups=cfg.norm_num_groups,
                    add_upsample=not is_final,
                    resnet_time_scale_shift=cfg.resnet_time_scale_shift,
                    name=f"up_blocks_{i}",
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )(sample, res_samples, emb)

        # 6. out
        sample = group_norm(cfg.norm_num_groups, cfg.norm_eps, "conv_norm_out", self.dtype,
                            self.param_dtype)(sample, silu=True)
        sample = nn.Conv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            name="conv_out", dtype=self.dtype, param_dtype=self.param_dtype,
        )(sample)
        return sample
