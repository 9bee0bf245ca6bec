"""Frozen SD-v1.5 ControlNet feature tower (NHWC, jit-friendly).

Parity target: reference `controlnet/controlnet.py` — the diffusers ControlNetModel
fork whose only functional additions are the ``skip_conv_in`` (latents skipping, paper
section 3.2) and ``skip_time_emb`` forward flags (`controlnet/controlnet.py:676-677,
795-814`). Structure (`:340-438`): conv_in -> time embedding -> conditioning-embedding
CNN -> 4 down blocks -> mid block -> 12+1 zero-conv projection heads -> scaled
residuals.

TPU-native: the whole tower is one flax module traced into the denoise-step XLA
program; ``conditioning_scale`` multiplies inside the program (fuses with the zero
convs); the boolean skips are Python-level (static) so they cost nothing under jit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.embeddings import TimestepEmbedding, Timesteps
from ..nn.unet_blocks import CrossAttnDownBlock2D, DownBlock2D, UNetMidBlock2DCrossAttn


@dataclass(frozen=True)
class ControlNetConfig:
    """SD-v1.5 ControlNet hyperparameters (defaults = lllyasviel/control_v11* family)."""

    in_channels: int = 4
    conditioning_channels: int = 3
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 1)
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    cross_attention_dim: int = 768
    num_attention_heads: Tuple[int, ...] = (8, 8, 8, 8)
    use_linear_projection: bool = False
    upcast_attention: bool = False
    resnet_time_scale_shift: str = "default"
    conditioning_embedding_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    mid_block_scale_factor: float = 1.0


class ControlNetConditioningEmbedding(nn.Module):
    """4-stage CNN embedding of the 512x512 condition image down to latent resolution
    with a zero-initialised output conv (reference `controlnet/controlnet.py:62-104`)."""

    conditioning_embedding_channels: int
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, conditioning: jnp.ndarray) -> jnp.ndarray:
        conv = lambda ch, stride, name, zero=False: nn.Conv(  # noqa: E731
            ch,
            (3, 3),
            strides=(stride, stride),
            padding=((1, 1), (1, 1)),
            name=name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.zeros if zero else nn.initializers.lecun_normal(),
        )
        x = conv(self.block_out_channels[0], 1, "conv_in")(conditioning)
        x = nn.silu(x)
        for i in range(len(self.block_out_channels) - 1):
            x = conv(self.block_out_channels[i], 1, f"blocks_{2 * i}")(x)
            x = nn.silu(x)
            x = conv(self.block_out_channels[i + 1], 2, f"blocks_{2 * i + 1}")(x)
            x = nn.silu(x)
        x = conv(self.conditioning_embedding_channels, 1, "conv_out", zero=True)(x)
        return x


class ControlNetModel(nn.Module):
    config: ControlNetConfig = field(default_factory=ControlNetConfig)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (n, h, w, 4) pooled noisy latents
        timestep: jnp.ndarray,  # scalar or (n,)
        encoder_hidden_states: jnp.ndarray,  # (n, 77, 768) SD-v1.5 text emb
        controlnet_cond: jnp.ndarray,  # (n, 8h, 8w, 3) condition image in [0, 1]
        conditioning_scale: float | jnp.ndarray = 1.0,
        skip_conv_in: bool = False,
        skip_time_emb: bool = False,
        guess_mode: bool = False,
    ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        cfg = self.config

        # 1. time embedding
        timesteps = jnp.asarray(timestep)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = Timesteps(
            cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift, name="time_proj"
        )(timesteps)
        emb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4,
            name="time_embedding",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(t_emb.astype(self.dtype))
        if skip_time_emb:  # experimental flag (reference `:809-811`)
            emb = jnp.zeros_like(emb)

        # 2. pre-process: latents skipping zeroes the conv_in path, keeping only the
        # condition embedding (reference `:795-817`).
        sample = nn.Conv(
            cfg.block_out_channels[0],
            (3, 3),
            padding=((1, 1), (1, 1)),
            name="conv_in",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(sample)
        if skip_conv_in:
            sample = jnp.zeros_like(sample)

        cond_emb = ControlNetConditioningEmbedding(
            conditioning_embedding_channels=cfg.block_out_channels[0],
            block_out_channels=cfg.conditioning_embedding_out_channels,
            name="controlnet_cond_embedding",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(controlnet_cond)
        sample = sample + cond_emb

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
                )(sample, emb, encoder_hidden_states)
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

        # 4. mid block
        sample = UNetMidBlock2DCrossAttn(
            in_channels=cfg.block_out_channels[-1],
            transformer_layers_per_block=cfg.transformer_layers_per_block[-1],
            num_attention_heads=cfg.num_attention_heads[-1],
            cross_attention_dim=cfg.cross_attention_dim,
            resnet_eps=cfg.norm_eps,
            resnet_groups=cfg.norm_num_groups,
            use_linear_projection=cfg.use_linear_projection,
            upcast_attention=cfg.upcast_attention,
            output_scale_factor=cfg.mid_block_scale_factor,
            resnet_time_scale_shift=cfg.resnet_time_scale_shift,
            name="mid_block",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(sample, emb, encoder_hidden_states)

        # 5. zero-conv projection heads + conditioning scale (reference `:848-868`)
        zero_conv = lambda ch, name: nn.Conv(  # noqa: E731
            ch,
            (1, 1),
            name=name,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        n_res = len(down_block_res_samples)
        if guess_mode:
            # logspace 0.1 -> 1.0 residual ramp (reference `:861-865`); computed
            # host-side (static Python floats) so it folds into the jitted graph
            import numpy as _np

            guess_scales = [
                float(s) for s in 10.0 ** _np.linspace(-1.0, 0.0, n_res + 1)
            ]
        else:
            guess_scales = [1.0] * (n_res + 1)
        controlnet_down: List[jnp.ndarray] = []
        for k, res in enumerate(down_block_res_samples):
            controlnet_down.append(
                zero_conv(res.shape[-1], f"controlnet_down_blocks_{k}")(res)
                * conditioning_scale * guess_scales[k]
            )
        mid = (
            zero_conv(sample.shape[-1], "controlnet_mid_block")(sample)
            * conditioning_scale * guess_scales[-1]
        )
        return controlnet_down, mid
