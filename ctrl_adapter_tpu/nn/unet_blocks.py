"""2D UNet building blocks (NHWC): Transformer2D, down/mid/up blocks.

Behavioral parity with the diffusers blocks instantiated by the reference ControlNet
(`controlnet/controlnet.py:347-438`) and the SD/SDXL UNets. Used by:
- ``ctrl_adapter_tpu.models.controlnet.ControlNetModel`` (SD-v1.5 tower),
- ``ctrl_adapter_tpu.models.unet_2d.UNet2DConditionModel`` (SDXL + SD backbones).

TPU design: channel-last throughout; GroupNorm statistics in fp32; attention through
``jax.nn.dot_product_attention`` (fp32 softmax accumulation) so XLA lowers the whole
resnet+transformer chain into fused MXU/VPU programs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .attention import BasicTransformerBlock
from .resnet import Downsample2D, ResnetBlock2D, Upsample2D, group_norm


class Transformer2DModel(nn.Module):
    """GroupNorm -> proj_in -> N x BasicTransformerBlock -> proj_out (+residual)."""

    num_attention_heads: int
    attention_head_dim: int
    in_channels: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    use_linear_projection: bool = False
    only_cross_attention: bool = False
    upcast_attention: bool = False
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (n, h, w, c)
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        ip_hidden_states: Optional[jnp.ndarray] = None,
        ip_scale: float = 1.0,
    ) -> jnp.ndarray:
        n, h, w, c = hidden_states.shape
        inner_dim = self.num_attention_heads * self.attention_head_dim
        residual = hidden_states

        hidden_states = group_norm(
            self.norm_num_groups, 1e-6, "norm", self.dtype, self.param_dtype
        )(hidden_states).astype(residual.dtype)

        if self.use_linear_projection:
            hidden_states = hidden_states.reshape(n, h * w, c)
            hidden_states = nn.Dense(
                inner_dim, name="proj_in", dtype=self.dtype, param_dtype=self.param_dtype
            )(hidden_states)
        else:
            hidden_states = nn.Conv(
                inner_dim, (1, 1), name="proj_in", dtype=self.dtype, param_dtype=self.param_dtype
            )(hidden_states)
            hidden_states = hidden_states.reshape(n, h * w, inner_dim)

        for i in range(self.num_layers):
            hidden_states = BasicTransformerBlock(
                dim=inner_dim,
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                only_cross_attention=self.only_cross_attention,
                upcast_attention=self.upcast_attention,
                name=f"transformer_blocks_{i}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(hidden_states, encoder_hidden_states=encoder_hidden_states,
              ip_hidden_states=ip_hidden_states, ip_scale=ip_scale)

        if self.use_linear_projection:
            hidden_states = nn.Dense(
                c, name="proj_out", dtype=self.dtype, param_dtype=self.param_dtype
            )(hidden_states)
            hidden_states = hidden_states.reshape(n, h, w, c)
        else:
            hidden_states = hidden_states.reshape(n, h, w, inner_dim)
            hidden_states = nn.Conv(
                c, (1, 1), name="proj_out", dtype=self.dtype, param_dtype=self.param_dtype
            )(hidden_states)

        return hidden_states + residual


class DownBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    resnet_eps: float = 1e-5
    resnet_groups: int = 32
    add_downsample: bool = True
    resnet_time_scale_shift: str = "default"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray, temb: jnp.ndarray):
        output_states = ()
        for i in range(self.num_layers):
            hidden_states = ResnetBlock2D(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                temb_channels=temb.shape[-1],
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                time_embedding_norm=self.resnet_time_scale_shift,
                name=f"resnets_{i}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(hidden_states, temb)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = Downsample2D(
                self.out_channels, name="downsamplers_0", dtype=self.dtype, param_dtype=self.param_dtype
            )(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class CrossAttnDownBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    transformer_layers_per_block: int = 1
    num_attention_heads: int = 8
    cross_attention_dim: int = 768
    resnet_eps: float = 1e-5
    resnet_groups: int = 32
    add_downsample: bool = True
    use_linear_projection: bool = False
    only_cross_attention: bool = False
    upcast_attention: bool = False
    resnet_time_scale_shift: str = "default"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        temb: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        ip_hidden_states: Optional[jnp.ndarray] = None,
        ip_scale: float = 1.0,
    ):
        output_states = ()
        for i in range(self.num_layers):
            hidden_states = ResnetBlock2D(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                temb_channels=temb.shape[-1],
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                time_embedding_norm=self.resnet_time_scale_shift,
                name=f"resnets_{i}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(hidden_states, temb)
            hidden_states = Transformer2DModel(
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.out_channels // self.num_attention_heads,
                in_channels=self.out_channels,
                num_layers=self.transformer_layers_per_block,
                cross_attention_dim=self.cross_attention_dim,
                use_linear_projection=self.use_linear_projection,
                only_cross_attention=self.only_cross_attention,
                upcast_attention=self.upcast_attention,
                name=f"attentions_{i}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(hidden_states, encoder_hidden_states, ip_hidden_states, ip_scale)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = Downsample2D(
                self.out_channels, name="downsamplers_0", dtype=self.dtype, param_dtype=self.param_dtype
            )(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class UNetMidBlock2DCrossAttn(nn.Module):
    in_channels: int
    num_layers: int = 1
    transformer_layers_per_block: int = 1
    num_attention_heads: int = 8
    cross_attention_dim: int = 768
    resnet_eps: float = 1e-5
    resnet_groups: int = 32
    use_linear_projection: bool = False
    upcast_attention: bool = False
    resnet_time_scale_shift: str = "default"
    output_scale_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        temb: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        ip_hidden_states: Optional[jnp.ndarray] = None,
        ip_scale: float = 1.0,
    ) -> jnp.ndarray:
        resnet = lambda name: ResnetBlock2D(  # noqa: E731
            in_channels=self.in_channels,
            out_channels=self.in_channels,
            temb_channels=temb.shape[-1],
            eps=self.resnet_eps,
            groups=self.resnet_groups,
            time_embedding_norm=self.resnet_time_scale_shift,
            output_scale_factor=self.output_scale_factor,
            name=name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        hidden_states = resnet("resnets_0")(hidden_states, temb)
        for i in range(self.num_layers):
            hidden_states = Transformer2DModel(
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.in_channels // self.num_attention_heads,
                in_channels=self.in_channels,
                num_layers=self.transformer_layers_per_block,
                cross_attention_dim=self.cross_attention_dim,
                use_linear_projection=self.use_linear_projection,
                upcast_attention=self.upcast_attention,
                name=f"attentions_{i}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(hidden_states, encoder_hidden_states, ip_hidden_states, ip_scale)
            hidden_states = resnet(f"resnets_{i + 1}")(hidden_states, temb)
        return hidden_states


class UpBlock2D(nn.Module):
    in_channels: int
    prev_output_channel: int
    out_channels: int
    num_layers: int = 3
    resnet_eps: float = 1e-5
    resnet_groups: int = 32
    add_upsample: bool = True
    resnet_time_scale_shift: str = "default"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, res_hidden_states_tuple, temb):
        for i in range(self.num_layers):
            res_skip_channels = self.in_channels if (i == self.num_layers - 1) else self.out_channels
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            res_hidden = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden], axis=-1)
            hidden_states = ResnetBlock2D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels,
                temb_channels=temb.shape[-1],
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                time_embedding_norm=self.resnet_time_scale_shift,
                name=f"resnets_{i}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(hidden_states, temb)
        if self.add_upsample:
            hidden_states = Upsample2D(
                self.out_channels, use_conv=True, name="upsamplers_0",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states)
        return hidden_states


class CrossAttnUpBlock2D(nn.Module):
    in_channels: int
    prev_output_channel: int
    out_channels: int
    num_layers: int = 3
    transformer_layers_per_block: int = 1
    num_attention_heads: int = 8
    cross_attention_dim: int = 768
    resnet_eps: float = 1e-5
    resnet_groups: int = 32
    add_upsample: bool = True
    use_linear_projection: bool = False
    only_cross_attention: bool = False
    upcast_attention: bool = False
    resnet_time_scale_shift: str = "default"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, res_hidden_states_tuple, temb, encoder_hidden_states=None,
                 ip_hidden_states=None, ip_scale=1.0):
        for i in range(self.num_layers):
            res_skip_channels = self.in_channels if (i == self.num_layers - 1) else self.out_channels
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            res_hidden = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden], axis=-1)
            hidden_states = ResnetBlock2D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels,
                temb_channels=temb.shape[-1],
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                time_embedding_norm=self.resnet_time_scale_shift,
                name=f"resnets_{i}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(hidden_states, temb)
            hidden_states = Transformer2DModel(
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.out_channels // self.num_attention_heads,
                in_channels=self.out_channels,
                num_layers=self.transformer_layers_per_block,
                cross_attention_dim=self.cross_attention_dim,
                use_linear_projection=self.use_linear_projection,
                only_cross_attention=self.only_cross_attention,
                upcast_attention=self.upcast_attention,
                name=f"attentions_{i}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(hidden_states, encoder_hidden_states, ip_hidden_states, ip_scale)
        if self.add_upsample:
            hidden_states = Upsample2D(
                self.out_channels, use_conv=True, name="upsamplers_0",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(hidden_states)
        return hidden_states
