"""ResNet blocks, up/down sampling, and the spatial/temporal AlphaBlender (NHWC).

Parity targets:
- ``ResnetBlock2D`` with arbitrary-output-size upsampling — the reference's single
  functional fork of diffusers (`model/resnet_block_2d.py:28-29,164-221`);
- diffusers ``TemporalResnetBlock`` and ``AlphaBlender`` used by the adapter
  (`model/adapter_spatial_temporal.py:95-152`);
- diffusers ``Upsample2D`` / ``Downsample2D`` used by UNets / ControlNet.

TPU notes: everything is NHWC so convs hit the MXU with native layout; GroupNorm runs
in fp32 (statistics) regardless of compute dtype; nearest upsampling is a static gather.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.group_norm import group_norm_silu
from ..ops.resize import nearest_resize
from .embeddings import TimestepEmbedding, Timesteps  # noqa: F401


class GroupNorm(nn.Module):
    """GroupNorm over the trailing channel axis (contiguous groups, fp32 stats) with an
    optionally *fused* SiLU — dispatches to the single-HBM-pass Pallas kernel on TPU
    (ops/group_norm.py) and is param-compatible with ``flax.linen.GroupNorm``
    (same ``scale``/``bias`` names, so torch→jax converted checkpoints load as-is)."""

    num_groups: int
    epsilon: float
    param_dtype: jnp.dtype = jnp.float32
    # None = env default; "prefer" = Pallas kernel whenever on-TPU + eligible
    # (module-level override for op mixes where XLA GN degenerates — the adapter)
    use_pallas: Optional[object] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, silu: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return group_norm_silu(x, scale, bias, self.num_groups, self.epsilon, silu,
                               self.use_pallas)


def group_norm(
    num_groups: int,
    eps: float,
    name: str,
    dtype: jnp.dtype,
    param_dtype: jnp.dtype = jnp.float32,
    use_pallas: Optional[object] = None,
) -> GroupNorm:
    """GroupNorm factory; call result with ``silu=True`` to fuse the activation."""
    return GroupNorm(num_groups=num_groups, epsilon=eps, name=name, param_dtype=param_dtype,
                     use_pallas=use_pallas)


class Upsample2D(nn.Module):
    """Nearest x2 (or to explicit ``output_size``) upsample, optional 3x3 conv."""

    channels: int
    use_conv: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, output_size: Optional[Tuple[int, int]] = None
    ) -> jnp.ndarray:
        h, w = x.shape[-3], x.shape[-2]
        target = output_size if output_size is not None else (h * 2, w * 2)
        x = nearest_resize(x, target)
        if self.use_conv:
            x = nn.Conv(
                self.channels,
                (3, 3),
                padding=((1, 1), (1, 1)),
                name="conv",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
        return x


class Downsample2D(nn.Module):
    """Stride-2 3x3 conv downsample (diffusers name="op") or stride-2 avg-pool."""

    channels: int
    use_conv: bool = True
    padding: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_conv:
            pad = ((self.padding, self.padding), (self.padding, self.padding))
            if self.padding == 0:
                # torch pads (0,1,0,1) manually in this case
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                pad = ((0, 0), (0, 0))
            return nn.Conv(
                self.channels,
                (3, 3),
                strides=(2, 2),
                padding=pad,
                name="conv",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResnetBlock2D(nn.Module):
    """GroupNorm -> SiLU -> (upsample/downsample) -> conv3x3 -> +temb -> GN -> SiLU -> conv3x3 (+shortcut).

    Supports the reference fork's arbitrary ``output_size`` upsample
    (`model/resnet_block_2d.py:164-184`) plus the ``scale_shift`` time-embedding norm
    used by some backbones. Input/output: (N, H, W, C).
    """

    in_channels: int
    out_channels: Optional[int] = None
    temb_channels: Optional[int] = 512
    groups: int = 32
    groups_out: Optional[int] = None
    eps: float = 1e-6
    time_embedding_norm: str = "default"  # "default" | "scale_shift"
    output_scale_factor: float = 1.0
    use_in_shortcut: Optional[bool] = None
    up: bool = False
    down: bool = False
    skip_time_act: bool = False
    gn_kernel: Optional[object] = None  # GroupNorm use_pallas override
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_tensor: jnp.ndarray,
        temb: Optional[jnp.ndarray] = None,
        output_size: Optional[Tuple[int, int]] = None,
    ) -> jnp.ndarray:
        out_channels = self.out_channels or self.in_channels
        groups_out = self.groups_out or self.groups
        conv = lambda ch, name: nn.Conv(  # noqa: E731
            ch,
            (3, 3),
            padding=((1, 1), (1, 1)),
            name=name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

        hidden_states = group_norm(
            self.groups, self.eps, "norm1", self.dtype, self.param_dtype, self.gn_kernel
        )(input_tensor, silu=True)

        if self.up:
            target = output_size or (hidden_states.shape[-3] * 2, hidden_states.shape[-2] * 2)
            input_tensor = nearest_resize(input_tensor, target)
            hidden_states = nearest_resize(hidden_states, target)
        elif self.down:
            input_tensor = nn.avg_pool(input_tensor, (2, 2), strides=(2, 2))
            hidden_states = nn.avg_pool(hidden_states, (2, 2), strides=(2, 2))

        hidden_states = conv(out_channels, "conv1")(hidden_states)

        temb_proj = None
        if temb is not None and self.temb_channels is not None:
            if not self.skip_time_act:
                temb = nn.silu(temb)
            proj_dim = 2 * out_channels if self.time_embedding_norm == "scale_shift" else out_channels
            temb_proj = nn.Dense(
                proj_dim, name="time_emb_proj", dtype=self.dtype, param_dtype=self.param_dtype
            )(temb)
            temb_proj = temb_proj[:, None, None, :]  # NHWC broadcast

        if self.time_embedding_norm == "default":
            if temb_proj is not None:
                hidden_states = hidden_states + temb_proj
            hidden_states = group_norm(
                groups_out, self.eps, "norm2", self.dtype, self.param_dtype, self.gn_kernel
            )(hidden_states, silu=True)
        elif self.time_embedding_norm == "scale_shift":
            # affine from temb sits between the norm and the activation — not fusable
            time_scale, time_shift = jnp.split(temb_proj, 2, axis=-1)
            hidden_states = group_norm(
                groups_out, self.eps, "norm2", self.dtype, self.param_dtype, self.gn_kernel
            )(hidden_states).astype(hidden_states.dtype)
            hidden_states = hidden_states * (1 + time_scale) + time_shift
            hidden_states = nn.silu(hidden_states)
        else:
            raise ValueError(f"unknown time_embedding_norm: {self.time_embedding_norm}")

        hidden_states = conv(out_channels, "conv2")(hidden_states)

        use_in_shortcut = (
            self.in_channels != out_channels if self.use_in_shortcut is None else self.use_in_shortcut
        )
        if use_in_shortcut:
            input_tensor = nn.Conv(
                out_channels,
                (1, 1),
                name="conv_shortcut",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(input_tensor)

        return (input_tensor + hidden_states) / self.output_scale_factor


class TemporalResnetBlock(nn.Module):
    """3D ResNet block with (3,1,1) kernels over (B, F, H, W, C) inputs.

    Parity target: diffusers ``TemporalResnetBlock``
    (`model/adapter_spatial_temporal.py:95-104`). ``temb`` is (B, F, temb_channels).
    """

    in_channels: int
    out_channels: Optional[int] = None
    temb_channels: Optional[int] = 512
    eps: float = 1e-6
    gn_kernel: Optional[object] = None  # GroupNorm use_pallas override
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_tensor: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        out_channels = self.out_channels or self.in_channels
        conv3d = lambda ch, k, name: nn.Conv(  # noqa: E731
            ch,
            k,
            padding=tuple((d // 2, d // 2) for d in k),
            name=name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

        hidden_states = group_norm(
            32, self.eps, "norm1", self.dtype, self.param_dtype, self.gn_kernel
        )(input_tensor, silu=True)
        hidden_states = conv3d(out_channels, (3, 1, 1), "conv1")(hidden_states)

        if temb is not None and self.temb_channels is not None:
            temb = nn.silu(temb)
            temb = nn.Dense(
                out_channels, name="time_emb_proj", dtype=self.dtype, param_dtype=self.param_dtype
            )(temb)
            hidden_states = hidden_states + temb[:, :, None, None, :]  # (B,F,1,1,C)

        hidden_states = group_norm(
            32, self.eps, "norm2", self.dtype, self.param_dtype, self.gn_kernel
        )(hidden_states, silu=True)
        hidden_states = conv3d(out_channels, (3, 1, 1), "conv2")(hidden_states)

        if self.in_channels != out_channels:
            input_tensor = nn.Conv(
                out_channels,
                (1, 1, 1),
                name="conv_shortcut",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(input_tensor)

        return input_tensor + hidden_states


class AlphaBlender(nn.Module):
    """Learned sigmoid blend of spatial vs temporal branches.

    ``alpha = sigmoid(mix_factor)`` (forced to 1 where ``image_only_indicator`` is set
    under the ``learned_with_images`` strategy); output
    ``alpha * x_spatial + (1 - alpha) * x_temporal``.
    Parity target: diffusers ``AlphaBlender`` (`model/adapter_spatial_temporal.py:133-152`).

    Shapes: 5-D (B, F, H, W, C) [NHWC variant of torch's (B, C, F, H, W)] or
    3-D (B*S, F, C) sequence layout; ``image_only_indicator`` is (B, F).
    """

    alpha: float = 0.5
    merge_strategy: str = "learned_with_images"
    switch_spatial_to_temporal_mix: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x_spatial: jnp.ndarray,
        x_temporal: jnp.ndarray,
        image_only_indicator: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if self.merge_strategy == "fixed":
            alpha = jnp.asarray(self.alpha, dtype=x_spatial.dtype)
        else:
            mix_factor = self.param(
                "mix_factor", lambda _: jnp.full((1,), self.alpha, dtype=self.param_dtype)
            )
            if self.merge_strategy == "learned":
                alpha = jax.nn.sigmoid(mix_factor)
            elif self.merge_strategy == "learned_with_images":
                assert image_only_indicator is not None
                alpha = jnp.where(
                    image_only_indicator.astype(bool),
                    jnp.ones_like(image_only_indicator, dtype=jnp.float32),
                    jax.nn.sigmoid(mix_factor)[..., None],
                )  # (B, F)
                if x_spatial.ndim == 5:
                    alpha = alpha[:, :, None, None, None]  # (B, F, 1, 1, 1) over (B,F,H,W,C)
                elif x_spatial.ndim == 3:
                    alpha = alpha.reshape(-1)[:, None, None]
                else:
                    raise ValueError(f"unexpected ndim {x_spatial.ndim}")
            else:
                raise ValueError(self.merge_strategy)

        alpha = alpha.astype(x_spatial.dtype)
        if self.switch_spatial_to_temporal_mix:
            alpha = 1.0 - alpha
        return x_spatial * alpha + x_temporal * (1.0 - alpha)
