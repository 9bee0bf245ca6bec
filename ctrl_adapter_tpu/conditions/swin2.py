"""TPU-native SwinV2 backbone (flax) for MiDaS ``dpt_swin2_*`` depth models.

The reference's flagship depth checkpoint is ``dpt_swin2_large_384``
(`utils/run_depth.py:125-148`), whose backbone is timm's
``swinv2_large_window12to24_192to384_22kft1k`` — SwinV2 (arXiv 2111.09883):
post-norm blocks, cosine window attention with a learned per-head temperature
(``logit_scale``), and a continuous log-spaced relative-position bias produced
by a small MLP (``cpb_mlp``). MiDaS hooks the LAST block of each stage
(pre-downsample), giving a 4-level pyramid at /4 /8 /16 /32 with channels
C, 2C, 4C, 8C (`utils/MiDaS/midas/backbones/swin_common.py:14-52`).

TPU-native design:
- the token grid stays (B, H, W, C) NHWC end-to-end; window partition is a pair
  of static reshapes (no gather);
- the relative-position index and the shifted-window attention mask are static
  numpy constants folded into the jitted graph; only ``cpb_mlp`` runs per call
  (a (2W-1)^2 x 2 matmul — negligible);
- cosine attention normalizes q/k then uses one fp32-softmax einsum chain; the
  window sequence length (<=576) is small, so flash attention is unnecessary.

Weight layout matches timm state-dict names mechanically via
:func:`ctrl_adapter_tpu.convert.torch_to_jax.convert_state_dict`
(``layers.0.blocks.1.attn.qkv.weight`` -> ``layers_0/blocks_1/attn/qkv/kernel``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SwinV2Config:
    img_size: int = 384
    patch_size: int = 4
    embed_dim: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window_size: int = 24
    pretrained_window_sizes: Tuple[int, ...] = (12, 12, 12, 6)
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-5


SWIN2_LARGE_384 = SwinV2Config()


def _relative_coords_table(window: int, pretrained_window: int) -> np.ndarray:
    """Log-spaced normalized relative coordinates, (1, 2W-1, 2W-1, 2) fp32
    (timm ``WindowAttention.relative_coords_table``)."""
    coords_h = np.arange(-(window - 1), window, dtype=np.float32)
    table = np.stack(np.meshgrid(coords_h, coords_h, indexing="ij"), axis=-1)[None]
    denom = (pretrained_window - 1) if pretrained_window > 0 else (window - 1)
    table = table / max(denom, 1)
    table = table * 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.astype(np.float32)


def _relative_position_index(window: int) -> np.ndarray:
    """(W^2, W^2) int32 index into the flattened (2W-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # (2, W, W)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, W^2, W^2)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1).astype(np.int32)


def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> Optional[np.ndarray]:
    """Additive (-100 in disallowed pairs) mask per window for shifted blocks,
    (num_windows, W^2, W^2) fp32; None when shift == 0."""
    if shift == 0:
        return None
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, h // window, window, w // window, window, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, window*window, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def _window_reverse(x: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0] // ((h // window) * (w // window))
    x = x.reshape(b, h // window, w // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, x.shape[-1])


class WindowAttentionV2(nn.Module):
    """Cosine attention with continuous position bias (timm SwinV2)."""

    dim: int
    num_heads: int
    window: int
    pretrained_window: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[np.ndarray]) -> jnp.ndarray:
        bw, n, c = x.shape
        hd = self.dim // self.num_heads

        q_bias = self.param("q_bias", nn.initializers.zeros, (self.dim,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (self.dim,))
        qkv = nn.Dense(3 * self.dim, use_bias=False, name="qkv",
                       dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q + q_bias.astype(q.dtype)
        v = v + v_bias.astype(v.dtype)
        q = q.reshape(bw, n, self.num_heads, hd)
        k = k.reshape(bw, n, self.num_heads, hd)
        v = v.reshape(bw, n, self.num_heads, hd)

        # cosine attention with clamped learned per-head temperature
        logit_scale = self.param(
            "logit_scale", lambda r: jnp.full((self.num_heads, 1, 1),
                                              math.log(10.0), jnp.float32))
        qn = q / jnp.maximum(jnp.linalg.norm(q.astype(jnp.float32), axis=-1,
                                             keepdims=True), 1e-12).astype(q.dtype)
        kn = k / jnp.maximum(jnp.linalg.norm(k.astype(jnp.float32), axis=-1,
                                             keepdims=True), 1e-12).astype(k.dtype)
        attn = jnp.einsum("bnhd,bmhd->bhnm", qn.astype(jnp.float32),
                          kn.astype(jnp.float32))
        scale = jnp.exp(jnp.minimum(logit_scale, math.log(1.0 / 0.01)))
        attn = attn * scale[None]

        # continuous position bias: cpb_mlp(log-coords table) gathered by the
        # static relative index, 16*sigmoid (timm WindowAttention forward)
        table = jnp.asarray(
            _relative_coords_table(self.window, self.pretrained_window))
        t = nn.Dense(512, name="cpb_mlp_0", dtype=jnp.float32)(table)
        t = nn.relu(t)
        t = nn.Dense(self.num_heads, use_bias=False, name="cpb_mlp_2",
                     dtype=jnp.float32)(t)
        t = t.reshape(-1, self.num_heads)  # ((2W-1)^2, H)
        idx = jnp.asarray(_relative_position_index(self.window).reshape(-1))
        bias = t[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        attn = attn + 16.0 * jax.nn.sigmoid(bias)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, self.num_heads, n, n)
            attn = attn + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(bw, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bw, n, self.dim)
        return nn.Dense(self.dim, name="proj", dtype=self.dtype)(out)


class SwinV2Block(nn.Module):
    dim: int
    num_heads: int
    resolution: Tuple[int, int]
    window_size: int
    shift_size: int
    pretrained_window: int
    mlp_ratio: float = 4.0
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.resolution
        window, shift = self.window_size, self.shift_size
        b = x.shape[0]

        shortcut = x
        xg = x.reshape(b, h, w, self.dim)
        if shift > 0:
            xg = jnp.roll(xg, (-shift, -shift), axis=(1, 2))
        windows = _window_partition(xg, window)
        mask = _shift_attn_mask(h, w, window, shift)
        attn = WindowAttentionV2(
            dim=self.dim, num_heads=self.num_heads, window=window,
            pretrained_window=self.pretrained_window, name="attn",
            dtype=self.dtype,
        )(windows, mask)
        xg = _window_reverse(attn, window, h, w)
        if shift > 0:
            xg = jnp.roll(xg, (shift, shift), axis=(1, 2))
        x = xg.reshape(b, h * w, self.dim)
        # SwinV2 res-post-norm: norm AFTER the sublayer, then residual
        x = shortcut + nn.LayerNorm(epsilon=self.eps, name="norm1",
                                    dtype=jnp.float32)(x).astype(x.dtype)

        hmid = _Mlp(hidden=int(self.dim * self.mlp_ratio), out=self.dim,
                    name="mlp", dtype=self.dtype)(x)
        x = x + nn.LayerNorm(epsilon=self.eps, name="norm2",
                             dtype=jnp.float32)(hmid).astype(x.dtype)
        return x


class _Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, name="fc1", dtype=self.dtype)(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2", dtype=self.dtype)(x)


class PatchMergingV2(nn.Module):
    dim: int
    resolution: Tuple[int, int]
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.resolution
        b = x.shape[0]
        xg = x.reshape(b, h, w, self.dim)
        x0 = xg[:, 0::2, 0::2]
        x1 = xg[:, 1::2, 0::2]
        x2 = xg[:, 0::2, 1::2]
        x3 = xg[:, 1::2, 1::2]
        xg = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        xg = xg.reshape(b, (h // 2) * (w // 2), 4 * self.dim)
        xg = nn.Dense(2 * self.dim, use_bias=False, name="reduction",
                      dtype=self.dtype)(xg)
        # v2: norm AFTER reduction
        return nn.LayerNorm(epsilon=self.eps, name="norm",
                            dtype=jnp.float32)(xg).astype(xg.dtype)


class _PatchEmbed(nn.Module):
    embed_dim: int
    patch_size: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        b = pixels.shape[0]
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    name="proj", dtype=self.dtype)(pixels)
        x = x.reshape(b, -1, self.embed_dim)
        return nn.LayerNorm(epsilon=self.eps, name="norm",
                            dtype=jnp.float32)(x).astype(x.dtype)


class _Stage(nn.Module):
    """One swin stage: blocks then optional downsample (timm ``BasicLayer``
    nesting so checkpoint keys ``layers.{i}.blocks.{j}`` convert mechanically)."""

    dim: int
    depth: int
    num_heads: int
    resolution: int
    window_size: int
    pretrained_window: int
    mlp_ratio: float
    eps: float
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        res = self.resolution
        window = min(self.window_size, res)
        for j in range(self.depth):
            shift = 0 if (j % 2 == 0 or res <= window) else window // 2
            x = SwinV2Block(
                dim=self.dim, num_heads=self.num_heads, resolution=(res, res),
                window_size=window, shift_size=shift,
                pretrained_window=self.pretrained_window,
                mlp_ratio=self.mlp_ratio, eps=self.eps,
                name=f"blocks_{j}", dtype=self.dtype,
            )(x)
        feature = x.reshape(x.shape[0], res, res, self.dim)
        if self.add_downsample:
            x = PatchMergingV2(dim=self.dim, resolution=(res, res), eps=self.eps,
                               name="downsample", dtype=self.dtype)(x)
        return x, feature


class SwinV2Backbone(nn.Module):
    """Returns the 4-stage feature pyramid as NHWC grids (MiDaS hook points:
    last block of each stage, pre-downsample)."""

    config: SwinV2Config = SWIN2_LARGE_384
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> List[jnp.ndarray]:
        cfg = self.config
        grid = cfg.img_size // cfg.patch_size
        x = _PatchEmbed(cfg.embed_dim, cfg.patch_size, cfg.layer_norm_eps,
                        name="patch_embed", dtype=self.dtype)(pixels)

        features: List[jnp.ndarray] = []
        dim = cfg.embed_dim
        res = grid
        for i, depth in enumerate(cfg.depths):
            x, feature = _Stage(
                dim=dim, depth=depth, num_heads=cfg.num_heads[i], resolution=res,
                window_size=cfg.window_size,
                pretrained_window=cfg.pretrained_window_sizes[i],
                mlp_ratio=cfg.mlp_ratio, eps=cfg.layer_norm_eps,
                add_downsample=i < len(cfg.depths) - 1,
                name=f"layers_{i}", dtype=self.dtype,
            )(x)
            features.append(feature)
            if i < len(cfg.depths) - 1:
                dim *= 2
                res //= 2
        return features
