"""TPU-native SegFormer semantic segmentation (flax).

The reference's segmentation extractor runs SegFormer-b5 (ADE20K, 150 classes)
through transformers torch on GPU (`model/ctrl_helper.py:92-99,205-212`). This is the
same MiT (Mix Transformer) architecture as a flax module so segmentation-map
extraction runs on the TPU.

Architecture (matches transformers ``SegformerForSemanticSegmentation``):
- 4-stage hierarchical encoder: overlapping patch-embed convs (7/4/3 then 3/2/1),
  pre-LN blocks with spatial-reduction ("efficient") self-attention and Mix-FFN
  (dense -> 3x3 depthwise conv -> GELU -> dense), per-stage final LayerNorm;
- all-MLP decode head: per-stage linear to ``decoder_hidden_size``, bilinear
  upsample to stage-1 resolution, concat (deepest first), 1x1 fuse conv +
  BatchNorm(eval) + ReLU, 1x1 classifier -> (b, h/4, w/4, num_labels) logits.

Weights convert with :func:`convert_segformer_state_dict` (parity-tested against the
torch oracle in tests/test_segformer.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import bilinear_resize


@dataclasses.dataclass(frozen=True)
class SegformerConfig:
    num_labels: int = 150
    hidden_sizes: Tuple[int, ...] = (64, 128, 320, 512)  # b5
    depths: Tuple[int, ...] = (3, 6, 40, 3)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    patch_sizes: Tuple[int, ...] = (7, 3, 3, 3)
    strides: Tuple[int, ...] = (4, 2, 2, 2)
    mlp_ratios: Tuple[int, ...] = (4, 4, 4, 4)
    decoder_hidden_size: int = 768
    layer_norm_eps: float = 1e-6
    batch_norm_eps: float = 1e-5


SEGFORMER_B5_ADE_CONFIG = SegformerConfig()


class _EfficientBlock(nn.Module):
    """One SegFormer layer: pre-LN SR-attention + pre-LN Mix-FFN, both residual."""

    hidden: int
    heads: int
    sr: int
    mlp_ratio: int
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
        b, t, c = x.shape
        h, w = hw
        hd = self.hidden // self.heads
        ln = lambda name: nn.LayerNorm(epsilon=self.eps, name=name, dtype=jnp.float32)  # noqa: E731

        a = ln("layer_norm_1")(x).astype(self.dtype)
        q = nn.Dense(self.hidden, name="query", dtype=self.dtype)(a)
        kv_in = a
        if self.sr > 1:
            fmap = a.reshape(b, h, w, c)
            fmap = nn.Conv(self.hidden, (self.sr, self.sr), strides=(self.sr, self.sr),
                           name="sr", dtype=self.dtype)(fmap)
            kv_in = ln("sr_layer_norm")(
                fmap.reshape(b, -1, c)).astype(self.dtype)
        k = nn.Dense(self.hidden, name="key", dtype=self.dtype)(kv_in)
        v = nn.Dense(self.hidden, name="value", dtype=self.dtype)(kv_in)
        att = jax.nn.dot_product_attention(
            q.reshape(b, t, self.heads, hd).astype(jnp.float32),
            k.reshape(b, -1, self.heads, hd).astype(jnp.float32),
            v.reshape(b, -1, self.heads, hd).astype(jnp.float32),
        ).astype(self.dtype).reshape(b, t, self.hidden)
        x = x + nn.Dense(self.hidden, name="attn_out", dtype=self.dtype)(att)

        m = ln("layer_norm_2")(x).astype(self.dtype)
        inner = self.hidden * self.mlp_ratio
        m = nn.Dense(inner, name="dense1", dtype=self.dtype)(m)
        m = m.reshape(b, h, w, inner)
        m = nn.Conv(inner, (3, 3), padding=1, feature_group_count=inner,
                    name="dwconv", dtype=self.dtype)(m)
        m = jax.nn.gelu(m.reshape(b, t, inner), approximate=False)
        return x + nn.Dense(self.hidden, name="dense2", dtype=self.dtype)(m)


class SegformerForSemanticSegmentation(nn.Module):
    """(b, H, W, 3) normalized pixels -> (b, H/4, W/4, num_labels) logits."""

    config: SegformerConfig = SEGFORMER_B5_ADE_CONFIG
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b = pixel_values.shape[0]
        x = pixel_values
        features = []
        for s in range(len(cfg.hidden_sizes)):
            p, st, c = cfg.patch_sizes[s], cfg.strides[s], cfg.hidden_sizes[s]
            x = nn.Conv(c, (p, p), strides=(st, st), padding=p // 2,
                        name=f"patch_embed_{s}", dtype=self.dtype)(x)
            h, w = x.shape[1], x.shape[2]
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=f"patch_norm_{s}",
                             dtype=jnp.float32)(x.reshape(b, h * w, c)).astype(self.dtype)
            for j in range(cfg.depths[s]):
                x = _EfficientBlock(
                    c, cfg.num_heads[s], cfg.sr_ratios[s], cfg.mlp_ratios[s],
                    cfg.layer_norm_eps, name=f"block_{s}_{j}", dtype=self.dtype,
                )(x, (h, w))
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=f"stage_norm_{s}",
                             dtype=jnp.float32)(x).astype(self.dtype)
            x = x.reshape(b, h, w, c)
            features.append(x)

        # --- all-MLP decode head (`modeling_segformer.py: SegformerDecodeHead`)
        target_hw = features[0].shape[1:3]
        unified = []
        for s, feat in enumerate(features):
            u = nn.Dense(cfg.decoder_hidden_size, name=f"linear_c_{s}",
                         dtype=self.dtype)(feat)
            if u.shape[1:3] != target_hw:
                u = bilinear_resize(u, target_hw)
            unified.append(u)
        fused = jnp.concatenate(unified[::-1], axis=-1)  # deepest first
        fused = nn.Conv(cfg.decoder_hidden_size, (1, 1), use_bias=False,
                        name="linear_fuse", dtype=self.dtype)(fused)
        # eval-mode BatchNorm: running statistics as affine constants
        mean = self.param("bn_mean", nn.initializers.zeros, (cfg.decoder_hidden_size,))
        var = self.param("bn_var", nn.initializers.ones, (cfg.decoder_hidden_size,))
        scale = self.param("bn_scale", nn.initializers.ones, (cfg.decoder_hidden_size,))
        bias = self.param("bn_bias", nn.initializers.zeros, (cfg.decoder_hidden_size,))
        fused = (fused.astype(jnp.float32) - mean) * jax.lax.rsqrt(
            var + cfg.batch_norm_eps) * scale + bias
        fused = jax.nn.relu(fused).astype(self.dtype)
        return nn.Conv(cfg.num_labels, (1, 1), name="classifier",
                       dtype=self.dtype)(fused)


def convert_segformer_state_dict(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """transformers SegformerForSemanticSegmentation state dict -> flax params."""
    params: Dict = {}

    def put(scope: str, leaf: str, value: np.ndarray):
        params.setdefault(scope, {})[leaf] = value

    def dense(scope: str, key: str, v: np.ndarray):
        put(scope, "kernel" if key.endswith("weight") else "bias",
            v.T if key.endswith("weight") else v)

    def conv(scope: str, key: str, v: np.ndarray):
        put(scope, "kernel" if key.endswith("weight") else "bias",
            v.transpose(2, 3, 1, 0) if key.endswith("weight") else v)

    def norm(scope: str, key: str, v: np.ndarray):
        put(scope, "scale" if key.endswith("weight") else "bias", v)

    for key, v in state_dict.items():
        v = np.asarray(v)
        parts = key.split(".")
        if parts[0] == "segformer":
            parts = parts[2:]  # drop "segformer.encoder."
            if parts[0] == "patch_embeddings":
                s = parts[1]
                if parts[2] == "proj":
                    conv(f"patch_embed_{s}", key, v)
                else:
                    norm(f"patch_norm_{s}", key, v)
            elif parts[0] == "block":
                s, j = parts[1], parts[2]
                scope = f"block_{s}_{j}"
                rest = ".".join(parts[3:])
                node = params.setdefault(scope, {})

                def sub(name, leaf, val):
                    node.setdefault(name, {})[leaf] = val

                if rest.startswith("layer_norm_1.") or rest.startswith("layer_norm_2."):
                    sub(parts[3], "scale" if rest.endswith("weight") else "bias", v)
                elif rest.startswith("attention.self.sr."):
                    sub("sr", "kernel" if rest.endswith("weight") else "bias",
                        v.transpose(2, 3, 1, 0) if rest.endswith("weight") else v)
                elif rest.startswith("attention.self.layer_norm."):
                    sub("sr_layer_norm", "scale" if rest.endswith("weight") else "bias", v)
                elif rest.startswith("attention.self."):
                    which = parts[5]  # query/key/value
                    leaf = "kernel" if rest.endswith("weight") else "bias"
                    sub(which, leaf, v.T if leaf == "kernel" else v)
                elif rest.startswith("attention.output.dense."):
                    leaf = "kernel" if rest.endswith("weight") else "bias"
                    sub("attn_out", leaf, v.T if leaf == "kernel" else v)
                elif rest.startswith("mlp.dense1.") or rest.startswith("mlp.dense2."):
                    leaf = "kernel" if rest.endswith("weight") else "bias"
                    sub(parts[4], leaf, v.T if leaf == "kernel" else v)
                elif rest.startswith("mlp.dwconv."):
                    sub("dwconv", "kernel" if rest.endswith("weight") else "bias",
                        v.transpose(2, 3, 1, 0) if rest.endswith("weight") else v)
            elif parts[0] == "layer_norm":
                norm(f"stage_norm_{parts[1]}", key, v)
        elif parts[0] == "decode_head":
            rest = ".".join(parts[1:])
            if rest.startswith("linear_c."):
                dense(f"linear_c_{parts[2]}", key, v)
            elif rest.startswith("linear_fuse."):
                conv("linear_fuse", key, v)
            elif rest.startswith("batch_norm."):
                leaf = {"weight": "bn_scale", "bias": "bn_bias",
                        "running_mean": "bn_mean", "running_var": "bn_var"}.get(parts[2])
                if leaf:
                    params[leaf] = v
            elif rest.startswith("classifier."):
                conv("classifier", key, v)
    return params
