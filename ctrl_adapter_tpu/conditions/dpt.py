"""TPU-native DPT monocular depth estimation (flax).

The reference's default depth extractor is the transformers depth-estimation
pipeline (Intel/dpt-large) running torch on GPU (`model/ctrl_helper.py:74-81`;
`utils/run_depth.py` is the optional custom-checkpoint MiDaS path). This is the same
DPT architecture as a flax module so depth extraction — the highest-volume condition
in the blessed configs — runs on the TPU alongside the diffusion stack.

Architecture (matches transformers ``DPTForDepthEstimation``, non-hybrid):
- ViT backbone: 16x16 patch conv + CLS token + interpolated position embeddings,
  pre-LN transformer layers (LN -> MHSA -> +res, LN -> GELU MLP -> +res);
- reassemble: hidden states at ``backbone_out_indices`` -> CLS-readout projection
  ("project") -> per-stage 1x1 channel projection -> resize (x4, x2, x1, x0.5);
- neck: 3x3 convs (no bias) to ``fusion_hidden_size``, RefineNet-style fusion with
  pre-activated residual units and align_corners=True x2 upsamples;
- head: conv -> x2 upsample -> conv -> relu -> 1x1 conv -> relu -> (b, h', w') depth.

Weights convert from the torch checkpoint with :func:`convert_dpt_state_dict`
(parity-tested against the torch oracle in tests/test_dpt.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import bilinear_resize, bilinear_resize_align_corners


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 16
    image_size: int = 384
    layer_norm_eps: float = 1e-12
    backbone_out_indices: Tuple[int, ...] = (5, 11, 17, 23)
    neck_hidden_sizes: Tuple[int, ...] = (256, 512, 1024, 1024)
    reassemble_factors: Tuple[float, ...] = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 256


DPT_LARGE_CONFIG = DPTConfig()


class _ViTLayer(nn.Module):
    cfg: DPTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b, t, _ = x.shape
        hd = cfg.hidden_size // cfg.num_heads
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm_before",
                         dtype=jnp.float32)(x).astype(self.dtype)
        dense = lambda name: nn.Dense(cfg.hidden_size, name=name, dtype=self.dtype)  # noqa: E731
        q = dense("query")(h).reshape(b, t, cfg.num_heads, hd)
        k = dense("key")(h).reshape(b, t, cfg.num_heads, hd)
        v = dense("value")(h).reshape(b, t, cfg.num_heads, hd)
        att = jax.nn.dot_product_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        ).astype(self.dtype)
        x = x + dense("attn_out")(att.reshape(b, t, cfg.hidden_size))
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm_after",
                         dtype=jnp.float32)(x).astype(self.dtype)
        h = nn.Dense(cfg.intermediate_size, name="mlp_in", dtype=self.dtype)(h)
        h = jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(cfg.hidden_size, name="mlp_out", dtype=self.dtype)(h)


class _PreActResidual(nn.Module):
    cfg: DPTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda name: nn.Conv(  # noqa: E731
            self.cfg.fusion_hidden_size, (3, 3), padding=1, name=name, dtype=self.dtype)
        h = conv("convolution1")(jax.nn.relu(x))
        h = conv("convolution2")(jax.nn.relu(h))
        return h + x


class DPTForDepthEstimation(nn.Module):
    """(b, H, W, 3) DPT-normalized pixels -> (b, H', W') relative inverse depth,
    where H' = H/16*2 (the head's final x2 upsample of the highest-res fusion map)."""

    config: DPTConfig = DPT_LARGE_CONFIG
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b, H, W, _ = pixel_values.shape
        ph, pw = H // cfg.patch_size, W // cfg.patch_size

        # --- ViT backbone, collecting hidden states at backbone_out_indices
        patches = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          name="patch_projection", dtype=self.dtype)(pixel_values)
        patches = patches.reshape(b, ph * pw, cfg.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size))
        grid = cfg.image_size // cfg.patch_size
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, grid * grid + 1, cfg.hidden_size))
        pos_tok, pos_grid = pos[:, :1], pos[0, 1:]
        if (ph, pw) != (grid, grid):  # interpolate to the input grid (`modeling_dpt.py:201-210`)
            pos_grid = bilinear_resize(
                pos_grid.reshape(grid, grid, cfg.hidden_size), (ph, pw))
        pos_grid = pos_grid.reshape(1, ph * pw, cfg.hidden_size)
        x = jnp.concatenate([jnp.tile(cls.astype(patches.dtype), (b, 1, 1)), patches], axis=1)
        x = x + jnp.concatenate([pos_tok, pos_grid], axis=1).astype(patches.dtype)

        collected = []
        want = set(cfg.backbone_out_indices)
        for i in range(cfg.num_layers):
            x = _ViTLayer(cfg, name=f"layers_{i}", dtype=self.dtype)(x)
            if i in want:
                collected.append(x)

        # --- reassemble (readout_type="project") + per-stage resize
        feats = []
        for s, hs in enumerate(collected):
            cls_tok, tokens = hs[:, 0], hs[:, 1:]
            readout = jnp.tile(cls_tok[:, None], (1, tokens.shape[1], 1))
            proj = nn.Dense(cfg.hidden_size, name=f"readout_project_{s}",
                            dtype=self.dtype)(jnp.concatenate([tokens, readout], -1))
            proj = jax.nn.gelu(proj, approximate=False)
            fmap = proj.reshape(b, ph, pw, cfg.hidden_size)
            ch = cfg.neck_hidden_sizes[s]
            fmap = nn.Conv(ch, (1, 1), name=f"reassemble_projection_{s}",
                           dtype=self.dtype)(fmap)
            factor = cfg.reassemble_factors[s]
            if factor > 1:
                f = int(factor)
                fmap = nn.ConvTranspose(ch, (f, f), strides=(f, f),
                                        name=f"reassemble_resize_{s}",
                                        transpose_kernel=True, dtype=self.dtype)(fmap)
            elif factor < 1:
                fmap = nn.Conv(ch, (3, 3), strides=(int(1 / factor),) * 2, padding=1,
                               name=f"reassemble_resize_{s}", dtype=self.dtype)(fmap)
            fmap = nn.Conv(cfg.fusion_hidden_size, (3, 3), padding=1, use_bias=False,
                           name=f"neck_conv_{s}", dtype=self.dtype)(fmap)
            feats.append(fmap)

        # --- RefineNet fusion, deepest first (`modeling_dpt.py:629-643,727-742`)
        fused = None
        for s, feat in enumerate(feats[::-1]):
            scope = f"fusion_{s}"
            if fused is not None:
                if fused.shape[1:3] != feat.shape[1:3]:
                    feat = bilinear_resize(feat, fused.shape[1:3])
                fused = fused + _PreActResidual(
                    cfg, name=f"{scope}_residual_layer1", dtype=self.dtype)(feat)
            else:
                fused = feat
            fused = _PreActResidual(
                cfg, name=f"{scope}_residual_layer2", dtype=self.dtype)(fused)
            fused = bilinear_resize_align_corners(
                fused, (fused.shape[1] * 2, fused.shape[2] * 2))
            fused = nn.Conv(cfg.fusion_hidden_size, (1, 1),
                            name=f"{scope}_projection", dtype=self.dtype)(fused)

        # --- depth head (`modeling_dpt.py:923-958`)
        h = nn.Conv(cfg.fusion_hidden_size // 2, (3, 3), padding=1, name="head_conv1",
                    dtype=self.dtype)(fused)
        h = bilinear_resize_align_corners(h, (h.shape[1] * 2, h.shape[2] * 2))
        h = nn.Conv(32, (3, 3), padding=1, name="head_conv2", dtype=self.dtype)(h)
        h = jax.nn.relu(h)
        h = nn.Conv(1, (1, 1), name="head_conv3", dtype=self.dtype)(h)
        return jax.nn.relu(h)[..., 0]


def convert_dpt_state_dict(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """transformers DPTForDepthEstimation state dict -> flax params for the module
    above (flattened scope names; embedding tables keep their torch layout)."""
    params: Dict = {}

    def put(path: Sequence[str], leaf: str, value: np.ndarray):
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    def linear(prefix_out: str, k: str, v: np.ndarray):
        leaf = "kernel" if k.endswith("weight") else "bias"
        put([prefix_out], leaf, v.T if leaf == "kernel" else v)

    for key, v in state_dict.items():
        v = np.asarray(v)
        parts = key.split(".")
        if key == "dpt.embeddings.cls_token":
            params["cls_token"] = v
        elif key == "dpt.embeddings.position_embeddings":
            params["position_embeddings"] = v
        elif key.startswith("dpt.embeddings.patch_embeddings.projection."):
            put(["patch_projection"],
                "kernel" if key.endswith("weight") else "bias",
                v.transpose(2, 3, 1, 0) if key.endswith("weight") else v)
        elif parts[:3] == ["dpt", "encoder", "layer"]:
            i = parts[3]
            scope = f"layers_{i}"
            rest = ".".join(parts[4:])
            if rest.startswith("attention.attention."):
                which = parts[6]  # query/key/value
                leaf = "kernel" if rest.endswith("weight") else "bias"
                put([scope, which], leaf, v.T if leaf == "kernel" else v)
            elif rest.startswith("attention.output.dense."):
                linear_key = "kernel" if rest.endswith("weight") else "bias"
                put([scope, "attn_out"], linear_key, v.T if linear_key == "kernel" else v)
            elif rest.startswith("intermediate.dense."):
                leaf = "kernel" if rest.endswith("weight") else "bias"
                put([scope, "mlp_in"], leaf, v.T if leaf == "kernel" else v)
            elif rest.startswith("output.dense."):
                leaf = "kernel" if rest.endswith("weight") else "bias"
                put([scope, "mlp_out"], leaf, v.T if leaf == "kernel" else v)
            elif rest.startswith("layernorm_before."):
                put([scope, "layernorm_before"],
                    "scale" if rest.endswith("weight") else "bias", v)
            elif rest.startswith("layernorm_after."):
                put([scope, "layernorm_after"],
                    "scale" if rest.endswith("weight") else "bias", v)
        elif parts[:3] == ["neck", "reassemble_stage", "readout_projects"]:
            s = parts[3]
            linear(f"readout_project_{s}", key, v)
        elif parts[:3] == ["neck", "reassemble_stage", "layers"]:
            s, which = parts[3], parts[4]  # projection | resize
            name = (f"reassemble_projection_{s}" if which == "projection"
                    else f"reassemble_resize_{s}")
            if key.endswith("weight"):
                # ConvTranspose (in, out, kh, kw) with transpose_kernel=True expects
                # (kh, kw, out, in) — same (2,3,1,0) transpose as Conv (out, in, kh, kw).
                put([name], "kernel", v.transpose(2, 3, 1, 0))
            else:
                put([name], "bias", v)
        elif parts[:2] == ["neck", "convs"]:
            put([f"neck_conv_{parts[2]}"], "kernel", v.transpose(2, 3, 1, 0))
        elif parts[:2] == ["neck", "fusion_stage"]:
            # torch fusion layers run deepest-first in forward order, so torch layer s
            # IS our fusion_{s} scope.
            s, which = parts[3], parts[4]
            if which == "projection":
                put([f"fusion_{s}_projection"],
                    "kernel" if key.endswith("weight") else "bias",
                    v.transpose(2, 3, 1, 0) if key.endswith("weight") else v)
            else:  # residual_layer1 / residual_layer2 . convolutionN
                conv = parts[5]
                put([f"fusion_{s}_{which}", conv],
                    "kernel" if key.endswith("weight") else "bias",
                    v.transpose(2, 3, 1, 0) if key.endswith("weight") else v)
        elif parts[:2] == ["head", "head"]:
            idx = {"0": "head_conv1", "2": "head_conv2", "4": "head_conv3"}[parts[2]]
            put([idx], "kernel" if key.endswith("weight") else "bias",
                v.transpose(2, 3, 1, 0) if key.endswith("weight") else v)
        # (dpt.layernorm / pooler weights exist in some checkpoints but are unused by
        # the depth head; silently skipped)
    return params
