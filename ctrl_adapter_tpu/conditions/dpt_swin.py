"""MiDaS ``dpt_swin2_large_384`` depth model, TPU-native (flax).

Parity target: the reference's flagship depth extractor
(`utils/run_depth.py:125-148` DepthMidas with ``dpt_swin2_large_384``):
SwinV2-L backbone (see :mod:`.swin2`) + the MiDaS DPT scratch/refinenet head
(`utils/MiDaS/midas/dpt_depth.py:110-139`, `midas/blocks.py:379-438`):

- per-stage 3x3 ``layerN_rn`` convs (bias-free) to 256 channels;
- RefineNet-style top-down fusion: ``path = resConfUnit2(path + resConfUnit1(skip))``
  upsampled bilinear align_corners=True to the next stage size, then a 1x1
  ``out_conv``;
- head: conv3x3(256->128) -> x2 bilinear -> conv3x3(128->32) -> relu ->
  conv1x1(32->1) -> relu (`dpt_depth.py:151-160`).

Pre/post-processing matches `run_depth.py` + `midas/model_loader.py:79-88`:
input resized to 512^2 then 384^2 (cubic), normalized (x-0.5)/0.5; the 384^2
inverse-depth prediction is resized back bicubic and min-max normalized to a
grayscale PIL image (`midas/utils.py` create_side_by_side grayscale path).
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import bilinear_resize_align_corners
from .swin2 import SWIN2_LARGE_384, SwinV2Backbone, SwinV2Config


class _ResidualConvUnit(nn.Module):
    """relu -> conv3x3 -> relu -> conv3x3 -> +residual (blocks.py:325-376)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                      name="conv1", dtype=self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                      name="conv2", dtype=self.dtype)(out)
        return out + x


class _FusionBlock(nn.Module):
    """FeatureFusionBlock_custom (blocks.py:379-438), align_corners=True."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray = None,
                 size=None) -> jnp.ndarray:
        if skip is not None:
            x = x + _ResidualConvUnit(self.features, name="resConfUnit1",
                                      dtype=self.dtype)(skip)
        x = _ResidualConvUnit(self.features, name="resConfUnit2",
                              dtype=self.dtype)(x)
        target = size if size is not None else (x.shape[1] * 2, x.shape[2] * 2)
        x = bilinear_resize_align_corners(x, target)
        return nn.Conv(self.features, (1, 1), name="out_conv",
                       dtype=self.dtype)(x)


class DPTSwinDepthModel(nn.Module):
    """SwinV2 backbone + MiDaS scratch head -> (b, 384, 384) inverse depth."""

    config: SwinV2Config = SWIN2_LARGE_384
    features: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        layers = SwinV2Backbone(config=self.config, name="backbone",
                                dtype=self.dtype)(pixels)
        rn = []
        for i, feat in enumerate(layers):
            rn.append(nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                              use_bias=False, name=f"layer{i + 1}_rn",
                              dtype=self.dtype)(feat))
        l1, l2, l3, l4 = rn
        fusion = lambda name: _FusionBlock(  # noqa: E731
            self.features, name=name, dtype=self.dtype)
        path4 = fusion("refinenet4")(l4, size=l3.shape[1:3])
        path3 = fusion("refinenet3")(path4, l3, size=l2.shape[1:3])
        path2 = fusion("refinenet2")(path3, l2, size=l1.shape[1:3])
        path1 = fusion("refinenet1")(path2, l1)

        x = nn.Conv(self.features // 2, (3, 3), padding=((1, 1), (1, 1)),
                    name="output_conv_0", dtype=self.dtype)(path1)
        x = bilinear_resize_align_corners(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), name="output_conv_2",
                    dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), name="output_conv_4", dtype=self.dtype)(x)
        x = nn.relu(x)
        return x[..., 0]


_SKIP_BUFFERS = ("relative_coords_table", "relative_position_index", "attn_mask",
                 "head.")


def convert_midas_swin_state_dict(sd: Mapping[str, np.ndarray]) -> Dict:
    """MiDaS ``dpt_swin2_*.pt`` state dict -> flax param tree for
    :class:`DPTSwinDepthModel`.

    Key mapping: ``pretrained.model.X`` -> ``backbone/X`` (timm swinv2 names),
    ``scratch.X`` -> head names; static buffers (relative position tables /
    indices, shift masks) are recomputed in flax and skipped here.
    """
    from ..convert.torch_to_jax import convert_state_dict

    remapped = {}
    for key, value in sd.items():
        if any(s in key for s in _SKIP_BUFFERS):
            continue
        if key.startswith("pretrained.model."):
            remapped["backbone." + key[len("pretrained.model."):]] = value
        elif key.startswith("scratch."):
            remapped[key[len("scratch."):]] = value
    return {"params": convert_state_dict(remapped)}


class DepthDPTSwin:
    """Drop-in estimator for ``dpt_swin2_large_384`` checkpoints, matching
    ``DepthMidas.estimate`` outputs (`run_depth.py:137-148`)."""

    def __init__(self, checkpoint_path: str, config: SwinV2Config = SWIN2_LARGE_384):
        import torch

        sd = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
            sd = sd["model"]
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
              for k, v in sd.items()}
        if not any(k.startswith("pretrained.model.") for k in sd):
            raise KeyError("not a MiDaS DPT checkpoint (no pretrained.model.*)")
        self.model = DPTSwinDepthModel(config=config)
        self.params = convert_midas_swin_state_dict(sd)
        self._fwd = jax.jit(lambda p, x: self.model.apply(p, x))

    def __call__(self, images) -> List["object"]:
        import cv2
        from PIL import Image

        cfg = self.model.config
        batch = []
        sizes = []
        for im in images:
            arr = np.asarray(im.convert("RGB") if hasattr(im, "convert") else im)
            sizes.append(arr.shape[:2])
            small = cv2.resize(arr, (cfg.img_size, cfg.img_size),
                               interpolation=cv2.INTER_CUBIC)
            batch.append((small.astype(np.float32) / 255.0 - 0.5) / 0.5)
        pred = np.asarray(self._fwd(self.params, jnp.asarray(np.stack(batch))))
        out = []
        for p, (h, w) in zip(pred, sizes):
            up = cv2.resize(p, (w, h), interpolation=cv2.INTER_CUBIC)
            lo, hi = float(up.min()), float(up.max())
            norm = (up - lo) / (hi - lo) if hi > lo else np.zeros_like(up)
            gray = (255.0 * norm).astype(np.uint8)
            out.append(Image.fromarray(np.stack([gray] * 3, axis=-1), "RGB"))
        return out
