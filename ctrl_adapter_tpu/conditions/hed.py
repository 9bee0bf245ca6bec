"""TPU-native HED soft-edge detection (flax) — the scribble/softedge frontend.

The reference's scribble extractor is controlnet_aux's ``HEDdetector``
(`model/ctrl_helper.py:110-116`, used with ``scribble=True`` at `:196-199`), which
runs "ControlNetHED" — a VGG-style holistically-nested edge-detection network: five
conv stages (channels 64/128/256/512/512, 2x maxpool between stages), a 1x1 "side"
projection per stage to a single edge channel, each bilinearly upsampled to input
resolution, and the five side maps averaged after sigmoid. A learned per-pixel
``norm`` projection scales the RGB input first.

This module implements that architecture in flax with a torch-state-dict converter
(``ControlNetHED.pth`` from the released annotator weights loads directly); the
scribble post-processing (threshold + nms-free binarization) matches controlnet_aux's
``scribble=True`` branch.
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import bilinear_resize

# channels per VGG stage and convs per stage (VGG16 feature config)
_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class ControlNetHED(nn.Module):
    """(b, H, W, 3) raw RGB in [0, 255] -> (b, H, W) edge probability in [0, 1].

    Forward contract of the Apache-2 ControlNetHED annotator: subtract the learned
    per-channel ``norm`` from the raw pixels, run the five VGG stages (maxpool before
    stages 2-5), project each stage to a 1-channel side map, bilinearly upsample all
    side maps to input resolution, then sigmoid(mean(side maps)).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        H, W = pixel_values.shape[1:3]
        norm = self.param("norm", nn.initializers.zeros, (1, 1, 1, 3))
        x = pixel_values.astype(self.dtype) - norm.astype(self.dtype)

        side_maps = []
        for s, (ch, n_convs) in enumerate(_STAGES):
            if s > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for j in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv_{s}_{j}",
                            dtype=self.dtype)(x)
                x = jax.nn.relu(x)
            side = nn.Conv(1, (1, 1), name=f"side_{s}", dtype=self.dtype)(x)
            if side.shape[1:3] != (H, W):
                side = bilinear_resize(side, (H, W))
            side_maps.append(side[..., 0])

        stacked = jnp.stack(side_maps, axis=-1).astype(jnp.float32)
        return jax.nn.sigmoid(stacked.mean(axis=-1))


def convert_hed_state_dict(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """ControlNetHED torch state dict -> flax params.

    Torch layout (annotator release): ``norm`` (1,3,1,1), per-stage blocks
    ``block{i}.convs.{j}.weight/bias`` (projection convs) and
    ``block{i}.projection.weight/bias`` (the 1x1 side head).
    """
    params: Dict = {}
    for key, v in state_dict.items():
        v = np.asarray(v)
        parts = key.split(".")
        if parts[0] == "norm":
            params["norm"] = v.transpose(0, 2, 3, 1)  # (1,3,1,1) -> (1,1,1,3)
            continue
        s = int(parts[0].replace("block", "")) - 1  # block1..block5 -> stage 0..4
        if parts[1] == "convs":
            name = f"conv_{s}_{parts[2]}"
        else:  # projection
            name = f"side_{s}"
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        params.setdefault(name, {})[leaf] = (
            v.transpose(2, 3, 1, 0) if leaf == "kernel" else v)
    return params


def directional_nms(edge: np.ndarray, threshold: float = 127.0,
                    sigma: float = 3.0) -> np.ndarray:
    """Directional non-max suppression used by the scribble branch: Gaussian blur,
    keep pixels that are maxima under 4 line-shaped dilations, then threshold."""
    import cv2

    x = cv2.GaussianBlur(edge.astype(np.float32), (0, 0), sigma)
    kernels = [
        np.array([[0, 0, 0], [1, 1, 1], [0, 0, 0]], np.uint8),
        np.array([[0, 1, 0], [0, 1, 0], [0, 1, 0]], np.uint8),
        np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.uint8),
        np.array([[0, 0, 1], [0, 1, 0], [1, 0, 0]], np.uint8),
    ]
    y = np.zeros_like(x)
    for k in kernels:
        np.putmask(y, cv2.dilate(x, kernel=k) == x, x)
    out = np.zeros_like(y, dtype=np.uint8)
    out[y > threshold] = 255
    return out


def scribble_postprocess(edge_u8: np.ndarray) -> np.ndarray:
    """``HEDdetector(..., scribble=True)`` post-processing: directional NMS at 127,
    Gaussian blur sigma 3, then hard-binarize (>4 -> 255 else 0)."""
    import cv2

    m = directional_nms(edge_u8, 127.0, 3.0)
    m = cv2.GaussianBlur(m, (0, 0), 3.0)
    m[m > 4] = 255
    m[m < 255] = 0
    return m


class ScribbleHED:
    """HED -> scribble/softedge condition maps (controlnet_aux ``HEDdetector``
    semantics; ``scribble=True`` binarizes to white-on-black scribbles)."""

    def __init__(self, model_path: str, dtype=None):
        import torch

        self.model = ControlNetHED(dtype=dtype or jnp.float32)
        sd = torch.load(model_path, map_location="cpu", weights_only=True)
        self.params = {"params": convert_hed_state_dict(
            {k: np.asarray(v) for k, v in sd.items()})}
        self._apply = jax.jit(self.model.apply)

    def __call__(self, images: List[np.ndarray], scribble: bool = True) -> List[np.ndarray]:
        out = []
        for img in images:
            edge = np.asarray(
                self._apply(self.params, jnp.asarray(img[None], jnp.float32))
            )[0]
            edge = (edge * 255.0).clip(0, 255).astype(np.uint8)
            if scribble:
                edge = scribble_postprocess(edge)
            out.append(np.repeat(edge[:, :, None], 3, axis=2))
        return out
