"""TPU-native line-art extraction (flax) — the lineart condition frontend.

The reference wires controlnet_aux's ``LineartDetector`` (`model/ctrl_helper.py:104-108`,
applied at `:190-192`), whose annotator network is the Informative-Drawings anime2sketch
generator: a 7x7 reflect-pad stem, two stride-2 downsampling convs (64->128->256),
``n`` residual blocks at 256 channels (instance-norm, reflect padding), two
ConvTranspose upsampling blocks (256->128->64) and a 7x7 sigmoid head producing a
single line-probability channel. Two checkpoints exist (``sk_model.pth`` fine /
``sk_model2.pth`` coarse); both are this same Generator(3, 1, 3).

This module implements the generator in flax/NHWC with a torch-state-dict converter,
plus the detector-level pre/post processing (input scaled to [0,1]; output inverted to
white-lines-on-black, which is the polarity the SD-v1.5 lineart ControlNet expects).
InstanceNorm2d here is the torch default: per-instance per-channel normalization over
H,W with eps 1e-5 and no affine parameters.
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from jax import lax


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch InstanceNorm2d(affine=False) over NHWC: normalize each (n, c) plane."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps)


def _reflect_conv(x: jnp.ndarray, features: int, kernel: int, pad: int,
                  name: str, dtype) -> jnp.ndarray:
    """ReflectionPad2d(pad) + Conv2d(kernel) — the generator's padding style."""
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    return nn.Conv(features, (kernel, kernel), padding="VALID", name=name,
                   dtype=dtype)(x)


class _TorchConvTranspose(nn.Module):
    """torch ConvTranspose2d(k=3, stride=2, padding=1, output_padding=1) in lax.

    Output is exactly 2x the input spatial size. Kernel parameter is stored HWIO
    (spatially *flipped* relative to the torch scatter stencil — the converter
    handles the flip), so this lowers to one `conv_general_dilated` with
    lhs_dilation=2 and asymmetric padding (1, 2).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), window_strides=(1, 1),
            padding=((1, 2), (1, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(self.dtype)


class LineartGenerator(nn.Module):
    """(b, H, W, 3) RGB in [0, 1] -> (b, H, W) line probability in [0, 1].

    H, W must be multiples of 4 (two stride-2 stages and back)."""

    n_residual_blocks: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        # stem: reflect-7x7 conv to 64
        x = jax.nn.relu(_instance_norm(
            _reflect_conv(x, 64, 7, 3, "stem", self.dtype)))
        # two stride-2 downsampling convs
        for i, ch in enumerate((128, 256)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                        name=f"down_{i}", dtype=self.dtype)(x)
            x = jax.nn.relu(_instance_norm(x))
        # residual blocks at 256
        for i in range(self.n_residual_blocks):
            h = _reflect_conv(x, 256, 3, 1, f"res_{i}_conv0", self.dtype)
            h = jax.nn.relu(_instance_norm(h))
            h = _reflect_conv(h, 256, 3, 1, f"res_{i}_conv1", self.dtype)
            x = x + _instance_norm(h)
        # two ConvTranspose upsampling blocks
        for i, ch in enumerate((128, 64)):
            x = _TorchConvTranspose(ch, dtype=self.dtype, name=f"up_{i}")(x)
            x = jax.nn.relu(_instance_norm(x))
        # 7x7 head to one channel + sigmoid
        x = _reflect_conv(x, 1, 7, 3, "head", self.dtype)
        return jax.nn.sigmoid(x[..., 0].astype(jnp.float32))


def convert_lineart_state_dict(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """Informative-Drawings Generator torch state dict -> flax params.

    Torch layout (``sk_model.pth``): Sequential-index keys
    ``model0.1`` (stem conv), ``model1.{0,3}`` (down convs),
    ``model2.{i}.conv_block.{1,5}`` (residual convs),
    ``model3.{0,3}`` (ConvTranspose2d, torch weight layout (in, out, kh, kw)),
    ``model4.1`` (head conv). InstanceNorm has no parameters.
    """
    name_map = {
        ("model0", "1"): "stem",
        ("model1", "0"): "down_0",
        ("model1", "3"): "down_1",
        ("model3", "0"): "up_0",
        ("model3", "3"): "up_1",
        ("model4", "1"): "head",
    }
    params: Dict = {}
    for key, v in state_dict.items():
        v = np.asarray(v)
        parts = key.split(".")
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        if parts[0] == "model2":  # residual blocks: model2.{i}.conv_block.{1|5}
            name = f"res_{parts[1]}_conv{0 if parts[3] == '1' else 1}"
            if leaf == "kernel":
                v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        else:
            name = name_map[(parts[0], parts[1])]
            if leaf == "kernel" and parts[0] == "model3":
                # ConvTranspose: (in, out, kh, kw) -> flipped HWIO
                v = np.ascontiguousarray(v.transpose(2, 3, 0, 1)[::-1, ::-1])
            elif leaf == "kernel":
                v = v.transpose(2, 3, 1, 0)
        params.setdefault(name, {})[leaf] = v
    return params


class LineartDetector:
    """controlnet_aux ``LineartDetector`` semantics on the flax generator.

    Input uint8 RGB images; output white-on-black line maps (inverted generator
    output, the polarity `control_v11p_sd15_lineart` was trained on)."""

    def __init__(self, model_path: str, n_residual_blocks: int = 3, dtype=None):
        import torch

        self.model = LineartGenerator(
            n_residual_blocks=n_residual_blocks, dtype=dtype or jnp.float32)
        sd = torch.load(model_path, map_location="cpu", weights_only=True)
        self.params = {"params": convert_lineart_state_dict(
            {k: np.asarray(v) for k, v in sd.items()})}
        self._apply = jax.jit(self.model.apply)

    def __call__(self, images: List[np.ndarray], invert: bool = True) -> List[np.ndarray]:
        out = []
        for img in images:
            h, w = img.shape[:2]
            ph, pw = (-h) % 4, (-w) % 4  # generator needs /4-divisible sizes
            x = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
            line = np.asarray(self._apply(
                self.params, jnp.asarray(x[None], jnp.float32) / 255.0))[0][:h, :w]
            line = (line * 255.0).clip(0, 255).astype(np.uint8)
            if invert:
                line = 255 - line
            out.append(np.repeat(line[:, :, None], 3, axis=2))
        return out
