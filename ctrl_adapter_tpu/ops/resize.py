"""Resize / pooling primitives with torch-parity numerics, NHWC layout.

These back the reference's uses of ``F.interpolate(mode="nearest")``
(`model/resnet_block_2d.py:174-184`, `model/adapter_spatial_temporal.py:235-237`) and
``F.adaptive_avg_pool2d`` 64x64 latent pooling
(`sdxl/pipelines/sdxl_controlnet_adapter_pipeline.py:1305-1312`, `train.py:1196-1199`).

All are shape-static and fuse cleanly under jit (pure gathers / reshape-means), so XLA
keeps them on the VPU without breaking MXU tiling of neighbouring convs.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def nearest_resize(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize of NHWC (or ...HWC) to `out_hw`.

    Index rule is ``src = floor(dst * in / out)``, identical to
    ``torch.nn.functional.interpolate(mode="nearest")`` for all sizes.
    """
    h, w = x.shape[-3], x.shape[-2]
    out_h, out_w = out_hw
    if (out_h, out_w) == (h, w):
        return x
    row_idx = (jnp.arange(out_h) * h) // out_h
    col_idx = (jnp.arange(out_w) * w) // out_w
    x = jnp.take(x, row_idx, axis=-3)
    x = jnp.take(x, col_idx, axis=-2)
    return x


def nearest_scale(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    h, w = x.shape[-3], x.shape[-2]
    return nearest_resize(x, (int(h * scale), int(w * scale)))


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Adaptive average pool over NHWC spatial dims.

    Exact match to ``F.adaptive_avg_pool2d`` when input dims are divisible by output
    dims (the only case the reference exercises: 64/128 -> 64). Falls back to the
    general torch bin rule otherwise.
    """
    *lead, h, w, c = x.shape
    out_h, out_w = out_hw
    if (h, w) == (out_h, out_w):
        return x
    if h % out_h == 0 and w % out_w == 0:
        kh, kw = h // out_h, w // out_w
        x = x.reshape(*lead, out_h, kh, out_w, kw, c)
        return x.mean(axis=(-4, -2))
    # General adaptive pooling: bin i covers [floor(i*H/out), ceil((i+1)*H/out));
    # bins are static (Python) so this unrolls into a fixed gather/mean program.
    def pool_axis(arr: jnp.ndarray, size: int, out: int, axis: int) -> jnp.ndarray:
        segments = []
        for i in range(out):
            s = (i * size) // out
            e = -((-(i + 1) * size) // out)
            segments.append(
                jnp.take(arr, jnp.arange(s, e), axis=axis).mean(axis=axis, keepdims=True)
            )
        return jnp.concatenate(segments, axis=axis)

    x = pool_axis(x, h, out_h, axis=-3)
    x = pool_axis(x, w, out_w, axis=-2)
    return x


def bilinear_resize(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear (align_corners=False) resize of ...HWC, matching torch conventions."""
    shape = (*x.shape[:-3], out_hw[0], out_hw[1], x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear")


def bicubic_resize(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    shape = (*x.shape[:-3], out_hw[0], out_hw[1], x.shape[-1])
    return jax.image.resize(x, shape, method="cubic")


def bilinear_resize_align_corners(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with torch ``align_corners=True`` semantics on ...HWC input:
    source coordinate of output pixel i is ``i * (in - 1) / (out - 1)`` (corner pixels
    map exactly). ``jax.image.resize`` only implements half-pixel centers, so this
    interpolates explicitly along H then W (two small matmul-free gathers)."""

    def interp_axis(arr: jnp.ndarray, out: int, axis: int) -> jnp.ndarray:
        n = arr.shape[axis]
        if n == out:
            return arr
        if out == 1 or n == 1:
            idx = jnp.zeros((out,), jnp.int32)
            return jnp.take(arr, idx, axis=axis)
        pos = jnp.arange(out, dtype=jnp.float32) * (n - 1) / (out - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
        w = (pos - lo.astype(jnp.float32)).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        b = jnp.take(arr, lo + 1, axis=axis)
        bshape = [1] * arr.ndim
        bshape[axis] = out
        w = w.reshape(bshape)
        return a * (1 - w) + b * w

    x = interp_axis(x, out_hw[0], x.ndim - 3)
    return interp_axis(x, out_hw[1], x.ndim - 2)
