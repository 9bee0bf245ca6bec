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


def _cubic_weights(n_in: int, n_out: int, a: float = -0.75):
    """Torch ``interpolate(mode='bicubic', align_corners=True)`` weight matrix
    (n_out, n_in) as a numpy constant (indices clamped at borders)."""
    import numpy as np

    if n_in == n_out:
        return None
    w = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        w[:, 0] = 1.0
        return w
    for i in range(n_out):
        pos = i * (n_in - 1) / (n_out - 1)
        base = int(np.floor(pos))
        t = pos - base
        for k in range(-1, 3):
            d = abs(t - k)
            if d <= 1.0:
                wk = (a + 2) * d**3 - (a + 3) * d**2 + 1
            elif d < 2.0:
                wk = a * d**3 - 5 * a * d**2 + 8 * a * d - 4 * a
            else:
                wk = 0.0
            w[i, min(max(base + k, 0), n_in - 1)] += wk
    return w


def bicubic_resize_align_corners(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bicubic resize with torch ``align_corners=True`` semantics on ...HWC."""
    wh = _cubic_weights(x.shape[-3], out_hw[0])
    ww = _cubic_weights(x.shape[-2], out_hw[1])
    if wh is not None:
        x = jnp.einsum("oh,...hwc->...owc", jnp.asarray(wh, x.dtype), x)
    if ww is not None:
        x = jnp.einsum("ow,...hwc->...hoc", jnp.asarray(ww, x.dtype), x)
    return x


def antialiased_resize(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Gaussian-prefiltered bicubic downscale, matching the reference SVD
    preprocessing (`utils/utils_svd.py:137-180` _resize_with_antialiasing):
    sigma = max((factor-1)/2, 1e-3) per axis, odd kernel of ~4 sigma (min 3),
    reflect padding, then bicubic align_corners=True interpolation. Input ...HWC."""
    import numpy as np

    h, w = x.shape[-3], x.shape[-2]
    factors = (h / out_hw[0], w / out_hw[1])
    sigmas = (max((factors[0] - 1.0) / 2.0, 0.001),
              max((factors[1] - 1.0) / 2.0, 0.001))
    ks = [int(max(2.0 * 2 * s, 3)) for s in sigmas]
    ks = [k + 1 if k % 2 == 0 else k for k in ks]

    def gaussian_1d(size, sigma):
        xs = np.arange(size, dtype=np.float32) - size // 2
        g = np.exp(-(xs**2) / (2.0 * sigma**2))
        return g / g.sum()

    def blur_axis(arr, k, sigma, axis):
        pad = [(0, 0)] * arr.ndim
        pad[axis] = (k // 2, k // 2)
        arr = jnp.pad(arr, pad, mode="reflect")
        kern = jnp.asarray(gaussian_1d(k, sigma), arr.dtype)
        # correlate along axis via moving sum of shifted slices (k is tiny)
        out = 0.0
        n = arr.shape[axis] - k + 1
        for j in range(k):
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(j, j + n)
            out = out + kern[j] * arr[tuple(sl)]
        return out

    x = blur_axis(x, ks[1], sigmas[1], x.ndim - 2)  # x direction first (`:148-150`)
    x = blur_axis(x, ks[0], sigmas[0], x.ndim - 3)
    return bicubic_resize_align_corners(x, out_hw)
