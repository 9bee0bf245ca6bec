"""Shared pipeline utilities: control-window phases, CFG, SDXL time ids.

The reference computes a per-step ``controlnet_keep`` list
(`i2vgen_xl_controlnet_adapter_pipeline.py:842-850`,
`sdxl_controlnet_adapter_pipeline.py:1297-1303`) and branches per step in Python.
Keep is 1 exactly on a contiguous step window [start, end), so the TPU version splits
sampling into up to three ``lax.scan`` phases — (no-control, control, no-control) —
each a static-shape program; steps outside the window never run the ControlNet or
adapter at all (the reference still pays Python dispatch for them).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp


def controlnet_keep_schedule(
    num_steps: int, control_guidance_start: float, control_guidance_end: float
) -> List[float]:
    """Per-step keep flags, identical formula to the reference."""
    return [
        1.0
        - float(
            i / num_steps < control_guidance_start
            or (i + 1) / num_steps > control_guidance_end
        )
        for i in range(num_steps)
    ]


def control_window(
    num_steps: int, control_guidance_start: float, control_guidance_end: float
) -> Tuple[int, int]:
    """Contiguous [lo, hi) step window where keep == 1."""
    keeps = controlnet_keep_schedule(num_steps, control_guidance_start, control_guidance_end)
    on = [i for i, k in enumerate(keeps) if k == 1.0]
    if not on:
        return 0, 0
    lo, hi = on[0], on[-1] + 1
    assert all(k == 1.0 for k in keeps[lo:hi]), "keep window must be contiguous"
    return lo, hi


def normalize_control_latent_size(s) -> Tuple[int, int]:
    """``control_latent_size`` as an (h, w) tuple.

    int: pool the ControlNet's latent input to (s, s) — the use_size_512 path
    (64 at the SD-v1.5 training statistics). tuple: the native latent size,
    possibly non-square — no pooling, the ControlNet runs at sample resolution
    (use_size_512=False, reference `ctrl_helper.py:60-70`, pipelines'
    ``(h,w) != (64,64) and use_size_512`` guards).
    """
    return (s, s) if isinstance(s, int) else tuple(s)


def classifier_free_guidance(noise_pred: jnp.ndarray, guidance_scale) -> jnp.ndarray:
    """Split a CFG-doubled batch [uncond; cond] and combine."""
    uncond, cond = jnp.split(noise_pred, 2, axis=0)
    return uncond + guidance_scale * (cond - uncond)


def classifier_free_guidance_rescaled(
    noise_pred: jnp.ndarray, guidance_scale, guidance_rescale
) -> jnp.ndarray:
    """CFG with optional std-rescaling per arXiv 2305.08891 §3.4 (reference
    `sdxl_controlnet_adapter_pipeline.py:1373-1375`). guidance_rescale=0 disables."""
    uncond, cond = jnp.split(noise_pred, 2, axis=0)
    guided = uncond + guidance_scale * (cond - uncond)
    axes = tuple(range(1, guided.ndim))
    std_text = jnp.std(cond, axis=axes, keepdims=True)
    std_guided = jnp.std(guided, axis=axes, keepdims=True)
    rescaled = guided * (std_text / (std_guided + 1e-8))
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * guided


def guidance_scale_embedding(w: jnp.ndarray, embedding_dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """VDM-style sin/cos embedding of ``w`` (LCM guidance conditioning).

    Mirrors the reference's ``get_guidance_scale_embedding``
    (`sdxl_controlnet_adapter_pipeline.py:764-790`): w scaled by 1000, half-dim
    log-spaced frequencies, [sin, cos] concat, zero-pad when odd."""
    w = jnp.asarray(w, jnp.float32) * 1000.0
    half_dim = embedding_dim // 2
    freq = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * (-jnp.log(10000.0) / (half_dim - 1)))
    emb = w[:, None] * freq[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb.astype(dtype)


def sdxl_add_time_ids(
    original_size: Tuple[int, int],
    crops_coords_top_left: Tuple[int, int],
    target_size: Tuple[int, int],
    batch_size: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """[orig_h, orig_w, crop_top, crop_left, target_h, target_w] per sample
    (reference `model/ctrl_helper.py:460-465`)."""
    ids = jnp.asarray(
        [list(original_size) + list(crops_coords_top_left) + list(target_size)], dtype=dtype
    )
    return jnp.tile(ids, (batch_size, 1))
