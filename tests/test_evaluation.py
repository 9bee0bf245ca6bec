"""Evaluation metrics (the reference leaves eval code as a TODO, `README.md:228`;
these cover the weight-free metrics in ctrl_adapter_tpu/evaluation/metrics.py)."""

import numpy as np
import pytest

from ctrl_adapter_tpu.evaluation.metrics import (
    canny_control_f1,
    evaluate_video,
    psnr,
    ssim,
    temporal_consistency,
)


def test_psnr_identity_and_known_value():
    a = np.random.default_rng(0).random((16, 16, 3))
    assert psnr(a, a) == float("inf")
    b = a + 0.1  # uniform offset -> mse = 0.01 -> psnr = 20 dB
    assert psnr(a, b) == pytest.approx(20.0, abs=1e-6)


def test_ssim_bounds():
    rng = np.random.default_rng(1)
    a = rng.random((32, 32))
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-9)
    assert ssim(a, 1.0 - a) < ssim(a, a)


def test_temporal_consistency_orders_smoothness():
    static = np.ones((4, 8, 8, 3)) * 0.5
    noisy = np.random.default_rng(2).random((4, 8, 8, 3))
    assert temporal_consistency(static)["mean_frame_delta"] == 0.0
    assert temporal_consistency(noisy)["mean_frame_delta"] > 0.1


def test_canny_f1_self_agreement():
    # an image with strong structure: re-extracting from itself must give F1 == 1
    img = np.zeros((64, 64, 3), np.uint8)
    img[16:48, 16:48] = 255
    from ctrl_adapter_tpu.conditions.extractors import extract_canny

    edges = extract_canny(img)
    assert canny_control_f1(img, edges) == pytest.approx(1.0)
    # versus an empty edge map the score collapses
    assert canny_control_f1(img, np.zeros_like(edges)) == 0.0


def test_evaluate_video_end_to_end():
    rng = np.random.default_rng(3)
    video = rng.random((3, 32, 32, 3))
    cond = (rng.random((3, 32, 32, 3)) > 0.5).astype(np.uint8) * 255
    out = evaluate_video(video, cond, control_type="canny")
    assert set(out) == {"mean_frame_delta", "max_frame_delta", "canny_control_f1"}
    assert 0.0 <= out["canny_control_f1"] <= 1.0
