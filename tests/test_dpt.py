"""DPT depth-estimation parity vs the transformers torch oracle.

The reference's default depth extractor is the transformers depth-estimation pipeline
(DPT; `model/ctrl_helper.py:74-81`); our flax port must reproduce it numerically so
TPU-side extraction matches GPU-reference conditioning. Tiny random config keeps the
oracle hermetic (no downloads).
"""

import numpy as np
import torch

import jax.numpy as jnp

from ctrl_adapter_tpu.conditions.dpt import (
    DPTConfig,
    DPTForDepthEstimation,
    convert_dpt_state_dict,
)


def _oracle(image_size):
    import transformers

    hf_cfg = transformers.DPTConfig(
        is_hybrid=False, hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, image_size=image_size, patch_size=8,
        backbone_out_indices=[0, 1, 2, 3], neck_hidden_sizes=[16, 32, 64, 64],
        reassemble_factors=[4, 2, 1, 0.5], fusion_hidden_size=16,
        readout_type="project",
    )
    torch.manual_seed(0)
    return transformers.DPTForDepthEstimation(hf_cfg).eval()


def _ours():
    return DPTForDepthEstimation(config=DPTConfig(
        hidden_size=32, num_layers=4, num_heads=4, intermediate_size=64,
        patch_size=8, image_size=32, backbone_out_indices=(0, 1, 2, 3),
        neck_hidden_sizes=(16, 32, 64, 64), reassemble_factors=(4, 2, 1, 0.5),
        fusion_hidden_size=16,
    ))


def test_dpt_matches_transformers():
    oracle = _oracle(image_size=32)
    pix = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        want = oracle(pix).predicted_depth.numpy()

    params = {"params": convert_dpt_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()})}
    got = _ours().apply(params, jnp.asarray(pix.numpy().transpose(0, 2, 3, 1)))

    assert np.asarray(got).shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_depth_dpt_extractor_from_local_dir(tmp_path):
    """DepthDPT: local checkpoint dir -> uint8 grayscale depth maps at input size
    (the `utils/run_depth.py:125-148` post-processing contract)."""
    import transformers

    from ctrl_adapter_tpu.conditions.extractors import DepthDPT

    oracle = _oracle(image_size=32)
    oracle.save_pretrained(tmp_path, safe_serialization=True)
    transformers.DPTImageProcessor(
        size={"height": 32, "width": 32}).save_pretrained(tmp_path)

    ex = DepthDPT(str(tmp_path))
    rng = np.random.default_rng(0)
    imgs = [rng.uniform(0, 255, (40, 40, 3)).astype(np.uint8) for _ in range(2)]
    outs = ex(imgs)
    assert outs[0].shape == (40, 40, 3) and outs[0].dtype == np.uint8
    # per-image min/max normalization spans the full grayscale range
    assert outs[0].min() == 0 and outs[0].max() == 255


def test_dpt_interpolates_position_embeddings():
    """Non-native input size exercises the pos-embed interpolation path
    (`modeling_dpt.py:201-210`)."""
    oracle = _oracle(image_size=32)
    pix = torch.randn(1, 3, 48, 48)
    with torch.no_grad():
        want = oracle(pix).predicted_depth.numpy()

    params = {"params": convert_dpt_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()})}
    got = _ours().apply(params, jnp.asarray(pix.numpy().transpose(0, 2, 3, 1)))
    assert np.asarray(got).shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)
