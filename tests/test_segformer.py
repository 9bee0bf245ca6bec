"""SegFormer parity vs the transformers torch oracle.

The reference's segmentation extractor is SegFormer-b5 on torch/GPU
(`model/ctrl_helper.py:92-99`); our flax port must reproduce it numerically so TPU
extraction yields identical ADE segmentation maps. Tiny random config keeps the
oracle hermetic (no downloads).
"""

import numpy as np
import torch

import jax.numpy as jnp

from ctrl_adapter_tpu.conditions.segformer import (
    SegformerConfig,
    SegformerForSemanticSegmentation,
    convert_segformer_state_dict,
)


def _oracle():
    import transformers

    hf_cfg = transformers.SegformerConfig(
        num_labels=9, hidden_sizes=[8, 16, 24, 32], depths=[1, 1, 2, 1],
        num_attention_heads=[1, 2, 3, 4], sr_ratios=[8, 4, 2, 1],
        patch_sizes=[7, 3, 3, 3], strides=[4, 2, 2, 2], mlp_ratios=[2, 2, 2, 2],
        decoder_hidden_size=16, reshape_last_stage=True,
    )
    torch.manual_seed(0)
    oracle = transformers.SegformerForSemanticSegmentation(hf_cfg).eval()
    # randomize BatchNorm running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        oracle.decode_head.batch_norm.running_mean.normal_(0, 0.5)
        oracle.decode_head.batch_norm.running_var.uniform_(0.5, 2.0)
    return oracle


def _ours():
    return SegformerForSemanticSegmentation(config=SegformerConfig(
        num_labels=9, hidden_sizes=(8, 16, 24, 32), depths=(1, 1, 2, 1),
        num_heads=(1, 2, 3, 4), sr_ratios=(8, 4, 2, 1),
        patch_sizes=(7, 3, 3, 3), strides=(4, 2, 2, 2), mlp_ratios=(2, 2, 2, 2),
        decoder_hidden_size=16,
    ))


def test_segmentation_extractor_from_local_dir(tmp_path):
    """SegmentationSegformer: local checkpoint dir -> ADE-palette RGB maps at input
    size (the `ctrl_helper.py:205-212` contract)."""
    import transformers

    from ctrl_adapter_tpu.conditions.extractors import SegmentationSegformer

    oracle = _oracle()
    oracle.save_pretrained(tmp_path, safe_serialization=True)
    transformers.SegformerImageProcessor(
        size={"height": 64, "width": 64}).save_pretrained(tmp_path)

    ex = SegmentationSegformer(str(tmp_path))
    rng = np.random.default_rng(0)
    imgs = [rng.uniform(0, 255, (80, 72, 3)).astype(np.uint8)]
    outs = ex(imgs)
    assert outs[0].shape == (80, 72, 3) and outs[0].dtype == np.uint8


def test_segformer_matches_transformers():
    oracle = _oracle()
    pix = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = oracle(pix).logits.numpy()  # (b, labels, h/4, w/4)

    params = {"params": convert_segformer_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()})}
    got = _ours().apply(params, jnp.asarray(pix.numpy().transpose(0, 2, 3, 1)))

    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5)
    # downstream extraction uses argmax class maps — they must agree exactly
    np.testing.assert_array_equal(got.argmax(1), want.argmax(1))
