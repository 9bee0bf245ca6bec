"""Parity of the TPU-native swin2 MiDaS depth model vs a thin torch oracle.

The reference's flagship depth checkpoint is ``dpt_swin2_large_384``
(`utils/run_depth.py:125-148`). The oracle mirrors timm SwinV2 (cosine window
attention, cpb MLP, res-post-norm, shifted windows) + the MiDaS scratch head,
with state-dict keys identical to the real checkpoint so
``convert_midas_swin_state_dict`` is exercised end-to-end.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ctrl_adapter_tpu.conditions.dpt_swin import (
    DPTSwinDepthModel,
    convert_midas_swin_state_dict,
)
from ctrl_adapter_tpu.conditions.swin2 import SwinV2Config

from .torch_mirrors import DPTSwinT, SwinV2T

THIN = dict(img_size=64, patch_size=4, embed_dim=16, depths=(1, 2, 2, 1),
            num_heads=(2, 2, 4, 4), window=4, pretrained_windows=(2, 2, 2, 2))
THIN_CFG = SwinV2Config(img_size=64, patch_size=4, embed_dim=16,
                        depths=(1, 2, 2, 1), num_heads=(2, 2, 4, 4),
                        window_size=4, pretrained_window_sizes=(2, 2, 2, 2))


@pytest.mark.slow
def test_swin2_backbone_feature_parity():
    """4-stage feature pyramid must match the timm-semantics oracle — covers
    shifted windows (stage depths 2), cosine attention, cpb bias, merging."""
    from ctrl_adapter_tpu.conditions.swin2 import SwinV2Backbone
    from ctrl_adapter_tpu.convert.torch_to_jax import convert_state_dict

    torch.manual_seed(0)
    oracle = SwinV2T(**THIN).eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = oracle(x)

    model = SwinV2Backbone(config=THIN_CFG)
    params = {"params": convert_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()
         if not any(s in k for s in ("relative_coords_table",
                                     "relative_position_index", "attn_mask"))})}
    got = model.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert len(got) == 4
    for i, (g, w) in enumerate(zip(got, want)):
        grid = int(np.sqrt(w.shape[1]))
        w_nhwc = w.numpy().reshape(w.shape[0], grid, grid, w.shape[2])
        np.testing.assert_allclose(
            np.asarray(g), w_nhwc, rtol=5e-4, atol=5e-4,
            err_msg=f"stage {i}")


@pytest.mark.slow
def test_dpt_swin_full_depth_parity():
    torch.manual_seed(1)
    oracle = DPTSwinT(features=32, **THIN).eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        want = oracle(x)

    model = DPTSwinDepthModel(config=THIN_CFG, features=32)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = convert_midas_swin_state_dict(sd)
    got = model.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert got.shape == tuple(want.shape)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-3, atol=1e-3)
