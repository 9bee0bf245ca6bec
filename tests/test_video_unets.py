"""I2VGen-XL and SVD UNet contracts: shapes, residual injection, conditioning."""

import numpy as np
import jax.numpy as jnp
import pytest

from ctrl_adapter_tpu.models.unet_i2vgen import I2VGenXLUNet, I2VGenXLUNetConfig
from ctrl_adapter_tpu.models.unet_svd import SVDUNetConfig, UNetSpatioTemporalConditionModel
from .utils import eager_apply, fake_init

B, F, HW = 1, 4, 16


@pytest.fixture(scope="module")
def tiny_i2v():
    cfg = I2VGenXLUNetConfig(
        block_out_channels=(32, 32, 64, 64), norm_num_groups=16,
        cross_attention_dim=32, attention_head_dim=16,
    )
    model = I2VGenXLUNet(config=cfg)
    sample = jnp.ones((B, F, HW, HW, 4))
    il = jnp.ones((B, F, HW, HW, 4)) * 0.1
    ie = jnp.ones((B, 1, 32))
    ehs = jnp.ones((B, 7, 32))
    args = (sample, jnp.asarray([500.0]), jnp.asarray([16.0]), il, ie, ehs)
    params = fake_init(model, *args)
    return model, params, args


def test_i2vgen_output_shape(tiny_i2v):
    model, params, args = tiny_i2v
    out = eager_apply(model, params, *args)
    assert out.shape == (B, F, HW, HW, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_i2vgen_residual_injection(tiny_i2v):
    model, params, args = tiny_i2v
    base = eager_apply(model, params, *args)
    # skips: conv_in + 2 per block + ds per non-final = 12 for 4 blocks
    skip_ch = [32, 32, 32, 32, 32, 32, 32, 64, 64, 64, 64, 64]
    skip_hw = [16, 16, 16, 8, 8, 8, 4, 4, 4, 2, 2, 2]
    residuals = [jnp.ones((B * F, d, d, c)) * 0.1 for d, c in zip(skip_hw, skip_ch)]
    mid = jnp.ones((B * F, 2, 2, 64)) * 0.1
    out = eager_apply(model, params, *args,
                      down_block_additional_residuals=residuals,
                      mid_block_additional_residual=mid)
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-4
    zeros = [jnp.zeros_like(r) for r in residuals]
    out0 = eager_apply(model, params, *args,
                       down_block_additional_residuals=zeros,
                       mid_block_additional_residual=jnp.zeros_like(mid))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base), rtol=2e-5, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_svd():
    cfg = SVDUNetConfig(
        block_out_channels=(32, 32, 64, 64),
        num_attention_heads=(2, 2, 4, 4),
        cross_attention_dim=32,
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=24,
    )
    model = UNetSpatioTemporalConditionModel(config=cfg)
    sample = jnp.ones((B, F, HW, HW, 8))  # 4 noisy + 4 image latents
    ie = jnp.ones((B, 1, 32))
    tids = jnp.ones((B, 3))
    args = (sample, jnp.asarray([1.5]), ie, tids)
    params = fake_init(model, *args)
    return model, params, args


def test_svd_output_shape(tiny_svd):
    model, params, args = tiny_svd
    out = eager_apply(model, params, *args)
    assert out.shape == (B, F, HW, HW, 4)  # 8 in -> 4 out
    assert np.isfinite(np.asarray(out)).all()


def test_svd_residual_injection(tiny_svd):
    model, params, args = tiny_svd
    base = eager_apply(model, params, *args)
    skip_ch = [32, 32, 32, 32, 32, 32, 32, 64, 64, 64, 64, 64]
    skip_hw = [16, 16, 16, 8, 8, 8, 4, 4, 4, 2, 2, 2]
    residuals = [jnp.ones((B * F, d, d, c)) * 0.1 for d, c in zip(skip_hw, skip_ch)]
    mid = jnp.ones((B * F, 2, 2, 64)) * 0.1
    out = eager_apply(model, params, *args,
                      down_block_additional_residuals=residuals,
                      mid_block_additional_residual=mid)
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-4


def test_svd_added_time_ids_condition(tiny_svd):
    model, params, (sample, t, ie, _) = tiny_svd
    out1 = eager_apply(model, params, sample, t, ie, jnp.ones((B, 3)))
    out2 = eager_apply(model, params, sample, t, ie, jnp.ones((B, 3)) * 100.0)
    # fake 0.02-scale weights attenuate the deep aug-embedding path to ~1e-7; with
    # real weights the sensitivity is O(1). Assert the path exists, not its gain.
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-9
