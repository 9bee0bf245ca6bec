"""UNet2DConditionModel + AutoencoderKL contracts: shapes, residual injection, zip semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from ctrl_adapter_tpu.models.unet_2d import UNet2DConfig, UNet2DConditionModel
from ctrl_adapter_tpu.models.vae import AutoencoderKL, VAEConfig
from .utils import eager_apply, fake_init

TINY_SDXL = UNet2DConfig(
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(32, 64, 64),
    transformer_layers_per_block=(1, 2, 2),
    num_attention_heads=(2, 2, 2),
    cross_attention_dim=16,
    use_linear_projection=True,
    norm_num_groups=16,
    addition_embed_type="text_time",
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=32 + 6 * 8,  # pooled(32) + 6 time ids * 8
)


@pytest.fixture(scope="module")
def tiny_sdxl():
    model = UNet2DConditionModel(config=TINY_SDXL)
    sample = jnp.ones((2, 16, 16, 4))
    t = jnp.asarray([500.0, 500.0])
    ehs = jnp.ones((2, 7, 16))
    added = {"text_embeds": jnp.ones((2, 32)), "time_ids": jnp.ones((2, 6))}
    params = fake_init(model, sample, t, ehs, added)
    return model, params, (sample, t, ehs, added)


def test_sdxl_unet_output_shape(tiny_sdxl):
    model, params, (sample, t, ehs, added) = tiny_sdxl
    out = eager_apply(model, params, sample, t, ehs, added)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_residual_injection_zip_semantics(tiny_sdxl):
    """12 adapter residuals into a 9-skip UNet: first 9 consumed, last 3 ignored —
    matching diffusers' zip + reference `train.py:1384-1391`."""
    model, params, (sample, t, ehs, added) = tiny_sdxl
    base = eager_apply(model, params, sample, t, ehs, added)

    # the 9 skip shapes for this tiny config at 16x16
    skip_shapes = [
        (2, 16, 16, 32), (2, 16, 16, 32), (2, 16, 16, 32),
        (2, 8, 8, 32), (2, 8, 8, 64), (2, 8, 8, 64),
        (2, 4, 4, 64), (2, 4, 4, 64), (2, 4, 4, 64),
    ]
    zeros = [jnp.zeros(s) for s in skip_shapes] + [jnp.zeros((2, 1, 1, 1))] * 3
    out_zeros = eager_apply(model, params, sample, t, ehs, added,
                            down_block_additional_residuals=zeros,
                            mid_block_additional_residual=jnp.zeros((2, 4, 4, 64)))
    np.testing.assert_allclose(np.asarray(out_zeros), np.asarray(base), rtol=1e-5, atol=1e-6)

    ones = [jnp.ones(s) * 0.1 for s in skip_shapes] + [jnp.zeros((2, 1, 1, 1))] * 3
    out_ones = eager_apply(model, params, sample, t, ehs, added,
                           down_block_additional_residuals=ones)
    assert np.abs(np.asarray(out_ones) - np.asarray(base)).max() > 1e-4


def test_sd15_unet_shape():
    cfg = UNet2DConfig(
        block_out_channels=(32, 32, 64, 64),
        num_attention_heads=(2, 2, 2, 2),
        cross_attention_dim=16,
        norm_num_groups=16,
    )
    model = UNet2DConditionModel(config=cfg)
    sample = jnp.ones((1, 16, 16, 4))
    t = jnp.asarray([10.0])
    ehs = jnp.ones((1, 7, 16))
    params = fake_init(model, sample, t, ehs)
    out = eager_apply(model, params, sample, t, ehs)
    assert out.shape == (1, 16, 16, 4)


def test_vae_shapes_and_scaling():
    cfg = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_num_groups=16, layers_per_block=1)
    vae = AutoencoderKL(config=cfg)
    x = jnp.ones((1, 64, 64, 3))
    params = fake_init(vae, x)
    mean, logvar = eager_apply(vae, params, x, method="encode_moments")
    assert mean.shape == (1, 8, 8, 4)  # 8x downsample
    assert np.all(np.asarray(logvar) >= -30.0) and np.all(np.asarray(logvar) <= 20.0)
    img = eager_apply(vae, params, mean, method="decode")
    assert img.shape == (1, 64, 64, 3)
