"""Full-tower fp32 parity vs thin-config torch oracles (diffusers semantics).

Extends tests/test_torch_component_parity.py from single blocks to the complete
frozen towers (SURVEY §7 hard-part #1): weights from randomly-initialised torch
mirrors travel through the production converter
(`ctrl_adapter_tpu/convert/torch_to_jax.py`) into the flax towers, and full
forward passes must agree. This is the exact path a released checkpoint takes
(reference `controlnet/controlnet.py:662-881`, stock ``UNet2DConditionModel``,
``AutoencoderKL``), so a transposed kernel / wrong eps / swapped norm anywhere in
the tower fails here.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from .torch_mirrors import (
    AutoencoderKLT,
    ControlNetT,
    UNet2DConditionModelT,
    to_jax_params,
)

RTOL, ATOL = 2e-4, 2e-4


def nhwc(x: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 1))


def nchw(x: jnp.ndarray) -> np.ndarray:
    return np.asarray(x).transpose(0, 3, 1, 2)


@pytest.mark.slow
def test_controlnet_tower_full_forward_parity():
    from ctrl_adapter_tpu.models.controlnet import ControlNetConfig, ControlNetModel

    torch.manual_seed(0)
    oracle = ControlNetT().eval()
    sample = torch.randn(2, 4, 8, 8)
    t = torch.tensor([7.0, 493.0])
    context = torch.randn(2, 7, 24)
    cond = torch.rand(2, 3, 64, 64)
    with torch.no_grad():
        want_downs, want_mid = oracle(sample, t, context, cond)

    model = ControlNetModel(config=ControlNetConfig(
        block_out_channels=(32, 64, 96, 96), num_attention_heads=(4, 4, 4, 4),
        cross_attention_dim=24, conditioning_embedding_out_channels=(8, 8, 16, 16)))
    got_downs, got_mid = model.apply(
        to_jax_params(oracle), nhwc(sample), jnp.asarray(t.numpy()),
        jnp.asarray(context.numpy()), nhwc(cond))

    assert len(got_downs) == len(want_downs) == 12
    for k, (got, want) in enumerate(zip(got_downs, want_downs)):
        np.testing.assert_allclose(
            nchw(got), want.numpy(), rtol=RTOL, atol=ATOL,
            err_msg=f"down residual {k}")
    np.testing.assert_allclose(nchw(got_mid), want_mid.numpy(), rtol=RTOL, atol=ATOL)


@pytest.mark.slow
def test_controlnet_tower_skip_flags_parity():
    from ctrl_adapter_tpu.models.controlnet import ControlNetConfig, ControlNetModel

    torch.manual_seed(1)
    oracle = ControlNetT().eval()
    sample = torch.randn(1, 4, 8, 8)
    t = torch.tensor([250.0])
    context = torch.randn(1, 7, 24)
    cond = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        want_downs, want_mid = oracle(sample, t, context, cond,
                                      skip_conv_in=True, skip_time_emb=True)

    model = ControlNetModel(config=ControlNetConfig(
        block_out_channels=(32, 64, 96, 96), num_attention_heads=(4, 4, 4, 4),
        cross_attention_dim=24, conditioning_embedding_out_channels=(8, 8, 16, 16)))
    got_downs, got_mid = model.apply(
        to_jax_params(oracle), nhwc(sample), jnp.asarray(t.numpy()),
        jnp.asarray(context.numpy()), nhwc(cond),
        skip_conv_in=True, skip_time_emb=True)
    # slightly looser than the main tower test: the zeroed conv_in/time paths
    # drive the mid block (1x1 spatial GroupNorm) into a regime where fp32
    # noise accumulates to ~3e-4; structural bugs produce O(1) errors.
    for got, want in zip(got_downs, want_downs):
        np.testing.assert_allclose(nchw(got), want.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(nchw(got_mid), want_mid.numpy(), rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_sdxl_layout_unet_full_forward_parity():
    """SDXL-layout UNet (linear projections, text_time addition embedding,
    transformer depth per block, residual injection) vs the torch oracle."""
    from ctrl_adapter_tpu.models.unet_2d import UNet2DConfig, UNet2DConditionModel

    torch.manual_seed(2)
    pooled_dim, time_ids_dim, add_dim = 16, 6, 8
    oracle = UNet2DConditionModelT(
        block_out=(32, 64, 96), heads=(4, 4, 4), cross_dim=24,
        transformer_layers=(1, 2, 2), use_linear_projection=True,
        addition_embed_type="text_time", addition_time_embed_dim=add_dim,
        projection_class_embeddings_input_dim=pooled_dim + time_ids_dim * add_dim,
    ).eval()
    sample = torch.randn(2, 4, 8, 8)
    t = torch.tensor([10.0, 990.0])
    context = torch.randn(2, 7, 24)
    added = {"text_embeds": torch.randn(2, pooled_dim),
             "time_ids": torch.randn(2, time_ids_dim)}
    # 12-slot adapter residual contract: extra residuals beyond the UNet's skip
    # count are ignored (zip semantics, `train.py:1384-1391`)
    torch.manual_seed(3)
    skip_shapes = [(2, 32, 8, 8)] * 3 + [(2, 32, 4, 4)] + [(2, 64, 4, 4)] * 2 \
        + [(2, 64, 2, 2)] + [(2, 96, 2, 2)] * 2
    residuals = [0.1 * torch.randn(s) for s in skip_shapes]
    with torch.no_grad():
        want = oracle(sample, t, context, added,
                      down_block_additional_residuals=residuals,
                      mid_block_additional_residual=torch.zeros(()))

    model = UNet2DConditionModel(config=UNet2DConfig(
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(32, 64, 96), transformer_layers_per_block=(1, 2, 2),
        num_attention_heads=(4, 4, 4), cross_attention_dim=24,
        use_linear_projection=True, addition_embed_type="text_time",
        addition_time_embed_dim=add_dim,
        projection_class_embeddings_input_dim=pooled_dim + time_ids_dim * add_dim))
    got = model.apply(
        to_jax_params(oracle), nhwc(sample), jnp.asarray(t.numpy()),
        jnp.asarray(context.numpy()),
        {"text_embeds": jnp.asarray(added["text_embeds"].numpy()),
         "time_ids": jnp.asarray(added["time_ids"].numpy())},
        down_block_additional_residuals=[nhwc(r) for r in residuals],
        mid_block_additional_residual=jnp.zeros(()))
    np.testing.assert_allclose(nchw(got), want.numpy(), rtol=RTOL, atol=ATOL)


@pytest.mark.slow
def test_sd_layout_unet_full_forward_parity():
    """SD-v1.5 layout (conv projections, no addition embedding) — the layout the
    SD backbone and ControlNet towers share."""
    from ctrl_adapter_tpu.models.unet_2d import UNet2DConfig, UNet2DConditionModel

    torch.manual_seed(4)
    oracle = UNet2DConditionModelT(
        block_out=(32, 64, 96), heads=(4, 4, 4), cross_dim=24,
        transformer_layers=(1, 1, 1), use_linear_projection=False,
        down_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D"),
        up_types=("UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
    ).eval()
    sample = torch.randn(1, 4, 8, 8)
    t = torch.tensor([123.0])
    context = torch.randn(1, 7, 24)
    with torch.no_grad():
        want = oracle(sample, t, context)

    model = UNet2DConditionModel(config=UNet2DConfig(
        down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(32, 64, 96), transformer_layers_per_block=(1, 1, 1),
        num_attention_heads=(4, 4, 4), cross_attention_dim=24))
    got = model.apply(to_jax_params(oracle), nhwc(sample), jnp.asarray(t.numpy()),
                      jnp.asarray(context.numpy()))
    np.testing.assert_allclose(nchw(got), want.numpy(), rtol=RTOL, atol=ATOL)


@pytest.mark.slow
def test_vae_encode_decode_parity():
    from ctrl_adapter_tpu.models.vae import AutoencoderKL, VAEConfig

    torch.manual_seed(5)
    oracle = AutoencoderKLT().eval()
    x = torch.rand(1, 3, 32, 32) * 2 - 1
    with torch.no_grad():
        want_mean, want_logvar = oracle.encode_moments(x)
        want_img = oracle.decode(want_mean)

    model = AutoencoderKL(config=VAEConfig(
        block_out_channels=(16, 16, 16, 16), norm_num_groups=8, layers_per_block=2))
    params = to_jax_params(oracle)
    got_mean, got_logvar = model.apply(params, nhwc(x), method="encode_moments")
    np.testing.assert_allclose(nchw(got_mean), want_mean.numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(nchw(got_logvar), want_logvar.numpy(), rtol=RTOL, atol=ATOL)
    got_img = model.apply(params, jnp.asarray(want_mean.numpy().transpose(0, 2, 3, 1)),
                          method="decode")
    np.testing.assert_allclose(nchw(got_img), want_img.numpy(), rtol=5e-4, atol=5e-4)
