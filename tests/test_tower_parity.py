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


@pytest.mark.slow
def test_basic_transformer_block_parity():
    from ctrl_adapter_tpu.nn.attention import BasicTransformerBlock

    torch.manual_seed(6)
    from .torch_mirrors import BasicTransformerBlockT

    oracle = BasicTransformerBlockT(32, 4, 8, cross_dim=24).eval()
    x = torch.randn(2, 10, 32)
    ctx = torch.randn(2, 7, 24)
    with torch.no_grad():
        want = oracle(x, ctx)
    block = BasicTransformerBlock(dim=32, num_attention_heads=4, attention_head_dim=8,
                                  cross_attention_dim=24)
    got = block.apply(to_jax_params(oracle), jnp.asarray(x.numpy()),
                      encoder_hidden_states=jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=RTOL, atol=ATOL)


@pytest.mark.slow
def test_temporal_basic_transformer_block_parity():
    from ctrl_adapter_tpu.nn.attention import TemporalBasicTransformerBlock

    torch.manual_seed(7)
    from .torch_mirrors import TemporalBasicTransformerBlockT

    oracle = TemporalBasicTransformerBlockT(32, 32, 4, 8, cross_dim=24).eval()
    x = torch.randn(4, 9, 32)  # (b*f, seq, c), f=2
    ctx = torch.randn(2 * 9, 1, 24)  # time context per (b*seq)
    with torch.no_grad():
        want = oracle(x, 2, ctx)
    block = TemporalBasicTransformerBlock(
        dim=32, time_mix_inner_dim=32, num_attention_heads=4, attention_head_dim=8,
        cross_attention_dim=24)
    got = block.apply(to_jax_params(oracle), jnp.asarray(x.numpy()), 2,
                      encoder_hidden_states=jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=RTOL, atol=ATOL)


@pytest.mark.slow
def test_svd_unet_full_forward_parity():
    """SVD UNet (spatio-temporal blocks, AlphaBlender mixing, added-time-ids
    embedding, residual injection) vs the torch oracle."""
    from ctrl_adapter_tpu.models.unet_svd import (
        SVDUNetConfig, UNetSpatioTemporalConditionModel,
    )
    from .torch_mirrors import UNetSpatioTemporalConditionModelT

    torch.manual_seed(8)
    b, f = 1, 2
    oracle = UNetSpatioTemporalConditionModelT().eval()
    sample = torch.randn(b, f, 8, 8, 8)  # (b, f, c=8, h, w)
    t = torch.tensor([0.7])
    context = torch.randn(b, 1, 24)
    added = torch.tensor([[6.0, 127.0, 0.02]])
    skip_shapes = [(b * f, 32, 8, 8)] * 3 + [(b * f, 32, 4, 4)] \
        + [(b * f, 64, 4, 4)] * 2 + [(b * f, 64, 2, 2)] + [(b * f, 64, 2, 2)] * 2
    torch.manual_seed(9)
    residuals = [0.1 * torch.randn(s) for s in skip_shapes]
    mid_res = 0.1 * torch.randn(b * f, 64, 2, 2)
    with torch.no_grad():
        want = oracle(sample, t, context, added,
                      down_block_additional_residuals=residuals,
                      mid_block_additional_residual=mid_res)

    model = UNetSpatioTemporalConditionModel(config=SVDUNetConfig(
        down_block_types=("CrossAttnDownBlockSpatioTemporal",
                          "CrossAttnDownBlockSpatioTemporal",
                          "DownBlockSpatioTemporal"),
        up_block_types=("UpBlockSpatioTemporal",
                        "CrossAttnUpBlockSpatioTemporal",
                        "CrossAttnUpBlockSpatioTemporal"),
        block_out_channels=(32, 64, 64), transformer_layers_per_block=(1, 1, 1),
        num_attention_heads=(4, 4, 4), cross_attention_dim=24,
        addition_time_embed_dim=8, projection_class_embeddings_input_dim=24))
    got = model.apply(
        to_jax_params(oracle),
        jnp.asarray(sample.numpy().transpose(0, 1, 3, 4, 2)),  # (b,f,h,w,c)
        jnp.asarray(t.numpy()), jnp.asarray(context.numpy()),
        jnp.asarray(added.numpy()),
        down_block_additional_residuals=[nhwc(r) for r in residuals],
        mid_block_additional_residual=nhwc(mid_res))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 1, 4, 2, 3), want.numpy(), rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_temporal_decoder_vae_parity():
    """SVD temporal-decoder VAE: encode moments + temporal decode vs oracle."""
    from ctrl_adapter_tpu.models.vae import VAEConfig
    from ctrl_adapter_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder
    from .torch_mirrors import AutoencoderKLTemporalDecoderT

    torch.manual_seed(10)
    oracle = AutoencoderKLTemporalDecoderT(
        block_out=(32, 32, 32, 32), layers_per_block=2).eval()
    x = torch.rand(2, 3, 32, 32) * 2 - 1  # 2 frames of 1 video
    with torch.no_grad():
        want_mean, _ = oracle.encode_moments(x)
        want_img = oracle.decoder(want_mean, 2)

    model = AutoencoderKLTemporalDecoder(config=VAEConfig(
        block_out_channels=(32, 32, 32, 32), norm_num_groups=32, layers_per_block=2))
    params = to_jax_params(oracle)
    got_mean, _ = model.apply(params, nhwc(x), method="encode_moments")
    np.testing.assert_allclose(nchw(got_mean), want_mean.numpy(), rtol=RTOL, atol=ATOL)
    got_img = model.apply(params, jnp.asarray(want_mean.numpy().transpose(0, 2, 3, 1)),
                          2, method="decode")
    np.testing.assert_allclose(nchw(got_img), want_img.numpy(), rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_i2vgen_unet_full_forward_parity():
    """I2VGen-XL UNet (temporal convs/attentions, transformer_in stem, context
    token assembly, fps embedding, residual injection) vs the torch oracle."""
    from ctrl_adapter_tpu.models.unet_i2vgen import I2VGenXLUNet, I2VGenXLUNetConfig
    from .torch_mirrors import I2VGenXLUNetT

    torch.manual_seed(11)
    b, f, hw = 1, 2, 32
    oracle = I2VGenXLUNetT().eval()
    sample = torch.randn(b, 4, f, hw, hw)
    t = torch.tensor([321.0])
    fps = torch.tensor([16.0])
    image_latents = torch.randn(b, 4, f, hw, hw)
    image_embeddings = torch.randn(b, 1, 24)
    context = torch.randn(b, 7, 24)
    skip_shapes = ([(b * f, 32, hw, hw)] * 2 + [(b * f, 32, hw // 2, hw // 2)] * 2
                   + [(b * f, 32, hw // 4, hw // 4)] * 2
                   + [(b * f, 32, hw // 8, hw // 8)] * 2)
    torch.manual_seed(12)
    residuals = [0.1 * torch.randn(s) for s in skip_shapes]
    mid_res = 0.1 * torch.randn(b * f, 32, hw // 8, hw // 8)
    with torch.no_grad():
        want = oracle(sample, t, fps, image_latents, image_embeddings, context,
                      down_block_additional_residuals=residuals,
                      mid_block_additional_residual=mid_res)

    model = I2VGenXLUNet(config=I2VGenXLUNetConfig(
        block_out_channels=(32, 32, 32, 32), layers_per_block=1,
        cross_attention_dim=24, attention_head_dim=16))
    got = model.apply(
        to_jax_params(oracle),
        jnp.asarray(sample.numpy().transpose(0, 2, 3, 4, 1)),
        jnp.asarray(t.numpy()), jnp.asarray(fps.numpy()),
        jnp.asarray(image_latents.numpy().transpose(0, 2, 3, 4, 1)),
        jnp.asarray(image_embeddings.numpy()), jnp.asarray(context.numpy()),
        down_block_additional_residuals=[nhwc(r) for r in residuals],
        mid_block_additional_residual=nhwc(mid_res))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), want.numpy(), rtol=5e-4, atol=5e-4)
