"""Deterministic-seed golden-output regression (VERDICT r1 weak #9).

Pipelines previously asserted only finiteness/range; silent numeric drift
(op-order changes, kernel dispatch changes, accidental semantic edits) passed.
This locks a tiny-but-complete SDXL generate() output to a committed golden
array. Regenerate deliberately after an *intended* numeric change with:

    python -m tests.test_golden_regression  # rewrites tests/golden/*.npz
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLDEN = os.path.join(GOLDEN_DIR, "sdxl_tiny_v1.npz")
GOLDEN_I2V = os.path.join(GOLDEN_DIR, "i2vgenxl_tiny_v1.npz")
GOLDEN_SVD = os.path.join(GOLDEN_DIR, "svd_tiny_v1.npz")


def _generate():
    from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
    from ctrl_adapter_tpu.models.controlnet import ControlNetConfig, ControlNetModel
    from ctrl_adapter_tpu.models.unet_2d import UNet2DConfig, UNet2DConditionModel
    from ctrl_adapter_tpu.models.vae import AutoencoderKL, VAEConfig
    from ctrl_adapter_tpu.pipelines.sdxl import SDXLControlNetAdapterPipeline
    from .utils import fake_init

    unet_cfg = UNet2DConfig(
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(32, 64, 64), transformer_layers_per_block=(1, 1, 1),
        num_attention_heads=(2, 2, 2), cross_attention_dim=32,
        use_linear_projection=True, norm_num_groups=16,
        addition_embed_type="text_time", addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=16 + 48)
    cnet_cfg = ControlNetConfig(
        block_out_channels=(32, 64, 64, 64), num_attention_heads=(4, 4, 4, 4),
        cross_attention_dim=24, conditioning_embedding_out_channels=(8, 8, 16, 16),
        norm_num_groups=16)
    unet = UNet2DConditionModel(config=unet_cfg)
    cnet = ControlNetModel(config=cnet_cfg)
    adapter = ControlNetAdapter(
        backbone_model_name="sdxl", num_blocks=1, num_adapters_per_location=3,
        cross_attention_dim=32, adapter_locations=("A", "B", "C"),
        add_temporal_resnet=False, add_temporal_transformer=False,
        custom_down_block_channels=(32, 32, 32, 32, 64, 64, 64, 64, 64),
        attention_head_dim=16)
    vae = AutoencoderKL(config=VAEConfig(block_out_channels=(16, 16, 16, 16),
                                         norm_num_groups=8, layers_per_block=1))
    pipe = SDXLControlNetAdapterPipeline(unet=unet, controlnet=cnet,
                                         adapter=adapter, vae=vae)

    b = 1
    prompt_embeds = jnp.ones((2 * b, 7, 32)) * 0.1
    add_text = jnp.ones((2 * b, 16)) * 0.1
    cn_prompt = jnp.ones((2 * b, 7, 24)) * 0.1
    control_image = jnp.ones((b, 64, 64, 3)) * 0.5
    params = {
        "unet": fake_init(unet, jnp.ones((2, 16, 16, 4)), jnp.ones((2,)),
                          prompt_embeds, {"text_embeds": add_text,
                                          "time_ids": jnp.ones((2, 6))}),
        "controlnet": fake_init(cnet, jnp.ones((2, 8, 8, 4)), jnp.ones((2,)),
                                cn_prompt, jnp.ones((2, 64, 64, 3))),
        "vae": fake_init(vae, jnp.ones((1, 128, 128, 3))),
    }
    downs_s, _ = jax.eval_shape(lambda: cnet.apply(
        params["controlnet"], jnp.ones((2, 8, 8, 4)), jnp.ones((2,)),
        cn_prompt, jnp.ones((2, 64, 64, 3))))
    params["adapter"] = fake_init(
        adapter, [jnp.zeros(s.shape) for s in downs_s], None, 1,
        jnp.ones((2,)), prompt_embeds)

    image = pipe.generate(
        params, jax.random.PRNGKey(1234), prompt_embeds, add_text, cn_prompt,
        control_image, height=128, width=128, num_inference_steps=3,
        guidance_scale=5.0, control_guidance_end=0.7, control_latent_size=8)
    return np.asarray(image, np.float32)


def _generate_i2vgenxl():
    """Multi-expert sparse-frame I2VGen-XL generate() — the richest pipeline path
    (router fusion + expert masks + sparse frames), locked to a golden array."""
    from ctrl_adapter_tpu.models.router import ControlNetRouter
    from ctrl_adapter_tpu.models.unet_i2vgen import I2VGenXLUNet, I2VGenXLUNetConfig
    from ctrl_adapter_tpu.models.vae import AutoencoderKL
    from ctrl_adapter_tpu.models.controlnet import ControlNetModel
    from ctrl_adapter_tpu.pipelines.i2vgenxl import I2VGenXLControlNetAdapterPipeline
    from .test_video_pipelines import CNET_CFG, VAE_CFG, _adapter
    from .utils import fake_init

    B, F, hw = 1, 4, 8
    unet = I2VGenXLUNet(config=I2VGenXLUNetConfig(
        block_out_channels=(32, 32, 64, 64), norm_num_groups=16,
        cross_attention_dim=32, attention_head_dim=16))
    cnet = ControlNetModel(config=CNET_CFG)
    adapter = _adapter()
    vae = AutoencoderKL(config=VAE_CFG)
    router = ControlNetRouter(num_experts=2, router_type="simple_weights")
    pipe = I2VGenXLControlNetAdapterPipeline(
        unet=unet, controlnet=cnet, adapter=adapter, vae=vae, router=router)

    prompt = jnp.ones((2 * B, 7, 32)) * 0.1
    cn_prompt = jnp.ones((2 * B, 7, 24)) * 0.1
    image_emb = jnp.ones((B, 1, 32)) * 0.1
    ff_latent = jnp.ones((B, hw, hw, 4)) * 0.1
    ctrl = jnp.ones((2, B * F, 64, 64, 3)) * 0.5

    sample = jnp.ones((2 * B, F, hw, hw, 4))
    il = jnp.ones((2 * B, F, hw, hw, 4))
    params = {
        "unet": fake_init(unet, sample, jnp.ones((2 * B,)), jnp.ones((2 * B,)), il,
                          jnp.ones((2 * B, 1, 32)), prompt),
        "vae": fake_init(vae, jnp.ones((1, 64, 64, 3))),
        "router": router.init(jax.random.PRNGKey(0)),
    }
    pooled = jnp.ones((2 * B * F, hw, hw, 4))
    cn_args = (pooled, jnp.ones((2 * B * F,)), jnp.ones((2 * B * F, 7, 24)),
               jnp.ones((2 * B * F, 64, 64, 3)))
    for e in range(2):
        params[f"controlnet_{e}"] = fake_init(cnet, *cn_args, seed=e)
    downs_s, mid_s = jax.eval_shape(lambda: cnet.apply(params["controlnet_0"], *cn_args))
    params["adapter"] = fake_init(
        adapter, [jnp.zeros(s.shape) for s in downs_s], jnp.zeros(mid_s.shape),
        2, jnp.ones((2 * B * F,)), jnp.ones((1, 1, 32)))

    video = pipe.generate(
        params, jax.random.PRNGKey(7), prompt, cn_prompt, image_emb, ff_latent, ctrl,
        height=hw * 8, width=hw * 8, num_frames=F, num_inference_steps=4,
        control_guidance_end=0.67, sparse_frames=[0, 2],
        inference_expert_masks=[True, False], control_latent_size=hw)
    return np.asarray(video, np.float32)


def _generate_svd():
    """SVD generate() with skip_conv_in latent skipping (u-remap, EDM sigmas,
    per-frame guidance), locked to a golden array."""
    from ctrl_adapter_tpu.models.unet_svd import (
        SVDUNetConfig, UNetSpatioTemporalConditionModel)
    from ctrl_adapter_tpu.models.vae import AutoencoderKL
    from ctrl_adapter_tpu.models.controlnet import ControlNetModel
    from ctrl_adapter_tpu.pipelines.svd import SVDControlNetAdapterPipeline
    from .test_video_pipelines import CNET_CFG, VAE_CFG, _adapter
    from .utils import fake_init

    B, F, hw = 1, 4, 8
    unet = UNetSpatioTemporalConditionModel(config=SVDUNetConfig(
        block_out_channels=(32, 32, 64, 64), num_attention_heads=(2, 2, 4, 4),
        cross_attention_dim=32, addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=24))
    cnet = ControlNetModel(config=CNET_CFG)
    adapter = _adapter()
    vae = AutoencoderKL(config=VAE_CFG)
    pipe = SVDControlNetAdapterPipeline(unet=unet, controlnet=cnet, adapter=adapter, vae=vae)

    image_emb = jnp.ones((B, 1, 32)) * 0.1
    image_latent = jnp.ones((B, hw, hw, 4)) * 0.1
    cn_prompt = jnp.ones((2 * B, 7, 24)) * 0.1
    ctrl = jnp.ones((B * F, 64, 64, 3)) * 0.5

    sample8 = jnp.ones((2 * B, F, hw, hw, 8))
    params = {
        "unet": fake_init(unet, sample8, jnp.ones((2 * B,)), jnp.ones((2 * B, 1, 32)),
                          jnp.ones((2 * B, 3))),
        "vae": fake_init(vae, jnp.ones((1, 64, 64, 3))),
    }
    pooled = jnp.ones((2 * B * F, hw, hw, 4))
    cn_args = (pooled, jnp.ones((2 * B * F,)), jnp.ones((2 * B * F, 7, 24)),
               jnp.ones((2 * B * F, 64, 64, 3)))
    params["controlnet"] = fake_init(cnet, *cn_args)
    downs_s, mid_s = jax.eval_shape(lambda: cnet.apply(params["controlnet"], *cn_args))
    params["adapter"] = fake_init(
        adapter, [jnp.zeros(s.shape) for s in downs_s], jnp.zeros(mid_s.shape),
        2, jnp.ones((2 * B * F,)), jnp.ones((1, 1, 32)))

    video = pipe.generate(
        params, jax.random.PRNGKey(8), image_emb, image_latent, cn_prompt, ctrl,
        height=hw * 8, width=hw * 8, num_frames=F, num_inference_steps=4,
        skip_conv_in=True, control_latent_size=hw)
    return np.asarray(video, np.float32)


@pytest.mark.slow
def test_sdxl_tiny_golden_regression():
    got = _generate()
    assert os.path.exists(GOLDEN), (
        "golden file missing — run `python -m tests.test_golden_regression`")
    want = np.load(GOLDEN)["image"]
    assert got.shape == want.shape
    # CPU fp32 XLA is deterministic on one machine; tolerance absorbs compiler
    # re-association across versions while still catching real numeric drift
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_i2vgenxl_tiny_golden_regression():
    got = _generate_i2vgenxl()
    assert os.path.exists(GOLDEN_I2V), (
        "golden file missing — run `python -m tests.test_golden_regression`")
    want = np.load(GOLDEN_I2V)["video"]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_svd_tiny_golden_regression():
    got = _generate_svd()
    assert os.path.exists(GOLDEN_SVD), (
        "golden file missing — run `python -m tests.test_golden_regression`")
    want = np.load(GOLDEN_SVD)["video"]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


if __name__ == "__main__":
    from ctrl_adapter_tpu.utils.platform import respect_env_platforms

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    respect_env_platforms()
    jax.config.update("jax_default_matmul_precision", "highest")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    np.savez_compressed(GOLDEN, image=_generate())
    print(f"golden written: {GOLDEN}")
    np.savez_compressed(GOLDEN_I2V, video=_generate_i2vgenxl())
    print(f"golden written: {GOLDEN_I2V}")
    np.savez_compressed(GOLDEN_SVD, video=_generate_svd())
    print(f"golden written: {GOLDEN_SVD}")
