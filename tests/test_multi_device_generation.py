"""Multi-device (data-parallel) generation on the virtual CPU mesh.

The reference's inference is strictly single-GPU (`inference.py:206`); scale-out
generation is this framework's extension and the roofline-declared route past
single-chip speed-of-light (docs/PERFORMANCE.md). The video batch shards over
the ``data`` mesh axis; each video's denoise chain is independent, so XLA
partitions the whole scan without collectives in the hot loop.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
from ctrl_adapter_tpu.models.controlnet import ControlNetConfig, ControlNetModel
from ctrl_adapter_tpu.models.unet_svd import SVDUNetConfig, UNetSpatioTemporalConditionModel
from ctrl_adapter_tpu.models.vae import AutoencoderKL, VAEConfig
from ctrl_adapter_tpu.parallel.mesh import create_mesh
from ctrl_adapter_tpu.pipelines.svd import SVDControlNetAdapterPipeline
from .utils import fake_init

F = 2
THIN_CHANNELS = (32, 32, 32, 32, 32, 32, 32, 64, 64, 64, 64, 64)

CNET_CFG = ControlNetConfig(
    block_out_channels=(32, 32, 64, 64),
    num_attention_heads=(4, 4, 4, 4),
    cross_attention_dim=24,
    conditioning_embedding_out_channels=(8, 8, 16, 16),
    norm_num_groups=16,
)
VAE_CFG = VAEConfig(block_out_channels=(16, 16, 16, 16), norm_num_groups=8,
                    layers_per_block=1)


def _build(b):
    unet = UNetSpatioTemporalConditionModel(config=SVDUNetConfig(
        block_out_channels=(32, 32, 64, 64), num_attention_heads=(2, 2, 4, 4),
        cross_attention_dim=32, addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=24))
    cnet = ControlNetModel(config=CNET_CFG)
    adapter = ControlNetAdapter(
        backbone_model_name="svd", num_blocks=1, num_adapters_per_location=3,
        cross_attention_dim=32, adapter_locations=("A", "B", "C", "D", "M"),
        custom_down_block_channels=THIN_CHANNELS, custom_mid_block_channels=64,
        attention_head_dim=16)
    vae = AutoencoderKL(config=VAE_CFG)
    pipe = SVDControlNetAdapterPipeline(unet=unet, controlnet=cnet, adapter=adapter,
                                        vae=vae)
    hw = 8
    params = {
        "unet": fake_init(unet, jnp.ones((2 * b, F, hw, hw, 8)), jnp.ones((2 * b,)),
                          jnp.ones((2 * b, 1, 32)), jnp.ones((2 * b, 3))),
        "vae": fake_init(vae, jnp.ones((1, 64, 64, 3))),
    }
    cn_args = (jnp.ones((2 * b * F, hw, hw, 4)), jnp.ones((2 * b * F,)),
               jnp.ones((2 * b * F, 7, 24)), jnp.ones((2 * b * F, 64, 64, 3)))
    params["controlnet"] = fake_init(cnet, *cn_args)
    downs_s, mid_s = jax.eval_shape(lambda: cnet.apply(params["controlnet"], *cn_args))
    params["adapter"] = fake_init(
        adapter, [jnp.zeros(s.shape) for s in downs_s], jnp.zeros(mid_s.shape),
        2, jnp.ones((2 * b * F,)), jnp.ones((1, 1, 32)))
    return pipe, params


def _inputs(b, seed=0):
    rng = np.random.default_rng(seed)
    emb = jnp.asarray(rng.standard_normal((b, 1, 32)).astype(np.float32)) * 0.1
    ilat = jnp.asarray(rng.standard_normal((b, 8, 8, 4)).astype(np.float32)) * 0.1
    cnp = jnp.ones((2 * b, 7, 24)) * 0.1
    ctrl = jnp.asarray(rng.uniform(0, 1, (b * F, 64, 64, 3)).astype(np.float32))
    return emb, ilat, cnp, ctrl


def _generate(pipe, params, b, mesh=None, steps=3):
    emb, ilat, cnp, ctrl = _inputs(b)
    return pipe.generate(
        params, jax.random.PRNGKey(5), emb, ilat, cnp, ctrl,
        height=64, width=64, num_frames=F, num_inference_steps=steps,
        skip_conv_in=True, control_latent_size=8, mesh=mesh,
        output_type="latent",
    )


@pytest.mark.slow
def test_sharded_generation_matches_single_device():
    """Batch-2 generation sharded over a 2-device data mesh must equal the
    unsharded single-device run (same rng -> same latents), proving the
    sharding annotations change placement, not math."""
    assert jax.device_count() == 8, "conftest must force 8 virtual CPU devices"
    b = 2
    pipe, params = _build(b)
    ref = np.asarray(_generate(pipe, params, b, mesh=None))
    mesh = create_mesh(2)
    out = _generate(pipe, params, b, mesh=mesh)
    assert len(out.sharding.device_set) == 2, "output must stay sharded"
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_sharded_generation_batch8_dp8():
    """Full 8-way scale-out: one video per device, decoded output finite."""
    b = 8
    pipe, params = _build(b)
    mesh = create_mesh(8)
    emb, ilat, cnp, ctrl = _inputs(b, seed=1)
    video = pipe.generate(
        params, jax.random.PRNGKey(7), emb, ilat, cnp, ctrl,
        height=64, width=64, num_frames=F, num_inference_steps=2,
        skip_conv_in=True, control_latent_size=8, mesh=mesh,
    )
    assert video.shape == (b, F, 64, 64, 3)
    arr = np.asarray(video)
    assert np.isfinite(arr).all() and arr.min() >= 0.0 and arr.max() <= 1.0


def test_indivisible_batch_rejected():
    pipe, params = _build(1)
    mesh = create_mesh(8)
    with pytest.raises(ValueError, match="not divisible"):
        _generate(pipe, params, 1, mesh=mesh)


@pytest.mark.slow
def test_batched_sparse_equals_single_video_runs():
    """Sparse key-frame control at batch>1 (extension — the reference pipeline
    hardcodes batch 1 in its sparse index build, `svd_...py:697-707`): the
    batch-2 run must equal two independent single-video runs on the same
    latents, proving the generalized per-video index layout mixes no frames
    across videos."""
    b = 2
    pipe, params = _build(b)
    emb, ilat, cnp, ctrl = _inputs(b, seed=3)
    rng = np.random.default_rng(9)
    lat = jnp.asarray(rng.standard_normal((b, F, 8, 8, 4)).astype(np.float32))

    kw = dict(height=64, width=64, num_frames=F, num_inference_steps=3,
              skip_conv_in=True, control_latent_size=8, output_type="latent",
              sparse_frames=(0,))
    out2 = pipe.generate(params, jax.random.PRNGKey(0), emb, ilat, cnp, ctrl,
                         latents=lat, **kw)
    singles = []
    for i in range(b):
        cnp_i = cnp[jnp.asarray([i, b + i])]  # [neg_i; pos_i]
        out1 = pipe.generate(
            params, jax.random.PRNGKey(0), emb[i:i + 1], ilat[i:i + 1], cnp_i,
            ctrl[i * F:(i + 1) * F], latents=lat[i:i + 1], **kw)
        singles.append(np.asarray(out1))
    np.testing.assert_allclose(np.asarray(out2), np.concatenate(singles),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_i2vgenxl_sharded_generation_matches_single_device():
    """I2VGen-XL multi-expert generation sharded over a 2-device data mesh
    equals the unsharded run (expert-major control images shard on axis 1)."""
    from ctrl_adapter_tpu.models.router import ControlNetRouter
    from ctrl_adapter_tpu.models.unet_i2vgen import I2VGenXLUNet, I2VGenXLUNetConfig
    from ctrl_adapter_tpu.pipelines.i2vgenxl import I2VGenXLControlNetAdapterPipeline

    b = 2
    unet = I2VGenXLUNet(config=I2VGenXLUNetConfig(
        block_out_channels=(32, 32, 64, 64), norm_num_groups=16,
        cross_attention_dim=32, attention_head_dim=16))
    cnet = ControlNetModel(config=CNET_CFG)
    adapter = ControlNetAdapter(
        backbone_model_name="i2vgenxl", num_blocks=1, num_adapters_per_location=3,
        cross_attention_dim=32, adapter_locations=("A", "B", "C", "D", "M"),
        custom_down_block_channels=THIN_CHANNELS, custom_mid_block_channels=64,
        attention_head_dim=16)
    vae = AutoencoderKL(config=VAE_CFG)
    router = ControlNetRouter(num_experts=2, router_type="simple_weights")
    pipe = I2VGenXLControlNetAdapterPipeline(
        unet=unet, controlnet=cnet, adapter=adapter, vae=vae, router=router)

    hw = 8
    rng = np.random.default_rng(4)
    prompt = jnp.ones((2 * b, 7, 32)) * 0.1
    cn_prompt = jnp.ones((2 * b, 7, 24)) * 0.1
    image_emb = jnp.asarray(rng.standard_normal((b, 1, 32)).astype(np.float32)) * 0.1
    ff_latent = jnp.asarray(rng.standard_normal((b, hw, hw, 4)).astype(np.float32)) * 0.1
    ctrl = jnp.asarray(rng.uniform(0, 1, (2, b * F, 64, 64, 3)).astype(np.float32))

    sample = jnp.ones((2 * b, F, hw, hw, 4))
    il = jnp.ones((2 * b, F, hw, hw, 4))
    params = {
        "unet": fake_init(unet, sample, jnp.ones((2 * b,)), jnp.ones((2 * b,)), il,
                          jnp.ones((2 * b, 1, 32)), prompt),
        "vae": fake_init(vae, jnp.ones((1, 64, 64, 3))),
        "router": router.init(jax.random.PRNGKey(0)),
    }
    cn_args = (jnp.ones((2 * b * F, hw, hw, 4)), jnp.ones((2 * b * F,)),
               jnp.ones((2 * b * F, 7, 24)), jnp.ones((2 * b * F, 64, 64, 3)))
    for e in range(2):
        params[f"controlnet_{e}"] = fake_init(cnet, *cn_args, seed=e)
    downs_s, mid_s = jax.eval_shape(lambda: cnet.apply(params["controlnet_0"], *cn_args))
    params["adapter"] = fake_init(
        adapter, [jnp.zeros(s.shape) for s in downs_s], jnp.zeros(mid_s.shape),
        F, jnp.ones((2 * b * F,)), jnp.ones((1, 1, 32)))

    kw = dict(height=64, width=64, num_frames=F, num_inference_steps=3,
              control_guidance_end=0.67, control_latent_size=hw,
              output_type="latent")
    ref = np.asarray(pipe.generate(
        params, jax.random.PRNGKey(1), prompt, cn_prompt, image_emb, ff_latent,
        ctrl, **kw))
    mesh = create_mesh(2)
    out = pipe.generate(
        params, jax.random.PRNGKey(1), prompt, cn_prompt, image_emb, ff_latent,
        ctrl, mesh=mesh, **kw)
    assert len(out.sharding.device_set) == 2
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_sdxl_sharded_generation_matches_single_device():
    """SDXL batch-2 generation sharded over a 2-device data mesh equals the
    unsharded run."""
    from ctrl_adapter_tpu.models.unet_2d import UNet2DConfig, UNet2DConditionModel
    from ctrl_adapter_tpu.pipelines.sdxl import SDXLControlNetAdapterPipeline

    unet_cfg = UNet2DConfig(
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(32, 64, 64), transformer_layers_per_block=(1, 2, 2),
        num_attention_heads=(2, 2, 2), cross_attention_dim=32,
        use_linear_projection=True, norm_num_groups=16,
        addition_embed_type="text_time", addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=16 + 48,
    )
    cnet_cfg = ControlNetConfig(
        block_out_channels=(32, 64, 64, 64), num_attention_heads=(4, 4, 4, 4),
        cross_attention_dim=24, conditioning_embedding_out_channels=(8, 8, 16, 16),
        norm_num_groups=16,
    )
    unet = UNet2DConditionModel(config=unet_cfg)
    cnet = ControlNetModel(config=cnet_cfg)
    adapter = ControlNetAdapter(
        backbone_model_name="sdxl", num_blocks=1, num_adapters_per_location=3,
        cross_attention_dim=32, adapter_locations=("A", "B", "C"),
        add_temporal_resnet=False, add_temporal_transformer=False,
        custom_down_block_channels=(32, 32, 32, 32, 64, 64, 64, 64, 64),
        attention_head_dim=16,
    )
    vae = AutoencoderKL(config=VAE_CFG)
    pipe = SDXLControlNetAdapterPipeline(unet=unet, controlnet=cnet,
                                         adapter=adapter, vae=vae)

    b, latent_hw = 2, 16
    rng = np.random.default_rng(6)
    prompt_embeds = jnp.asarray(
        rng.standard_normal((2 * b, 7, 32)).astype(np.float32)) * 0.1
    add_text_embeds = jnp.ones((2 * b, 16)) * 0.1
    cn_prompt = jnp.ones((2 * b, 7, 24)) * 0.1
    control_image = jnp.asarray(
        rng.uniform(0, 1, (b, 64, 64, 3)).astype(np.float32))

    sample = jnp.ones((2 * b, latent_hw, latent_hw, 4))
    t = jnp.zeros((2 * b,))
    pooled8 = jnp.ones((2 * b, 8, 8, 4))
    params = {
        "unet": fake_init(unet, sample, t, prompt_embeds,
                          {"text_embeds": add_text_embeds,
                           "time_ids": jnp.ones((2 * b, 6))}),
        "controlnet": fake_init(cnet, pooled8, t, cn_prompt,
                                jnp.ones((2 * b, 64, 64, 3))),
        "vae": fake_init(vae, jnp.ones((b, 64, 64, 3))),
    }
    downs_s, _ = jax.eval_shape(lambda: cnet.apply(
        params["controlnet"], pooled8, t, cn_prompt, jnp.ones((2 * b, 64, 64, 3))))
    params["adapter"] = fake_init(
        adapter, [jnp.zeros(s.shape) for s in downs_s], None, 1, t, prompt_embeds)

    kw = dict(height=latent_hw * 8, width=latent_hw * 8, num_inference_steps=4,
              guidance_scale=7.5, control_guidance_end=0.5, control_latent_size=8,
              output_type="latent")
    ref = np.asarray(pipe.generate(
        params, jax.random.PRNGKey(0), prompt_embeds, add_text_embeds, cn_prompt,
        control_image, **kw))
    mesh = create_mesh(2)
    out = pipe.generate(
        params, jax.random.PRNGKey(0), prompt_embeds, add_text_embeds, cn_prompt,
        control_image, mesh=mesh, **kw)
    assert len(out.sharding.device_set) == 2
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
