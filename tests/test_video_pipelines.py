"""End-to-end I2VGen-XL and SVD pipelines on thin modules (1/8 scale).

Covers: multi-expert router fusion with inference_expert_masks, sparse key frames,
SVD's u-timestep remap + per-frame guidance, latent skipping.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
from ctrl_adapter_tpu.models.controlnet import ControlNetConfig, ControlNetModel
from ctrl_adapter_tpu.models.router import ControlNetRouter
from ctrl_adapter_tpu.models.unet_i2vgen import I2VGenXLUNet, I2VGenXLUNetConfig
from ctrl_adapter_tpu.models.unet_svd import SVDUNetConfig, UNetSpatioTemporalConditionModel
from ctrl_adapter_tpu.models.vae import AutoencoderKL, VAEConfig
from ctrl_adapter_tpu.pipelines.i2vgenxl import I2VGenXLControlNetAdapterPipeline
from ctrl_adapter_tpu.pipelines.svd import SVDControlNetAdapterPipeline, controlnet_timestep_remap
from .utils import fake_init

B, F = 1, 4
THIN_CHANNELS = (32, 32, 32, 32, 32, 32, 32, 64, 64, 64, 64, 64)

CNET_CFG = ControlNetConfig(
    block_out_channels=(32, 32, 64, 64),
    num_attention_heads=(4, 4, 4, 4),
    cross_attention_dim=24,
    conditioning_embedding_out_channels=(8, 8, 16, 16),
    norm_num_groups=16,
)
VAE_CFG = VAEConfig(block_out_channels=(16, 16, 16, 16), norm_num_groups=8, layers_per_block=1)


def _adapter(temporal=True):
    return ControlNetAdapter(
        backbone_model_name="i2vgenxl", num_blocks=1, num_adapters_per_location=3,
        cross_attention_dim=32, adapter_locations=("A", "B", "C", "D", "M"),
        add_temporal_resnet=temporal, add_temporal_transformer=temporal,
        custom_down_block_channels=THIN_CHANNELS, custom_mid_block_channels=64,
        attention_head_dim=16,
    )


def test_controlnet_timestep_remap():
    u = controlnet_timestep_remap(25)
    assert u[0] == 961 and u[-1] == 1
    assert np.all(np.diff(u) == -40)
    u50 = controlnet_timestep_remap(50)
    assert u50[0] == 981 and u50[-1] == 1


@pytest.mark.slow
def test_i2vgenxl_pipeline_multi_expert_sparse():
    unet = I2VGenXLUNet(config=I2VGenXLUNetConfig(
        block_out_channels=(32, 32, 64, 64), norm_num_groups=16,
        cross_attention_dim=32, attention_head_dim=16))
    cnet = ControlNetModel(config=CNET_CFG)
    adapter = _adapter()
    vae = AutoencoderKL(config=VAE_CFG)
    router = ControlNetRouter(num_experts=2, router_type="simple_weights")
    pipe = I2VGenXLControlNetAdapterPipeline(
        unet=unet, controlnet=cnet, adapter=adapter, vae=vae, router=router)

    hw = 8  # latents 8x8 = pooled size -> control images 64x64 (1:8 contract)
    prompt = jnp.ones((2 * B, 7, 32)) * 0.1
    cn_prompt = jnp.ones((2 * B, 7, 24)) * 0.1
    image_emb = jnp.ones((B, 1, 32)) * 0.1
    ff_latent = jnp.ones((B, hw, hw, 4)) * 0.1
    ctrl = jnp.ones((2, B * F, 64, 64, 3)) * 0.5  # 2 experts

    # fabricate params
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
        params, jax.random.PRNGKey(1), prompt, cn_prompt, image_emb, ff_latent, ctrl,
        height=hw * 8, width=hw * 8, num_frames=F, num_inference_steps=6,
        control_guidance_end=0.67, sparse_frames=[0, 2],
        inference_expert_masks=[True, False], control_latent_size=hw,
    )
    assert video.shape == (B, F, 64, 64, 3)
    arr = np.asarray(video)
    assert np.isfinite(arr).all() and arr.min() >= 0.0 and arr.max() <= 1.0


@pytest.mark.slow
def test_i2vgenxl_per_expert_scales_and_windows():
    """List-valued controlnet_conditioning_scale / control_guidance_* apply per
    expert (reference `i2vgen_xl_..._pipeline.py:572,704-705,922`): with two
    experts at scales (1.0, 0.0) — or with expert 1's keep window empty — the
    output must reproduce the single-expert run exactly."""
    unet = I2VGenXLUNet(config=I2VGenXLUNetConfig(
        block_out_channels=(32, 32, 64, 64), norm_num_groups=16,
        cross_attention_dim=32, attention_head_dim=16))
    cnet = ControlNetModel(config=CNET_CFG)
    adapter = _adapter(temporal=False)
    vae = AutoencoderKL(config=VAE_CFG)
    # routerless multi-expert: fusion is the unweighted per-expert sum
    pipe = I2VGenXLControlNetAdapterPipeline(
        unet=unet, controlnet=cnet, adapter=adapter, vae=vae, router=None)

    hw = 8
    prompt = jnp.ones((2 * B, 7, 32)) * 0.1
    cn_prompt = jnp.ones((2 * B, 7, 24)) * 0.1
    image_emb = jnp.ones((B, 1, 32)) * 0.1
    ff_latent = jnp.ones((B, hw, hw, 4)) * 0.1
    rng_np = np.random.default_rng(11)
    ctrl2 = jnp.asarray(rng_np.uniform(0, 1, (2, B * F, 64, 64, 3)).astype(np.float32))

    sample = jnp.ones((2 * B, F, hw, hw, 4))
    il = jnp.ones((2 * B, F, hw, hw, 4))
    params = {
        "unet": fake_init(unet, sample, jnp.ones((2 * B,)), jnp.ones((2 * B,)), il,
                          jnp.ones((2 * B, 1, 32)), prompt),
        "vae": fake_init(vae, jnp.ones((1, 64, 64, 3))),
    }
    pooled = jnp.ones((2 * B * F, hw, hw, 4))
    cn_args = (pooled, jnp.ones((2 * B * F,)), jnp.ones((2 * B * F, 7, 24)),
               jnp.ones((2 * B * F, 64, 64, 3)))
    for e in range(2):
        params[f"controlnet_{e}"] = fake_init(cnet, *cn_args, seed=e)
    downs_s, mid_s = jax.eval_shape(lambda: cnet.apply(params["controlnet_0"], *cn_args))
    params["adapter"] = fake_init(
        adapter, [jnp.zeros(s.shape) for s in downs_s], jnp.zeros(mid_s.shape),
        F, jnp.ones((2 * B * F,)), jnp.ones((1, 1, 32)))

    common = dict(height=hw * 8, width=hw * 8, num_frames=F, num_inference_steps=4,
                  control_latent_size=hw, output_type="latent")

    single = pipe.generate(
        params, jax.random.PRNGKey(1), prompt, cn_prompt, image_emb, ff_latent,
        ctrl2[:1], control_guidance_end=0.75, **common)

    # (a) expert 1 silenced by per-expert scale 0.0
    scaled = pipe.generate(
        params, jax.random.PRNGKey(1), prompt, cn_prompt, image_emb, ff_latent,
        ctrl2, controlnet_conditioning_scale=[1.0, 0.0],
        control_guidance_end=0.75, **common)
    np.testing.assert_allclose(np.asarray(scaled), np.asarray(single),
                               rtol=1e-5, atol=1e-5)

    # (b) expert 1 silenced by an empty per-expert keep window
    windowed = pipe.generate(
        params, jax.random.PRNGKey(1), prompt, cn_prompt, image_emb, ff_latent,
        ctrl2, control_guidance_start=[0.0, 0.5],
        control_guidance_end=[0.75, 0.5], **common)
    np.testing.assert_allclose(np.asarray(windowed), np.asarray(single),
                               rtol=1e-5, atol=1e-5)

    # (c) both experts live at full scale differs from the single-expert run
    both = pipe.generate(
        params, jax.random.PRNGKey(1), prompt, cn_prompt, image_emb, ff_latent,
        ctrl2, controlnet_conditioning_scale=[1.0, 1.0],
        control_guidance_end=0.75, **common)
    assert not np.allclose(np.asarray(both), np.asarray(single), atol=1e-4)


@pytest.mark.slow
def test_svd_pipeline_latent_skipping():
    unet = UNetSpatioTemporalConditionModel(config=SVDUNetConfig(
        block_out_channels=(32, 32, 64, 64), num_attention_heads=(2, 2, 4, 4),
        cross_attention_dim=32, addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=24))
    cnet = ControlNetModel(config=CNET_CFG)
    adapter = _adapter()
    vae = AutoencoderKL(config=VAE_CFG)
    pipe = SVDControlNetAdapterPipeline(unet=unet, controlnet=cnet, adapter=adapter, vae=vae)

    hw = 8
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
        params, jax.random.PRNGKey(2), image_emb, image_latent, cn_prompt, ctrl,
        height=hw * 8, width=hw * 8, num_frames=F, num_inference_steps=5,
        skip_conv_in=True, control_latent_size=hw,
    )
    assert video.shape == (B, F, 64, 64, 3)
    arr = np.asarray(video)
    assert np.isfinite(arr).all() and arr.min() >= 0.0 and arr.max() <= 1.0


def test_svd_batched_decode_matches_per_video():
    """SVD temporal-decoder VAE decode at batch>1 must chunk per video: the
    (3,1,1) temporal convs may only mix frames of the SAME video (the
    reference `svd_...py:265-292` only ever decodes one video, so cross-video
    mixing has no reference counterpart). A batch-2 decode must equal two
    independent single-video decodes, for both the default (whole-video) and
    an explicit chunk size."""
    from ctrl_adapter_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder

    vae = AutoencoderKLTemporalDecoder(config=VAEConfig(norm_num_groups=8))
    pipe = SVDControlNetAdapterPipeline(unet=None, controlnet=None, adapter=None, vae=vae)
    params = fake_init(vae, jnp.ones((1, 32, 32, 3)))
    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 4, 4))

    for chunk in (None, 2):
        batched = pipe._decode(params, lat, 0.18215, chunk)
        singles = jnp.concatenate(
            [pipe._decode(params, lat[i:i + 1], 0.18215, chunk) for i in range(2)])
        np.testing.assert_allclose(
            np.asarray(batched), np.asarray(singles), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_i2vgenxl_pipeline_conditional_router_trace():
    """Timestep-conditioned router (extension; the reference wires but never
    implements it): weights are computed inside the denoise scan and the returned
    per-step trace varies with t."""
    from ctrl_adapter_tpu.models.router import build_router_input

    unet = I2VGenXLUNet(config=I2VGenXLUNetConfig(
        block_out_channels=(32, 32, 64, 64), norm_num_groups=16,
        cross_attention_dim=32, attention_head_dim=16))
    cnet = ControlNetModel(config=CNET_CFG)
    adapter = _adapter(temporal=False)
    vae = AutoencoderKL(config=VAE_CFG)
    router = ControlNetRouter(num_experts=2, router_type="timestep_weights")
    pipe = I2VGenXLControlNetAdapterPipeline(
        unet=unet, controlnet=cnet, adapter=adapter, vae=vae, router=router)

    hw = 8
    prompt = jnp.ones((2 * B, 7, 32)) * 0.1
    cn_prompt = jnp.ones((2 * B, 7, 24)) * 0.1
    image_emb = jnp.ones((B, 1, 32)) * 0.1
    ff_latent = jnp.ones((B, hw, hw, 4)) * 0.1
    ctrl = jnp.ones((2, B * F, 64, 64, 3)) * 0.5

    sample = jnp.ones((2 * B, F, hw, hw, 4))
    il = jnp.ones((2 * B, F, hw, hw, 4))
    rin = build_router_input("timestep_weights", jnp.zeros((1,)), None)
    params = {
        "unet": fake_init(unet, sample, jnp.ones((2 * B,)), jnp.ones((2 * B,)), il,
                          jnp.ones((2 * B, 1, 32)), prompt),
        "vae": fake_init(vae, jnp.ones((1, 64, 64, 3))),
        "router": fake_init(router, rin, seed=3, scale=0.5),
    }
    pooled = jnp.ones((2 * B * F, hw, hw, 4))
    cn_args = (pooled, jnp.ones((2 * B * F,)), jnp.ones((2 * B * F, 7, 24)),
               jnp.ones((2 * B * F, 64, 64, 3)))
    for e in range(2):
        params[f"controlnet_{e}"] = fake_init(cnet, *cn_args, seed=e)
    downs_s, mid_s = jax.eval_shape(lambda: cnet.apply(params["controlnet_0"], *cn_args))
    params["adapter"] = fake_init(
        adapter, [jnp.zeros(s.shape) for s in downs_s], jnp.zeros(mid_s.shape),
        F, jnp.ones((2 * B * F,)), jnp.ones((1, 1, 32)))

    video, trace_down, trace_mid = pipe.generate(
        params, jax.random.PRNGKey(1), prompt, cn_prompt, image_emb, ff_latent, ctrl,
        height=hw * 8, width=hw * 8, num_frames=F, num_inference_steps=4,
        control_guidance_end=1.0, control_latent_size=hw,
        return_router_weights=True,
    )
    assert video.shape == (B, F, 64, 64, 3)
    assert np.isfinite(np.asarray(video)).all()
    assert len(trace_down) == 4
    w0, w1 = np.asarray(trace_down[0]), np.asarray(trace_down[-1])
    np.testing.assert_allclose(w0.sum(-1), 1.0, rtol=1e-5)
    assert not np.allclose(w0, w1)  # timestep-conditioned: varies across steps
