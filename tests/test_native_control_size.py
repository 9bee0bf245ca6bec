"""`use_size_512=False` — native-resolution control path.

Reference `ctrl_helper.py:60-70` + `inference.py:433-449` + the pipelines'
`if (h,w) != (64,64) and use_size_512` guards (`svd_...py:665`,
`i2vgen_xl_...py:942`, `sdxl_...py:1307`): with the flag off, the condition
image stays at the sample's own resolution and the ControlNet consumes the
latents unpooled. In this framework that is expressed by passing the native
latent size (possibly non-square) as ``control_latent_size``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
from ctrl_adapter_tpu.models.controlnet import ControlNetConfig, ControlNetModel
from ctrl_adapter_tpu.models.unet_svd import SVDUNetConfig, UNetSpatioTemporalConditionModel
from ctrl_adapter_tpu.models.vae import AutoencoderKL, VAEConfig
from ctrl_adapter_tpu.pipelines.svd import SVDControlNetAdapterPipeline
from .utils import fake_init

B, F = 1, 3
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


def _build(hw=(8, 8)):
    unet = UNetSpatioTemporalConditionModel(config=SVDUNetConfig(
        block_out_channels=(32, 32, 64, 64), num_attention_heads=(2, 2, 4, 4),
        cross_attention_dim=32, addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=24))
    cnet = ControlNetModel(config=CNET_CFG)
    adapter = ControlNetAdapter(
        backbone_model_name="svd", num_blocks=1, num_adapters_per_location=3,
        cross_attention_dim=32, adapter_locations=("A", "B", "C", "D", "M"),
        custom_down_block_channels=THIN_CHANNELS, custom_mid_block_channels=64,
        attention_head_dim=16,
    )
    vae = AutoencoderKL(config=VAE_CFG)
    pipe = SVDControlNetAdapterPipeline(unet=unet, controlnet=cnet, adapter=adapter,
                                        vae=vae)
    lh, lw = hw
    sample8 = jnp.ones((2 * B, F, lh, lw, 8))
    params = {
        "unet": fake_init(unet, sample8, jnp.ones((2 * B,)), jnp.ones((2 * B, 1, 32)),
                          jnp.ones((2 * B, 3))),
        "vae": fake_init(vae, jnp.ones((1, 8 * lh, 8 * lw, 3))),
    }
    cn_args = (jnp.ones((2 * B * F, lh, lw, 4)), jnp.ones((2 * B * F,)),
               jnp.ones((2 * B * F, 7, 24)),
               jnp.ones((2 * B * F, 8 * lh, 8 * lw, 3)))
    params["controlnet"] = fake_init(cnet, *cn_args)
    downs_s, mid_s = jax.eval_shape(lambda: cnet.apply(params["controlnet"], *cn_args))
    params["adapter"] = fake_init(
        adapter, [jnp.zeros(s.shape) for s in downs_s], jnp.zeros(mid_s.shape),
        2, jnp.ones((2 * B * F,)), jnp.ones((1, 1, 32)))
    return pipe, params


def _generate(pipe, params, hw, control_latent_size, steps=3):
    lh, lw = hw
    return pipe.generate(
        params, jax.random.PRNGKey(2),
        jnp.ones((B, 1, 32)) * 0.1,          # image embeddings
        jnp.ones((B, lh, lw, 4)) * 0.1,      # image latent
        jnp.ones((2 * B, 7, 24)) * 0.1,      # controlnet prompt
        jnp.ones((B * F, 8 * lh, 8 * lw, 3)) * 0.5,
        height=8 * lh, width=8 * lw, num_frames=F, num_inference_steps=steps,
        skip_conv_in=True, control_latent_size=control_latent_size,
    )


@pytest.mark.slow
def test_native_square_tuple_matches_int():
    """At a square native size, the use_size_512=False path (tuple latent size,
    no pooling) must match the int path exactly — pooling 8x8 -> 8x8 is the
    identity, so the two programs are numerically the same computation."""
    pipe, params = _build((8, 8))
    v_int = _generate(pipe, params, (8, 8), 8)
    v_tuple = _generate(pipe, params, (8, 8), (8, 8))
    assert v_int.shape == (B, F, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(v_int), np.asarray(v_tuple),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_native_nonsquare_control():
    """use_size_512=False at a non-square size (the case the 512 path cannot
    express): latents (8, 16), condition images 64x128, no pooling anywhere."""
    pipe, params = _build((8, 16))
    video = _generate(pipe, params, (8, 16), (8, 16))
    assert video.shape == (B, F, 64, 128, 3)
    arr = np.asarray(video)
    assert np.isfinite(arr).all() and arr.min() >= 0.0 and arr.max() <= 1.0
