"""Conditioning-image VAE encoding for the video backbones.

Locks the reference semantics the r2 CLI stubbed out with zeros:
- I2VGen-XL ``prepare_image_latents``: latent_dist.sample(), unscaled
  (`i2vgen_xl_...py:487-517,804-812`);
- SVD ``_encode_vae_image``: noise-augmented image -> latent_dist.mode()
  (`svd_...py:214-235,560-574`).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ctrl_adapter_tpu.models.vae import AutoencoderKL, VAEConfig
from ctrl_adapter_tpu.pipelines.image_latents import (
    encode_first_frame_latent,
    encode_svd_image_latent,
)

CFG = VAEConfig(block_out_channels=(16, 16, 16, 16), norm_num_groups=8, layers_per_block=1)


def _tiny_vae():
    vae = AutoencoderKL(config=CFG)
    params = vae.init(jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)))
    return vae, params


def test_first_frame_latent_is_sampled_and_nonzero():
    vae, params = _tiny_vae()
    img = np.random.default_rng(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    lat_a = encode_first_frame_latent(vae, params, img, jax.random.PRNGKey(1))
    lat_b = encode_first_frame_latent(vae, params, img, jax.random.PRNGKey(2))
    assert lat_a.shape == (1, 8, 8, 4)
    assert float(jnp.abs(lat_a).max()) > 0.0
    # latent_dist.sample(): different rng -> different latent (stochastic, `:495`)
    assert float(jnp.abs(lat_a - lat_b).max()) > 0.0


def test_svd_latent_is_mode_with_noise_aug():
    vae, params = _tiny_vae()
    img = np.random.default_rng(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    lat = encode_svd_image_latent(vae, params, img, jax.random.PRNGKey(1), 0.02)
    assert lat.shape == (1, 8, 8, 4)
    assert float(jnp.abs(lat).max()) > 0.0
    # zero noise_aug -> deterministic mode(); rng must not matter then
    lat0a = encode_svd_image_latent(vae, params, img, jax.random.PRNGKey(1), 0.0)
    lat0b = encode_svd_image_latent(vae, params, img, jax.random.PRNGKey(7), 0.0)
    np.testing.assert_allclose(np.asarray(lat0a), np.asarray(lat0b))
    # noise aug perturbs the encode input (image-space, BEFORE the encoder `:560-562`)
    big = encode_svd_image_latent(vae, params, img, jax.random.PRNGKey(1), 1.0)
    assert float(jnp.abs(big - lat0a).max()) > 1e-6


def test_svd_latent_equals_mean_of_moments():
    vae, params = _tiny_vae()
    img = np.random.default_rng(3).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    lat = encode_svd_image_latent(vae, params, img, jax.random.PRNGKey(0), 0.0)
    x = jnp.asarray(img, jnp.float32)[None] * 2.0 - 1.0
    mean, _ = vae.apply(params, x, method="encode_moments")
    np.testing.assert_allclose(np.asarray(lat), np.asarray(mean), rtol=1e-6)
