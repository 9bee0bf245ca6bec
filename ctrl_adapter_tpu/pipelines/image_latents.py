"""VAE encoding of the conditioning image for the video backbones.

Parity targets:
- I2VGen-XL ``prepare_image_latents``: ``vae.encode(image).latent_dist.sample()``
  of the first frame (reference
  `i2vgen_xl/pipelines/i2vgen_xl_controlnet_adapter_pipeline.py:487-517,804-812`) —
  the pipeline scales by ``vae_scaling_factor`` and builds the frame-position mask
  itself, so this returns the UNSCALED sampled latent;
- SVD ``_encode_vae_image``: ``vae.encode(image + noise_aug_strength * randn)
  .latent_dist.mode()`` (reference
  `svd/pipelines/svd_controlnet_adapter_pipeline.py:214-235,560-574`) — SVD image
  latents are concatenated to the UNet input unscaled.

Both take the image in [0, 1] unit range (the repo's ``image_to_unit`` convention)
and convert to the VAE's [-1, 1] domain internally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _to_vae_input(image_unit: jnp.ndarray) -> jnp.ndarray:
    """[0,1] (h,w,3) or (b,h,w,3) -> [-1,1] (b,h,w,3) float32."""
    x = jnp.asarray(image_unit, jnp.float32)
    if x.ndim == 3:
        x = x[None]
    return x * 2.0 - 1.0


def encode_first_frame_latent(vae, vae_params, image_unit, rng: jax.Array) -> jnp.ndarray:
    """I2VGen-XL first-frame latent: latent_dist.sample(), unscaled.

    Returns (b, h/8, w/8, 4) — feed as ``first_frame_latent`` to the I2VGen-XL
    pipeline (which applies the 0.18215 scaling, matching reference `:495-496`).
    """
    x = _to_vae_input(image_unit)
    mean, logvar = vae.apply(vae_params, x, method="encode_moments")
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, jnp.float32)


def encode_svd_image_latent(
    vae, vae_params, image_unit, rng: jax.Array, noise_aug_strength: float = 0.02
) -> jnp.ndarray:
    """SVD conditioning latent: noise-augmented image -> latent_dist.mode(), unscaled.

    The augmentation noise is added in image space BEFORE the encode
    (reference `svd_...py:560-562`); mode() = the distribution mean.
    """
    x = _to_vae_input(image_unit)
    x = x + noise_aug_strength * jax.random.normal(rng, x.shape, jnp.float32)
    mean, _ = vae.apply(vae_params, x, method="encode_moments")
    return mean
