"""Diffusion training losses: plain MSE, min-SNR-weighted MSE, EDM-denoised.

Parity targets: reference `train.py:1394-1424` and the min-SNR weighting of
`compute_snr` (diffusers) used for SDXL (`train.py:86-135` snr_gamma=5.0).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def mse_loss(model_pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((model_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def compute_snr(alphas_cumprod: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
    """SNR(t) = alpha_bar / (1 - alpha_bar)."""
    acp = alphas_cumprod[timesteps].astype(jnp.float32)
    return acp / (1.0 - acp)


def min_snr_loss(
    model_pred: jnp.ndarray,
    target: jnp.ndarray,
    alphas_cumprod: jnp.ndarray,
    timesteps: jnp.ndarray,  # (b,)
    snr_gamma: float,
) -> jnp.ndarray:
    """Per-sample MSE re-weighted by min(SNR, gamma)/SNR (`train.py:1395-1410`)."""
    snr = compute_snr(alphas_cumprod, timesteps)
    weights = jnp.minimum(snr, snr_gamma) / snr
    per_elem = (model_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    per_sample = per_elem.reshape(per_elem.shape[0], -1).mean(axis=1)
    return jnp.mean(per_sample * weights)


def edm_loss(
    model_pred: jnp.ndarray,  # v-prediction, (b, f, ...) layout
    noisy_latents_4ch: jnp.ndarray,  # x0 + sigma*eps, same layout
    target: jnp.ndarray,  # clean latents, same layout
    sigmas: jnp.ndarray,  # (b,) or broadcastable
) -> jnp.ndarray:
    """EDM weighted denoising loss (`train.py:1416-1424`):
    denoised = c_out * pred + c_skip * x_t; loss = mean_b[ mean(w * (denoised-x0)^2) ]
    with c_out = -sigma/sqrt(sigma^2+1), c_skip = 1/(sigma^2+1), w = (1+sigma^2)/sigma^2.
    """
    sigmas = sigmas.reshape(sigmas.shape[0], *([1] * (model_pred.ndim - 1))).astype(jnp.float32)
    c_out = -sigmas / (sigmas**2 + 1.0) ** 0.5
    c_skip = 1.0 / (sigmas**2 + 1.0)
    denoised = model_pred.astype(jnp.float32) * c_out + c_skip * noisy_latents_4ch.astype(jnp.float32)
    weighing = (1.0 + sigmas**2) * sigmas**-2.0
    per_sample = (weighing * (denoised - target.astype(jnp.float32)) ** 2)
    per_sample = per_sample.reshape(per_sample.shape[0], -1).mean(axis=1)
    return per_sample.mean()
