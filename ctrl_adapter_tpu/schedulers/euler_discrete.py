"""EulerDiscrete (EDM/Karras) scheduler for SVD — pure-jnp, scan-friendly.

Parity targets:
- diffusers EulerDiscreteScheduler as configured for SVD (Karras sigmas in
  [0.002, 700], rho=7, continuous "0.25 log sigma" timesteps, v_prediction/EDM step) —
  used by the reference SVD pipeline (`svd/pipelines/svd_controlnet_adapter_pipeline.py:
  596-612,673-681,768-774`);
- the reference's training-time sigma/timestep sampler aligned with the inference
  discretization (`utils/utils_svd.py:18-72`, `train.py:1057-1080`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def karras_sigmas(
    num_intervals: int, sigma_min: float = 0.002, sigma_max: float = 700.0, rho: float = 7.0
) -> np.ndarray:
    """Karras et al. (2022) noise schedule, descending (`utils/utils_svd.py:18-32`)."""
    ramp = np.linspace(0, 1, num_intervals)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    return ((max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho).astype(np.float32)


@dataclass(frozen=True)
class EulerDiscreteConfig:
    num_train_timesteps: int = 1000
    sigma_min: float = 0.002
    sigma_max: float = 700.0
    rho: float = 7.0
    prediction_type: str = "v_prediction"


@dataclass(frozen=True)
class EulerDiscreteState:
    sigmas: jnp.ndarray  # (S+1,) descending, last entry 0
    timesteps: jnp.ndarray  # (S,) continuous 0.25*log(sigma)
    num_inference_steps: int
    init_noise_sigma: jnp.ndarray  # scalar


class EulerDiscreteScheduler:
    def __init__(self, config: EulerDiscreteConfig = EulerDiscreteConfig()):
        self.config = config

    def set_timesteps(self, num_inference_steps: int) -> EulerDiscreteState:
        cfg = self.config
        sigmas = karras_sigmas(num_inference_steps, cfg.sigma_min, cfg.sigma_max, cfg.rho)
        timesteps = 0.25 * np.log(sigmas)
        sigmas_ext = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        return EulerDiscreteState(
            sigmas=jnp.asarray(sigmas_ext),
            timesteps=jnp.asarray(timesteps.astype(np.float32)),
            num_inference_steps=num_inference_steps,
            init_noise_sigma=jnp.asarray((sigmas[0] ** 2 + 1.0) ** 0.5, dtype=jnp.float32),
        )

    @staticmethod
    def scale_model_input(
        state: EulerDiscreteState, sample: jnp.ndarray, step_index: jnp.ndarray
    ) -> jnp.ndarray:
        sigma = state.sigmas[step_index].astype(jnp.float32)
        return (sample.astype(jnp.float32) / ((sigma**2 + 1.0) ** 0.5)).astype(sample.dtype)

    @staticmethod
    def step(
        state: EulerDiscreteState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
    ) -> jnp.ndarray:
        """Euler step. ``sample`` is the un-scaled noisy latent x_t = x0 + sigma*eps.

        v_prediction/EDM parameterization: pred_x0 = c_out * v + c_skip * x_t with
        c_out = -sigma/sqrt(sigma^2+1), c_skip = 1/(sigma^2+1) — matching
        diffusers EulerDiscreteScheduler and the reference training loss
        (`train.py:1417-1420`).
        """
        sigma = state.sigmas[step_index].astype(jnp.float32)
        sigma_next = state.sigmas[step_index + 1].astype(jnp.float32)
        dtype = sample.dtype
        x = sample.astype(jnp.float32)
        v = model_output.astype(jnp.float32)

        c_out = -sigma / (sigma**2 + 1.0) ** 0.5
        c_skip = 1.0 / (sigma**2 + 1.0)
        pred_x0 = c_out * v + c_skip * x

        derivative = (x - pred_x0) / sigma
        prev = x + derivative * (sigma_next - sigma)
        return prev.astype(dtype)


def sample_training_sigmas_timesteps(
    rng_uniform: jnp.ndarray,  # (batch,) uniform [0,1)
    sigmas_table: jnp.ndarray,  # (N,) descending Karras table
    num_inference_steps: int = 25,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Training sampler aligned with inference discretization
    (`utils/utils_svd.py:63-72`): returns (u, sigma) with
    u = idx/(N-1) * (1 - 1/steps) + 0.001; ControlNet timestep = round(u*1000)."""
    n = sigmas_table.shape[0]
    idx = (rng_uniform * n).astype(jnp.int32)
    u = idx.astype(jnp.float32) / (n - 1) * (1.0 - 1.0 / num_inference_steps) + 0.001
    return u, sigmas_table[idx]
