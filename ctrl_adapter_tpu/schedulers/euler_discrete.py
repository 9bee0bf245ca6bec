"""EulerDiscrete scheduler — pure-jnp, scan-friendly. Covers both variants the
reference stack uses:

- **SDXL default**: beta-derived sigmas, "leading" discrete timesteps, epsilon
  prediction (stock SDXL scheduler config; the reference pipeline inherits it,
  `sdxl_controlnet_adapter_pipeline.py:1278-1285,1377-1378`);
- **SVD / EDM**: Karras sigmas in [0.002, 700] rho=7, continuous ``0.25 * log sigma``
  timesteps, v_prediction with EDM c_skip/c_out (reference
  `svd/pipelines/svd_controlnet_adapter_pipeline.py:596-612,673-681,768-774`).

Also provides the reference's training-time sigma/timestep sampler aligned with the
inference discretization (`utils/utils_svd.py:18-72`, `train.py:1057-1080`).
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
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"  # "epsilon" | "v_prediction"
    timestep_spacing: str = "leading"
    timestep_type: str = "discrete"  # "discrete" | "continuous" (0.25 log sigma)
    steps_offset: int = 1
    use_karras_sigmas: bool = False
    sigma_min: float = 0.002
    sigma_max: float = 700.0
    rho: float = 7.0


SVD_EULER_CONFIG = EulerDiscreteConfig(
    prediction_type="v_prediction",
    timestep_type="continuous",
    use_karras_sigmas=True,
)


@dataclass(frozen=True)
class EulerDiscreteState:
    sigmas: jnp.ndarray  # (S+1,) descending, last entry 0
    timesteps: jnp.ndarray  # (S,)
    num_inference_steps: int
    init_noise_sigma: jnp.ndarray  # scalar
    prediction_type: str = "epsilon"


class EulerDiscreteScheduler:
    def __init__(self, config: EulerDiscreteConfig = EulerDiscreteConfig()):
        self.config = config
        if config.beta_schedule == "scaled_linear":
            betas = (
                np.linspace(
                    config.beta_start**0.5, config.beta_end**0.5,
                    config.num_train_timesteps, dtype=np.float64,
                )
                ** 2
            )
        elif config.beta_schedule == "linear":
            betas = np.linspace(
                config.beta_start, config.beta_end, config.num_train_timesteps, dtype=np.float64
            )
        else:
            raise ValueError(config.beta_schedule)
        acp = np.cumprod(1.0 - betas)
        self._train_sigmas = (((1.0 - acp) / acp) ** 0.5).astype(np.float32)  # ascending

    def set_timesteps(self, num_inference_steps: int) -> EulerDiscreteState:
        cfg = self.config
        if cfg.use_karras_sigmas:
            sigmas = karras_sigmas(num_inference_steps, cfg.sigma_min, cfg.sigma_max, cfg.rho)
            init_noise_sigma = (sigmas[0] ** 2 + 1.0) ** 0.5
        else:
            if cfg.timestep_spacing == "leading":
                step_ratio = cfg.num_train_timesteps // num_inference_steps
                t_disc = (np.arange(num_inference_steps) * step_ratio).round()[::-1].astype(
                    np.float64
                )
                t_disc += cfg.steps_offset
            elif cfg.timestep_spacing == "trailing":
                step_ratio = cfg.num_train_timesteps / num_inference_steps
                t_disc = np.round(np.arange(cfg.num_train_timesteps, 0, -step_ratio)) - 1
            elif cfg.timestep_spacing == "linspace":
                t_disc = np.linspace(
                    0, cfg.num_train_timesteps - 1, num_inference_steps, dtype=np.float64
                )[::-1].copy()
            else:
                raise ValueError(cfg.timestep_spacing)
            sigmas = np.interp(
                t_disc, np.arange(cfg.num_train_timesteps), self._train_sigmas
            ).astype(np.float32)
            init_noise_sigma = (
                sigmas.max()
                if cfg.timestep_spacing in ("linspace", "trailing")
                else (sigmas.max() ** 2 + 1.0) ** 0.5
            )

        if cfg.timestep_type == "continuous":
            timesteps = 0.25 * np.log(sigmas)
        elif cfg.use_karras_sigmas:
            raise NotImplementedError("karras + discrete timesteps not used by the reference")
        else:
            timesteps = t_disc

        return EulerDiscreteState(
            sigmas=jnp.asarray(np.concatenate([sigmas, [0.0]]).astype(np.float32)),
            timesteps=jnp.asarray(timesteps.astype(np.float32)),
            num_inference_steps=num_inference_steps,
            init_noise_sigma=jnp.asarray(init_noise_sigma, dtype=jnp.float32),
            prediction_type=cfg.prediction_type,
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
        """One Euler step. ``sample`` is the un-scaled noisy latent x_t = x0 + sigma*eps.

        epsilon: pred_x0 = x_t - sigma * eps_hat (model sees the scaled input).
        v_prediction (EDM): pred_x0 = c_out * v + c_skip * x_t with
        c_out = -sigma/sqrt(sigma^2+1), c_skip = 1/(sigma^2+1) — matching the
        reference training loss (`train.py:1417-1420`).
        """
        sigma = state.sigmas[step_index].astype(jnp.float32)
        sigma_next = state.sigmas[step_index + 1].astype(jnp.float32)
        dtype = sample.dtype
        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)

        if state.prediction_type == "epsilon":
            pred_x0 = x - sigma * out
        elif state.prediction_type == "v_prediction":
            c_out = -sigma / (sigma**2 + 1.0) ** 0.5
            c_skip = 1.0 / (sigma**2 + 1.0)
            pred_x0 = c_out * out + c_skip * x
        else:
            raise ValueError(state.prediction_type)

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
