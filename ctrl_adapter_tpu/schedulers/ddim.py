"""DDIM scheduler — pure-jnp, traced-loop friendly.

Behavioral parity with diffusers' DDIMScheduler as used by the SDXL and I2VGen-XL
pipelines (50 steps, eta=0; reference `i2vgen_xl_controlnet_adapter_pipeline.py:821-823,
1106-1115`, `train.py:1181-1187`). Unlike the torch version, ``step`` takes the loop
index as a traced scalar so the whole sampling loop lives inside one ``lax.scan``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DDIMConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # "linear" | "scaled_linear"
    prediction_type: str = "epsilon"  # "epsilon" | "v_prediction"
    steps_offset: int = 1
    set_alpha_to_one: bool = False
    timestep_spacing: str = "leading"
    clip_sample: bool = False
    thresholding: bool = False
    rescale_betas_zero_snr: bool = False


def _make_alphas_cumprod(cfg: DDIMConfig) -> np.ndarray:
    if cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps, dtype=np.float64)
    elif cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                cfg.beta_start**0.5, cfg.beta_end**0.5, cfg.num_train_timesteps, dtype=np.float64
            )
            ** 2
        )
    else:
        raise ValueError(cfg.beta_schedule)
    alphas = 1.0 - betas
    return np.cumprod(alphas).astype(np.float32)


@dataclass(frozen=True)
class DDIMState:
    timesteps: jnp.ndarray  # (S,) int32, descending
    alphas_cumprod: jnp.ndarray  # (T,)
    final_alpha_cumprod: jnp.ndarray  # scalar
    num_inference_steps: int
    prediction_type: str = "epsilon"
    num_train_timesteps: int = 1000


class DDIMScheduler:
    def __init__(self, config: DDIMConfig = DDIMConfig()):
        self.config = config
        self.alphas_cumprod = jnp.asarray(_make_alphas_cumprod(config))

    def set_timesteps(self, num_inference_steps: int) -> DDIMState:
        cfg = self.config
        if cfg.timestep_spacing == "leading":
            step_ratio = cfg.num_train_timesteps // num_inference_steps
            timesteps = (np.arange(num_inference_steps) * step_ratio).round()[::-1].copy()
            timesteps += cfg.steps_offset
        elif cfg.timestep_spacing == "trailing":
            step_ratio = cfg.num_train_timesteps / num_inference_steps
            timesteps = np.round(np.arange(cfg.num_train_timesteps, 0, -step_ratio)) - 1
        else:
            raise ValueError(cfg.timestep_spacing)
        final_alpha = (
            jnp.asarray(1.0, jnp.float32) if cfg.set_alpha_to_one else self.alphas_cumprod[0]
        )
        return DDIMState(
            timesteps=jnp.asarray(timesteps, dtype=jnp.int32),
            alphas_cumprod=self.alphas_cumprod,
            final_alpha_cumprod=final_alpha,
            num_inference_steps=num_inference_steps,
            prediction_type=cfg.prediction_type,
            num_train_timesteps=cfg.num_train_timesteps,
        )

    @staticmethod
    def scale_model_input(state: DDIMState, sample: jnp.ndarray, step_index) -> jnp.ndarray:
        return sample  # DDIM does not scale

    @staticmethod
    def step(
        state: DDIMState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,  # traced int in [0, S)
        sample: jnp.ndarray,
        eta: float = 0.0,
    ) -> jnp.ndarray:
        """One x_t -> x_{t-1} update (eta=0 deterministic DDIM)."""
        assert eta == 0.0, "stochastic DDIM (eta>0) not used by the reference pipelines"
        t = state.timesteps[step_index]
        prev_t = t - state.num_train_timesteps // state.num_inference_steps

        alpha_prod_t = state.alphas_cumprod[t]
        alpha_prod_prev = jnp.where(
            prev_t >= 0,
            state.alphas_cumprod[jnp.clip(prev_t, 0)],
            state.final_alpha_cumprod,
        )
        beta_prod_t = 1.0 - alpha_prod_t

        dtype = sample.dtype
        sample32 = sample.astype(jnp.float32)
        out32 = model_output.astype(jnp.float32)

        if state.prediction_type == "epsilon":
            pred_x0 = (sample32 - beta_prod_t**0.5 * out32) / alpha_prod_t**0.5
            pred_eps = out32
        elif state.prediction_type == "v_prediction":
            pred_x0 = alpha_prod_t**0.5 * sample32 - beta_prod_t**0.5 * out32
            pred_eps = alpha_prod_t**0.5 * out32 + beta_prod_t**0.5 * sample32
        else:
            raise ValueError(state.prediction_type)

        direction = (1.0 - alpha_prod_prev) ** 0.5 * pred_eps
        prev_sample = alpha_prod_prev**0.5 * pred_x0 + direction
        return prev_sample.astype(dtype)

    def add_noise(
        self, original_samples: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        acp = self.alphas_cumprod[timesteps].astype(jnp.float32)
        while acp.ndim < original_samples.ndim:
            acp = acp[..., None]
        return (acp**0.5) * original_samples + ((1.0 - acp) ** 0.5) * noise

    def get_velocity(
        self, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        acp = self.alphas_cumprod[timesteps].astype(jnp.float32)
        while acp.ndim < sample.ndim:
            acp = acp[..., None]
        return (acp**0.5) * noise - ((1.0 - acp) ** 0.5) * sample
