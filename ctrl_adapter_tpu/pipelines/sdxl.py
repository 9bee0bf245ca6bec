"""SDXL + Ctrl-Adapter inference pipeline — one jitted program per control phase.

Parity target: reference `sdxl/pipelines/sdxl_controlnet_adapter_pipeline.py`
(`:1278-1436`): CFG-doubled batch, stock-SDXL EulerDiscrete scheduler, latents pooled
to 64x64 + control image at 512 for the SD-v1.5 ControlNet (`:1305-1312`), adapter with
``num_frames=1`` and SDXL 2x upsampling, residuals into the first 9 UNet skips,
``mid_block_additional_residual = 0`` (`:1356-1366`), VAE decode.

TPU-native design:
- the denoising loop is split into (control-window, tail) ``lax.scan`` phases — steps
  outside ``control_guidance_[start,end]`` never execute the ControlNet/adapter;
- everything (ControlNet -> adapter -> UNet -> CFG -> scheduler step) is one fused XLA
  program per phase; no host sync per step;
- text encoders run outside (host-level preprocessing), the pipeline consumes
  precomputed embeddings.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.adapter import ControlNetAdapter
from ..models.controlnet import ControlNetModel
from ..models.unet_2d import UNet2DConditionModel
from ..models.vae import AutoencoderKL
from ..ops.resize import adaptive_avg_pool2d
from ..schedulers.euler_discrete import EulerDiscreteConfig, EulerDiscreteScheduler
from .common import (
    classifier_free_guidance_rescaled,
    control_window,
    guidance_scale_embedding,
    normalize_control_latent_size,
    sdxl_add_time_ids,
)


@dataclass(eq=False)  # identity hash: the pipeline object is a static jit argument
class SDXLControlNetAdapterPipeline:
    """Bundles frozen modules; ``generate`` builds/runs the jitted sampling program.

    Params are passed explicitly (functional) so the same pipeline object serves
    training-validation and inference without re-tracing per weight update.
    """

    unet: UNet2DConditionModel
    controlnet: ControlNetModel
    adapter: ControlNetAdapter
    vae: AutoencoderKL
    scheduler: EulerDiscreteScheduler = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.scheduler is None:
            self.scheduler = EulerDiscreteScheduler(EulerDiscreteConfig())

    @partial(jax.jit, static_argnums=(0, 8, 9, 12, 13, 14, 16, 18))
    def _sample(
        self,
        params: Dict[str, Any],
        latents: jnp.ndarray,  # (b, h/8, w/8, 4), already scaled by init_noise_sigma
        prompt_embeds: jnp.ndarray,  # (2b, 77, 2048) [neg; pos] (b when not do_cfg)
        add_text_embeds: jnp.ndarray,  # (2b, 1280)
        add_time_ids: jnp.ndarray,  # (2b, 6)
        controlnet_prompt_embeds: jnp.ndarray,  # (2b, 77, 768)
        control_image: jnp.ndarray,  # (2b, 8s, 8s, 3) in [0,1]
        num_inference_steps: int,
        window: Tuple[int, int],
        conditioning_scale: jnp.ndarray,
        guidance_scale: jnp.ndarray,
        skip_conv_in: bool,
        skip_time_emb: bool,
        control_latent_size: int = 64,
        guidance_rescale: jnp.ndarray = 0.0,
        guess_mode: bool = False,
        timestep_cond: Optional[jnp.ndarray] = None,  # (b, time_cond_proj_dim)
        do_cfg: bool = True,
        image_embeds: Optional[jnp.ndarray] = None,  # (2b, d) IP-Adapter CLIP embeds
    ) -> jnp.ndarray:
        state = self.scheduler.set_timesteps(num_inference_steps)
        added = {"text_embeds": add_text_embeds, "time_ids": add_time_ids}
        if image_embeds is not None:
            added["image_embeds"] = image_embeds

        def model_input(lat, i):
            lmi = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
            return EulerDiscreteScheduler.scale_model_input(state, lmi, i)

        def unet_step(lat, i, residuals, mid_residual):
            t = state.timesteps[i]
            lmi = model_input(lat, i)
            tb = jnp.broadcast_to(t, (lmi.shape[0],))
            noise_pred = self.unet.apply(
                params["unet"], lmi, tb, prompt_embeds, added,
                down_block_additional_residuals=residuals,
                mid_block_additional_residual=mid_residual,
                timestep_cond=timestep_cond,
            )
            if do_cfg:
                noise_pred = classifier_free_guidance_rescaled(
                    noise_pred, guidance_scale, guidance_rescale
                )
            return EulerDiscreteScheduler.step(state, noise_pred, i, lat)

        # exact ControlNet timestep remap u = 1000-(i+1)*(1000//steps)+1
        # (reference `sdxl_...py:1315-1318`) — shared helper with the SVD
        # pipeline. At step counts dividing 1000 this coincides with the
        # leading-spacing EulerDiscrete timesteps; at e.g. 30 steps it does not,
        # so the remap table is authoritative, not the backbone timestep.
        # Parity note: the reference computes `controlnet_timesteps` at `:1318`
        # but then passes the raw scheduler `t` to its ControlNet/adapter —
        # dead code. We honor the remap (the evident intent; bit-identical for
        # every released config, all of which use 50 steps) and give the adapter
        # the same timestep as the ControlNet, matching the training wiring
        # (`train.py:1222-1311`: both see controlnet_timesteps).
        from .svd import controlnet_timestep_remap

        cn_timesteps = jnp.asarray(controlnet_timestep_remap(num_inference_steps))

        def compute_residuals(lat, i):
            lmi = model_input(lat, i)
            # 64x64 latent + 512 control image bridge (reference `:1305-1312`);
            # size parameterized (s, 8s) so tests exercise the contract at small scale.
            s = normalize_control_latent_size(control_latent_size)
            pooled = adaptive_avg_pool2d(lmi, s)
            tb = jnp.broadcast_to(cn_timesteps[i], (lmi.shape[0],))
            downs, mid = self.controlnet.apply(
                params["controlnet"], pooled, tb, controlnet_prompt_embeds, control_image,
                conditioning_scale=conditioning_scale,
                skip_conv_in=skip_conv_in, skip_time_emb=skip_time_emb,
                guess_mode=guess_mode,
            )
            adapted, _ = self.adapter.apply(
                params["adapter"], downs, None,
                num_frames=1, timestep=tb, encoder_hidden_states=prompt_embeds,
            )
            return list(adapted)

        # ONE scan, control window as a lax.cond (UNet body compiles once; see
        # svd.py for the cold-compile rationale). mid_block_additional_residual=0
        # keeps diffusers' is_controlnet branch semantics (reference `:1364`).
        lo, hi = window
        if hi > lo:
            res_shapes = jax.eval_shape(compute_residuals, latents, jnp.asarray(0))

            def zero_residuals(lat, i):
                return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), res_shapes)

            def body(lat, i):
                in_window = jnp.logical_and(i >= lo, i < hi)
                adapted = jax.lax.cond(in_window, compute_residuals, zero_residuals, lat, i)
                return unet_step(lat, i, adapted, jnp.zeros((), latents.dtype)), None
        else:
            def body(lat, i):
                return unet_step(lat, i, None, None), None

        latents, _ = jax.lax.scan(body, latents, jnp.arange(num_inference_steps))
        return latents

    @partial(jax.jit, static_argnums=(0,))
    def _decode(self, vae_params, latents: jnp.ndarray, scaling_factor: float) -> jnp.ndarray:
        img = self.vae.apply(vae_params, latents / scaling_factor, method="decode")
        return jnp.clip(img / 2 + 0.5, 0.0, 1.0)

    def generate(
        self,
        params: Dict[str, Any],
        rng: jax.Array,
        prompt_embeds: jnp.ndarray,
        add_text_embeds: jnp.ndarray,
        controlnet_prompt_embeds: jnp.ndarray,
        control_image: jnp.ndarray,  # (b, 512, 512, 3) in [0,1]
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        guidance_rescale: float = 0.0,
        controlnet_conditioning_scale: float = 1.0,
        control_guidance_start: float = 0.0,
        control_guidance_end: float = 0.6,
        skip_conv_in: bool = False,
        skip_time_emb: bool = False,
        guess_mode: bool = False,
        original_size: Optional[Tuple[int, int]] = None,
        vae_scaling_factor: float = 0.13025,
        latents: Optional[jnp.ndarray] = None,
        control_latent_size: int = 64,
        output_type: str = "pil",
        ip_adapter_image_embeds: Optional[jnp.ndarray] = None,  # (b, d) CLIP image embeds
        mesh=None,  # jax.sharding.Mesh with a "data" axis: shard the image batch
    ):
        """Host-level wrapper: prepares CFG batches/latents, runs the jitted phases."""
        batch = prompt_embeds.shape[0] // 2
        # LCM semantics: a guidance-embedding UNet replaces CFG entirely
        # (reference `sdxl_...py:805-809`); the positive halves drive a
        # single-batch program and timestep_cond carries guidance_scale - 1.
        time_cond_dim = self.unet.config.time_cond_proj_dim
        do_cfg = guidance_scale > 1.0 and time_cond_dim is None
        timestep_cond = None
        if time_cond_dim is not None:
            timestep_cond = guidance_scale_embedding(
                jnp.full((batch,), guidance_scale - 1.0), time_cond_dim
            )
        if not do_cfg:
            prompt_embeds = prompt_embeds[batch:]
            add_text_embeds = add_text_embeds[batch:]
            controlnet_prompt_embeds = controlnet_prompt_embeds[batch:]
        model_batch = batch * 2 if do_cfg else batch
        state = self.scheduler.set_timesteps(num_inference_steps)
        if latents is None:
            latents = jax.random.normal(rng, (batch, height // 8, width // 8, 4), jnp.float32)
        latents = latents * state.init_noise_sigma

        add_time_ids = sdxl_add_time_ids(
            original_size or (height, width), (0, 0), (height, width), model_batch,
            dtype=prompt_embeds.dtype,
        )
        if control_image.shape[0] != model_batch:
            control_image = jnp.concatenate([control_image[:batch]] * (model_batch // batch), axis=0)

        # IP-Adapter: negative half attends zero image embeds (reference
        # `sdxl_...py:535-539` encode_image -> prepare_ip_adapter_image_embeds)
        image_embeds = None
        if ip_adapter_image_embeds is not None:
            image_embeds = ip_adapter_image_embeds[:batch]
            if do_cfg:
                image_embeds = jnp.concatenate(
                    [jnp.zeros_like(image_embeds), image_embeds], axis=0)

        window = control_window(num_inference_steps, control_guidance_start, control_guidance_end)
        if mesh is not None:
            # Multi-device generation (extension; see pipelines/svd.py): image
            # batch shards over `data`, params replicate.
            from ..parallel.mesh import batch_sharding, replicated

            n = mesh.shape["data"]
            if batch % n != 0:
                raise ValueError(
                    f"batch {batch} not divisible by data-axis size {n}")
            bs, rep = batch_sharding(mesh), replicated(mesh)
            params = jax.device_put(params, rep)
            latents = jax.device_put(latents, bs)
            prompt_embeds = jax.device_put(prompt_embeds, bs)
            add_text_embeds = jax.device_put(add_text_embeds, bs)
            add_time_ids = jax.device_put(add_time_ids, bs)
            controlnet_prompt_embeds = jax.device_put(controlnet_prompt_embeds, bs)
            control_image = jax.device_put(control_image, bs)
            if timestep_cond is not None:
                timestep_cond = jax.device_put(timestep_cond, bs)
            if image_embeds is not None:
                image_embeds = jax.device_put(image_embeds, bs)
        latents = self._sample(
            params, latents, prompt_embeds, add_text_embeds, add_time_ids,
            controlnet_prompt_embeds, control_image, num_inference_steps, window,
            jnp.asarray(controlnet_conditioning_scale, jnp.float32),
            jnp.asarray(guidance_scale, jnp.float32),
            skip_conv_in, skip_time_emb, control_latent_size,
            jnp.asarray(guidance_rescale, jnp.float32),
            # guess_mode: logspace 0.1->1.0 residual ramp in the ControlNet heads
            # (reference `sdxl_...py:1329`, `controlnet/controlnet.py:860-865`)
            bool(guess_mode),
            timestep_cond,
            bool(do_cfg),
            image_embeds,
        )
        image = self._decode(params["vae"], latents, vae_scaling_factor)
        if output_type == "latent":
            return latents
        return image
