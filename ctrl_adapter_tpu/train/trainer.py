"""Data-parallel training step for Ctrl-Adapter (adapter + optional router trainable).

Parity target: reference `train.py:1018-1424` (``compute_loss_from_batch``) and the
optimizer recipe (`train.py:691-714`, AdamW lr 5e-5, betas 0.9/0.999, wd 1e-2,
eps 1e-8, grad-clip 1.0).

TPU-native design:
- ONE jitted program per step: VAE encode, noise/timestep sampling, frozen ControlNet
  towers, router fusion, adapter forward, frozen backbone UNet forward, loss and the
  AdamW update all fuse into a single XLA program;
- data parallelism via sharded batch under ``jax.jit`` over a ``data`` mesh — the
  gradient all-reduce is emitted by XLA over ICI (no hand-written comms, SURVEY §2.4);
- only adapter/router gradients exist: frozen towers run under ``stop_gradient`` so
  XLA never materialises their backward graph (the reference relies on no_grad);
- static-shape sparse-frame training: the host samples k in [1,4] and passes the
  key-frame indices as a *traced* ``(k,)`` int array — only k (the shape) is static,
  so there are exactly 4 compiled variants regardless of which frames are drawn,
  matching `train.py:1280-1291` semantics (gather/scatter with dynamic indices).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.adapter import ControlNetAdapter
from ..models.controlnet import ControlNetModel
from ..models.router import ControlNetRouter, build_router_input, fuse_expert_residuals
from ..ops.flash_attention import grad_safe_blocks
from ..ops.resize import adaptive_avg_pool2d
from ..schedulers.ddim import DDIMConfig, DDIMScheduler
from ..schedulers.euler_discrete import karras_sigmas, sample_training_sigmas_timesteps
from .losses import edm_loss, min_snr_loss, mse_loss


@dataclass(frozen=True)
class TrainConfig:
    model_name: str = "i2vgenxl"  # "i2vgenxl" | "svd" | "sdxl"
    learning_rate: float = 5e-5
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    noise_offset: float = 0.05
    snr_gamma: Optional[float] = None  # 5.0 for sdxl
    n_sample_frames: int = 16
    output_fps: int = 16
    num_inference_steps: int = 25  # SVD sigma-sampler alignment
    train_noise_aug: float = 0.02  # SVD
    conditioning_dropout_prob: float = 0.1  # SVD
    vae_scaling_factor: float = 0.18215
    control_latent_size: int = 64
    skip_conv_in: bool = False
    skip_time_emb: bool = False
    guess_mode: bool = False  # logspace residual ramp (`controlnet.py:860-865`)
    prediction_type: str = "epsilon"
    num_experts: int = 1
    train_router: bool = False
    fixed_controlnet_timestep: int = -1  # >=0: constant ControlNet timestep (`train.py:952-955`)
    latent_nan_checking: bool = False  # scrub NaN latents (`train.py:1043-1045`)
    gradient_accumulation_steps: int = 1  # optax.MultiSteps (`train.py:1453-1458`)
    lr_scheduler: str = "constant"  # constant | constant_with_warmup | linear | cosine
    lr_warmup_steps: int = 0
    max_train_steps: int = 50000  # horizon for linear/cosine decay
    max_vae_encode: Optional[int] = None  # chunked VAE encode (`train.py:1027-1036`)
    # Rematerialize the frozen-UNet and adapter forwards in the backward pass
    # (reference --gradient_checkpointing, `train.py:676-681`). The frozen UNet
    # sits between the trainable adapter outputs and the loss, so its backward
    # runs and its saved activations dominate HBM; without remat the full
    # 512^2x8f step measures 431M over the 15.75G v5e HBM.
    gradient_checkpointing: bool = True


def _build_lr_schedule(cfg: "TrainConfig"):
    """Reference lr schedules (diffusers ``get_scheduler`` names, `train.py:167-179`)
    as optax schedules; warmup is linear from 0."""
    base, warm, total = cfg.learning_rate, cfg.lr_warmup_steps, cfg.max_train_steps
    if cfg.lr_scheduler == "constant" and not warm:
        return base
    if cfg.lr_scheduler in ("constant", "constant_with_warmup"):
        tail = optax.constant_schedule(base)
    elif cfg.lr_scheduler == "linear":
        tail = optax.linear_schedule(base, 0.0, max(1, total - warm))
    elif cfg.lr_scheduler == "cosine":
        tail = optax.cosine_decay_schedule(base, max(1, total - warm))
    else:
        raise ValueError(f"unknown lr_scheduler: {cfg.lr_scheduler}")
    if not warm:
        return tail
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base, warm), tail], [warm])


class CtrlAdapterTrainer:
    """Holds frozen modules + the trainable adapter/router and builds the jitted step."""

    def __init__(
        self,
        config: TrainConfig,
        unet,  # backbone flax module (UNet2DConditionModel | I2VGenXLUNet | SVD UNet)
        controlnet: ControlNetModel,
        adapter: ControlNetAdapter,
        vae,
        router: Optional[ControlNetRouter] = None,
        scheduler: Optional[DDIMScheduler] = None,
    ):
        self.config = config
        self.unet = unet
        self.controlnet = controlnet
        self.adapter = adapter
        self.vae = vae
        self.router = router
        self.scheduler = scheduler or DDIMScheduler(
            DDIMConfig(prediction_type=config.prediction_type)
        )
        self.sigmas_table = jnp.asarray(karras_sigmas(1000))  # SVD (`utils_svd.py:18-32`)
        self.lr_schedule = _build_lr_schedule(config)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adamw(
                self.lr_schedule,
                b1=config.adam_beta1,
                b2=config.adam_beta2,
                eps=config.adam_epsilon,
                weight_decay=config.adam_weight_decay,
            ),
        )
        if config.gradient_accumulation_steps > 1:
            self.optimizer = optax.MultiSteps(
                self.optimizer, every_k_schedule=config.gradient_accumulation_steps
            )

    # ------------------------------------------------------------------ state
    def init_optimizer(self, trainable_params):
        return self.optimizer.init(trainable_params)

    # ------------------------------------------------------------------- loss
    def _loss(
        self,
        trainable: Dict[str, Any],  # {"adapter": ..., optional "router": ...}
        frozen: Dict[str, Any],  # {"unet", "vae", "controlnet_0"..}
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
        sparse_frames: Optional[jnp.ndarray],  # traced (k,) int frame indices
    ):
        cfg = self.config
        frames = batch["frames"]  # (b, f, h, w, 3) in [-1, 1]
        b, f, h, w, _ = frames.shape
        rngs = dict(zip(
            ("vae", "noise", "offset", "time", "dropout"), jax.random.split(rng, 5)
        ))

        # 1.1 VAE encode (frozen, `train.py:1027-1048`); optionally chunked over
        # the (b*f) axis to bound encoder activation memory (`--max_vae_encode`)
        flat = frames.reshape(b * f, h, w, 3)
        if cfg.max_vae_encode and cfg.max_vae_encode < b * f and \
                (b * f) % cfg.max_vae_encode == 0:
            chunks = flat.reshape(-1, cfg.max_vae_encode, h, w, 3)
            mean, logvar = jax.lax.map(
                lambda c: self.vae.apply(frozen["vae"], c, method="encode_moments"),
                chunks)
            mean = mean.reshape(b * f, *mean.shape[2:])
            logvar = logvar.reshape(b * f, *logvar.shape[2:])
        else:
            mean, logvar = self.vae.apply(frozen["vae"], flat, method="encode_moments")
        z_noise = jax.random.normal(rngs["vae"], mean.shape, jnp.float32)
        latents = mean + jnp.exp(0.5 * logvar) * z_noise
        if cfg.latent_nan_checking:
            latents = jnp.where(jnp.isnan(latents), 0.0, latents)
        latents = jax.lax.stop_gradient(latents)
        lh, lw = latents.shape[1], latents.shape[2]
        latents = latents.reshape(b, f, lh, lw, 4) * cfg.vae_scaling_factor

        # 1.2 noise (+offset, `train.py:1050-1054`)
        noise = jax.random.normal(rngs["noise"], latents.shape, jnp.float32)
        if cfg.noise_offset:
            noise = noise + cfg.noise_offset * jax.random.normal(
                rngs["offset"], (b, 1, 1, 1, latents.shape[-1]), jnp.float32
            )

        # 1.3 timesteps / sigmas (`train.py:1056-1080`)
        if cfg.model_name == "svd":
            uf = jax.random.uniform(rngs["time"], (b,))
            u, sigmas = sample_training_sigmas_timesteps(
                uf, self.sigmas_table, cfg.num_inference_steps
            )
            unet_timesteps = 0.25 * jnp.log(sigmas)
            controlnet_timesteps = jnp.round(u * 1000.0)
        else:
            timesteps = jax.random.randint(
                rngs["time"], (b,), 0, self.scheduler.config.num_train_timesteps
            )
            unet_timesteps = timesteps
            controlnet_timesteps = timesteps.astype(jnp.float32)
        if cfg.fixed_controlnet_timestep >= 0:
            controlnet_timesteps = jnp.full((b,), float(cfg.fixed_controlnet_timestep))

        # 3. noisy latents + target (`train.py:1133-1187`)
        if cfg.model_name == "svd":
            sig = sigmas.reshape(b, 1, 1, 1, 1)
            small_noise = latents + noise * cfg.train_noise_aug
            conditional_latents = small_noise[:, 0] / cfg.vae_scaling_factor  # (b,h,w,4)
            noisy_latents_4ch = latents + noise * sig
            noisy_latents = noisy_latents_4ch / ((sig**2 + 1.0) ** 0.5)
            target = latents

            # conditioning dropout (`train.py:1151-1168`)
            if cfg.conditioning_dropout_prob:
                p = cfg.conditioning_dropout_prob
                random_p = jax.random.uniform(rngs["dropout"], (b,))
                prompt_mask = (random_p < 2 * p)[:, None, None]
                image_embeddings = jnp.where(
                    prompt_mask, 0.0, batch["image_embeddings"]
                )
                image_mask = 1.0 - (
                    (random_p >= p).astype(jnp.float32)
                    * (random_p < 3 * p).astype(jnp.float32)
                )
                conditional_latents = conditional_latents * image_mask[:, None, None, None]
            else:
                image_embeddings = batch["image_embeddings"]
        else:
            noisy_latents = self.scheduler.add_noise(latents, noise, unet_timesteps)
            if self.scheduler.config.prediction_type == "epsilon":
                target = noise
            else:
                target = self.scheduler.get_velocity(latents, noise, unet_timesteps)

        # ControlNet input: pooled to 64x64, first 4 channels (`train.py:1191-1220`)
        flat_noisy = noisy_latents.reshape(b * f, lh, lw, 4)
        s = cfg.control_latent_size
        pooled = adaptive_avg_pool2d(flat_noisy, (s, s)) if (lh, lw) != (s, s) else flat_noisy

        cn_text = jnp.repeat(batch["controlnet_text_emb"], f, axis=0)  # (b*f, 77, 768)
        cn_t = jnp.repeat(controlnet_timesteps, f, axis=0)

        # frozen ControlNet towers (`train.py:1222-1235`)
        per_down, per_mid = [], []
        for e in range(cfg.num_experts):
            downs, mid = self.controlnet.apply(
                frozen[f"controlnet_{e}"], pooled, cn_t, cn_text,
                batch["controlnet_cond"][e],
                skip_conv_in=cfg.skip_conv_in, skip_time_emb=cfg.skip_time_emb,
                guess_mode=cfg.guess_mode,
            )
            per_down.append([jax.lax.stop_gradient(d) for d in downs])
            per_mid.append(jax.lax.stop_gradient(mid))

        # router fusion (`train.py:1244-1276`); conditional router types get a
        # timestep/pooled-embedding input (build_router_input)
        if self.router is not None and cfg.num_experts > 1:
            # embedding router types consume the CLIP image embedding, matching
            # the reference wiring (`train.py:1251-1254` router_input=image_embeddings)
            router_in = build_router_input(
                self.router.router_type, controlnet_timesteps,
                batch.get("image_embeddings", batch.get("prompt_embeds")),
            )
            down_w, mid_w = self.router.apply(
                trainable["router"], router_in, sparse_mask=batch.get("expert_mask")
            )
        else:
            down_w = mid_w = None  # routerless: unweighted expert sum
        fused_down, fused_mid = fuse_expert_residuals(per_down, per_mid, down_w, mid_w)
        use_mid = "M" in self.adapter.adapter_locations
        if not use_mid:
            fused_mid = None

        # sparse-frame subselect (traced indices, static k; `train.py:1280-1291`)
        if sparse_frames is not None:
            idx = sparse_frames
            adapter_frames = int(sparse_frames.shape[0])
            sel_down = [d[idx] for d in fused_down]
            sel_mid = fused_mid[idx] if fused_mid is not None else None
        else:
            adapter_frames = f
            sel_down, sel_mid = fused_down, fused_mid

        # adapter encoder hidden states (`train.py:1294-1301`); for SVD this is the
        # conditioning-dropout-modified image embedding (`train.py:1161,1296`).
        if cfg.model_name == "svd":
            adapter_ehs = image_embeddings
        elif cfg.model_name == "i2vgenxl":
            adapter_ehs = batch["image_embeddings"]
        else:
            adapter_ehs = batch["prompt_embeds"]

        def apply_adapter(a_params, downs, mid, ehs):
            return self.adapter.apply(
                a_params, downs, mid, num_frames=adapter_frames,
                timestep=controlnet_timesteps, encoder_hidden_states=ehs,
            )

        if cfg.gradient_checkpointing:
            apply_adapter = jax.checkpoint(apply_adapter)
        adapted_down, adapted_mid = apply_adapter(
            trainable["adapter"], sel_down, sel_mid, adapter_ehs
        )

        # dense re-scatter (`train.py:1314-1331`)
        if sparse_frames is not None:
            full = []
            for a in adapted_down:
                dense = jnp.zeros((b * f,) + a.shape[1:], a.dtype)
                full.append(dense.at[idx].set(a))
            adapted_down = full
            if adapted_mid is not None:
                dense = jnp.zeros((b * f,) + adapted_mid.shape[1:], adapted_mid.dtype)
                adapted_mid = dense.at[idx].set(adapted_mid)

        # Experimental num_repeats aggregation returns `num_repeats` residuals
        # (`ctrl_adapter.py:208-221`). The reference feeds that short list
        # straight into the UNet, whose zip-injection then TRUNCATES the skip
        # tuple and crashes the up blocks (`unet_i2vgen_xl.py:681-695`) — the
        # path cannot actually run there. We diverge minimally: pad with zeros
        # at the remaining slots (the adapter's own convention for unadapted
        # slots, `ctrl_adapter.py:193`) so the experiment trains end-to-end.
        if self.adapter.num_repeats > 1 and len(adapted_down) < len(fused_down):
            adapted_down = list(adapted_down) + [
                jnp.zeros((b * f,) + d.shape[1:], adapted_down[0].dtype)
                for d in fused_down[len(adapted_down):]
            ]

        # frozen backbone UNet (`train.py:1340-1391`). Gradients flow THROUGH
        # the frozen UNet (trainable residuals feed it), so under
        # gradient_checkpointing its forward is rematerialized in the backward
        # instead of saving every activation.
        apply_unet = (jax.checkpoint(self.unet.apply)
                      if cfg.gradient_checkpointing else self.unet.apply)
        if cfg.model_name == "i2vgenxl":
            # frame-position-mask image latents from the clean first-frame latent
            ff = latents[:, 0]
            scales = jnp.arange(1, f, dtype=jnp.float32) / (f - 1)
            il = jnp.stack(
                [ff] + [jnp.ones_like(ff) * sc for sc in scales], axis=1
            )
            model_pred = apply_unet(
                frozen["unet"], noisy_latents, unet_timesteps,
                jnp.full((b,), float(cfg.output_fps)), il,
                batch["image_embeddings"], batch["prompt_embeds"],
                down_block_additional_residuals=adapted_down,
                mid_block_additional_residual=adapted_mid,
            )
        elif cfg.model_name == "svd":
            cond_rep = jnp.repeat(conditional_latents[:, None], f, axis=1)
            unet_in = jnp.concatenate([noisy_latents, cond_rep], axis=-1)
            added_time_ids = jnp.tile(
                jnp.asarray([[float(cfg.output_fps - 1), 127.0, cfg.train_noise_aug]]),
                (b, 1),
            )
            model_pred = apply_unet(
                frozen["unet"], unet_in, unet_timesteps, image_embeddings, added_time_ids,
                down_block_additional_residuals=adapted_down,
                mid_block_additional_residual=adapted_mid,
            )
        elif cfg.model_name == "sdxl":
            added = {"text_embeds": batch["pooled_prompt_embeds"],
                     "time_ids": batch["additional_time_ids"]}
            model_pred = apply_unet(
                frozen["unet"], noisy_latents.reshape(b * f, lh, lw, 4), unet_timesteps,
                batch["prompt_embeds"], added,
                down_block_additional_residuals=adapted_down,
                mid_block_additional_residual=jnp.zeros((), noisy_latents.dtype),
            ).reshape(b, f, lh, lw, 4)
        else:
            raise ValueError(cfg.model_name)

        # loss (`train.py:1394-1424`)
        if cfg.snr_gamma:
            loss = min_snr_loss(
                model_pred, target, self.scheduler.alphas_cumprod, unet_timesteps,
                cfg.snr_gamma,
            )
        elif cfg.model_name == "svd":
            loss = edm_loss(model_pred, noisy_latents_4ch, target, sigmas)
        else:
            loss = mse_loss(model_pred, target)

        aux = {}
        if down_w is not None:
            aux["down_block_weights"] = down_w
        if mid_w is not None:
            aux["mid_block_weights"] = mid_w
        return loss, aux

    # ------------------------------------------------------------------- step
    # trainable params + optimizer state are donated: the step consumes and
    # returns them, so XLA updates in place instead of double-buffering ~3x the
    # adapter size in HBM (CPU tests ignore donation with a warning).
    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1, 2))
    def train_step(
        self,
        trainable: Dict[str, Any],
        opt_state,
        frozen: Dict[str, Any],
        batch: Dict[str, jnp.ndarray],
        sparse_frames: Optional[jnp.ndarray] = None,
        rng: jax.Array = None,
    ):
        # ``sparse_frames`` is a traced (k,) int32 array (or None): only its shape
        # enters the jit cache key, so random per-step frame draws compile at most
        # one variant per k (the reference redraws indices every step,
        # `train.py:1280-1291`).
        # grad_safe_blocks: the flash kernel's residual-saving forward + backward
        # need 512-blocks to fit scoped VMEM (the inference 2048/1024 blocks OOM
        # under jvp at the adapter's (8,5,4096,64) attention — r4 bench log).
        # This runs at trace time, so it pins the block choice into this program.
        with grad_safe_blocks():
            (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                trainable, frozen, batch, rng, sparse_frames
            )
        updates, opt_state = self.optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **aux}
        return trainable, opt_state, metrics
