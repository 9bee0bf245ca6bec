"""Ctrl-Adapter TPU training CLI.

Parity target: reference `train.py` — argparse + YAML config merge (`:1519-1530`),
module construction per backbone (`:436-634`), AdamW recipe (`:691-714`), training
loop with grad clipping, periodic checkpointing and validation (`:1428-1513`).

TPU-native deltas:
- one jitted program per step (see ctrl_adapter_tpu.train.trainer) over a ``data``
  mesh; grads all-reduce over ICI via XLA (no accelerate/NCCL);
- ``--fake_weights`` runs the full loop with fabricated frozen towers (smoke/perf);
- checkpoints: orbax with the reference's ``adapter_{step}``/``router_{step}`` layout;
- metrics: JSONL step log ({loss, lr, loss_time, router weights}) — the wandb-free
  equivalent of `train.py:1469-1476`; plug wandb in via WANDB_* env if available.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "CTRL_ADAPTER_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


from ctrl_adapter_tpu.utils.platform import respect_env_platforms

respect_env_platforms()  # let an explicit JAX_PLATFORMS=cpu win over the proxy plugin

from ctrl_adapter_tpu.config import add_train_args, merge_yaml_over_args
from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
from ctrl_adapter_tpu.models.controlnet import ControlNetModel
from ctrl_adapter_tpu.models.router import ControlNetRouter
from ctrl_adapter_tpu.models.unet_2d import SDXL_CONFIG, UNet2DConditionModel
from ctrl_adapter_tpu.models.unet_i2vgen import I2VGenXLUNet
from ctrl_adapter_tpu.models.unet_svd import UNetSpatioTemporalConditionModel
from ctrl_adapter_tpu.models.vae import AutoencoderKL, VAEConfig
from ctrl_adapter_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from ctrl_adapter_tpu.train.checkpoints import save_checkpoint
from ctrl_adapter_tpu.train.trainer import CtrlAdapterTrainer, TrainConfig


def fabricate(module, *args, seed=0, scale=0.02, **kwargs):
    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda s: jnp.asarray(rng.standard_normal(s.shape).astype(np.float32) * scale)
        .astype(s.dtype),
        shapes,
    )


def load_frozen_real(args, trainer):
    """Restore converted frozen towers from local checkpoints.

    Layout: ``--pretrained_model_path/{unet,vae}`` orbax dirs (written by
    ``python -m ctrl_adapter_tpu.convert.convert_checkpoints``) and one
    converted SD-v1.5 ControlNet dir per control type
    (reference `train.py:534-559` loads the `lllyasviel/control_v11*` zoo).

    Returns (frozen, controlnet_by_type): for mixed-control-types training the
    per-type towers stay resident on device and are swapped into the step's
    input tree per batch — same shapes, so no recompilation (`train.py:1110-1124`).
    """
    import orbax.checkpoint as ocp

    from ctrl_adapter_tpu.train.checkpoints import load_torch_release

    cfg = trainer.config
    if not args.pretrained_model_path:
        raise SystemExit(
            "--pretrained_model_path required: local dir with converted "
            "unet/vae/text encoders (ctrl_adapter_tpu.convert.convert_checkpoints)")
    frozen = {}
    with ocp.StandardCheckpointer() as ckptr:
        for name in ("unet", "vae"):
            frozen[name] = ckptr.restore(
                os.path.abspath(os.path.join(args.pretrained_model_path, name)))
    paths = args.controlnet_model_paths or []
    types = list(args.mixed_control_types_training or []) or list(args.control_types)
    if len(paths) < max(cfg.num_experts, 1):
        raise SystemExit(
            f"need {max(cfg.num_experts, 1)} --controlnet_model_paths (one per "
            f"control type), got {len(paths)}")
    controlnet_by_type = {}
    for i, path in enumerate(paths):
        tree, _ = load_torch_release(path)
        if i < cfg.num_experts:
            frozen[f"controlnet_{i}"] = tree
        if i < len(types):
            controlnet_by_type[types[i]] = tree
    return frozen, controlnet_by_type


def build_real_data_pipeline(args, cfg, b, f):
    """Host-side pipeline: dataset -> condition extraction -> CLIP embeddings,
    all inside prefetch workers so the device never waits (SURVEY §7 hard-part 5).

    Mirrors the reference collate (`train.py:770-865`): SD-v1.5 text emb for the
    ControlNet, backbone text emb, CLIP image emb (video backbones) or dual-text
    + time-ids (SDXL)."""
    from ctrl_adapter_tpu.conditions.extractors import ConditionExtractor
    from ctrl_adapter_tpu.data.loader import ImageDataset, Prefetcher, VideoDataset
    from ctrl_adapter_tpu.models.text_encoders import (
        CLIPImageEncoder, CLIPTextEncoder, build_controlnet_text_encoder,
    )

    annotators = json.loads(os.environ.get("CTRL_ADAPTER_ANNOTATORS", "{}"))
    extractor = ConditionExtractor(local_model_paths=annotators)
    mixed = list(args.mixed_control_types_training or [])
    train_types = list(args.control_types)

    if args.model_name == "sdxl" or args.input_data_type == "images":
        dataset = ImageDataset(
            args.train_data_path, args.train_prompt_path, size=args.height,
            control_size=cfg.control_latent_size * 8,
            control_types=train_types, extractor=extractor)
    else:
        dataset = VideoDataset(
            args.train_data_path, args.train_prompt_path, n_sample_frames=f,
            output_fps=args.output_fps, size=args.height,
            control_types=train_types, extractor=extractor)

    cn_text = build_controlnet_text_encoder(
        args.pretrained_model_path,
        getattr(args, "controlnet_text_encoder_path", None), args.model_name)
    # SVD is text-free: its checkpoint dir has no text_encoder subfolder and the
    # trainer conditions on image embeddings only (`train.py:1294-1298` reference).
    text_enc = (CLIPTextEncoder(args.pretrained_model_path)
                if args.model_name != "svd" else None)
    text_enc_2 = (CLIPTextEncoder(args.pretrained_model_path,
                                  subfolder="text_encoder_2", with_projection=True)
                  if args.model_name == "sdxl" else None)
    image_enc = (CLIPImageEncoder(args.pretrained_model_path)
                 if args.model_name in ("i2vgenxl", "svd") else None)

    def post_collate(batch):
        captions = batch.pop("captions")
        first = batch.pop("first_frames")  # (b, h, w, 3) in [-1, 1]
        # positive-only SD-v1.5 embedding for training (`train.py:800-812`)
        cn = cn_text(captions)
        batch["controlnet_text_emb"] = cn[len(captions):]
        if args.model_name == "sdxl":
            h1, _ = text_enc.encode_with_pooled(captions)
            h2, pooled2 = text_enc_2.encode_with_pooled(captions)
            batch["prompt_embeds"] = np.concatenate([h1, h2], axis=-1)
            batch["pooled_prompt_embeds"] = pooled2
            batch["additional_time_ids"] = np.tile(
                np.array([args.height, args.width, 0, 0,
                          args.height, args.width], np.float32), (len(captions), 1))
        else:
            if text_enc is not None:
                batch["prompt_embeds"] = text_enc(captions)
            first_u8 = ((first + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
            batch["image_embeddings"] = image_enc(list(first_u8))
        if cfg.num_experts > 1:
            mask = np.zeros((cfg.num_experts,), np.float32)
            k = np.random.randint(1, args.max_num_multi_source_train + 1)
            mask[np.random.choice(cfg.num_experts, k, replace=False)] = 1.0
            batch["expert_mask"] = mask
        return batch

    chooser = None
    if mixed and cfg.num_experts == 1:
        chooser = lambda rng: [rng.choice(mixed)]  # noqa: E731

    return Prefetcher(dataset, batch_size=b, num_workers=2, seed=args.seed,
                      control_types_chooser=chooser, post_collate=post_collate)


def build_trainer(args) -> CtrlAdapterTrainer:
    num_experts = (
        len(args.control_types)
        if getattr(args, "multi_source_random_select_control_types", False)
        else 1
    )
    cfg = TrainConfig(
        model_name=args.model_name,
        learning_rate=args.learning_rate,
        adam_beta1=args.adam_beta1,
        adam_beta2=args.adam_beta2,
        adam_weight_decay=args.adam_weight_decay,
        adam_epsilon=args.adam_epsilon,
        max_grad_norm=args.max_grad_norm,
        noise_offset=args.noise_offset,
        snr_gamma=args.snr_gamma,
        n_sample_frames=args.n_sample_frames,
        output_fps=args.output_fps,
        num_inference_steps=args.num_inference_steps,
        vae_scaling_factor=0.13025 if args.model_name == "sdxl" else 0.18215,
        control_latent_size=min(64, args.height // 8),
        skip_conv_in=args.skip_conv_in,
        skip_time_emb=args.skip_time_emb,
        guess_mode=getattr(args, "guess_mode", False),
        num_experts=num_experts,
        train_router=num_experts > 1,
        fixed_controlnet_timestep=args.fixed_controlnet_timestep,
        latent_nan_checking=getattr(args, "latent_nan_checking", False),
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        lr_scheduler=getattr(args, "lr_scheduler", "constant"),
        lr_warmup_steps=getattr(args, "lr_warmup_steps", 0),
        max_train_steps=args.max_train_steps,
        max_vae_encode=getattr(args, "max_vae_encode", None),
        gradient_checkpointing=getattr(args, "gradient_checkpointing", True),
    )
    temporal = args.model_name in ("i2vgenxl", "svd")
    # --mixed_precision bf16 (the default, reference `train.py:379-384` bf16
    # autocast equivalent): modules COMPUTE in bf16; params stay fp32
    # (param_dtype default) so the AdamW numerics match the reference recipe.
    dtype = jnp.bfloat16 if getattr(args, "mixed_precision", "bf16") == "bf16" \
        else jnp.float32
    adapter = ControlNetAdapter(
        backbone_model_name=args.model_name,
        num_blocks=args.num_blocks,
        num_adapters_per_location=args.num_adapters_per_location,
        cross_attention_dim=args.cross_attention_dim,
        adapter_locations=tuple(args.adapter_locations),
        add_spatial_resnet=args.add_spatial_resnet,
        add_temporal_resnet=args.add_temporal_resnet and temporal,
        add_spatial_transformer=args.add_spatial_transformer,
        add_temporal_transformer=args.add_temporal_transformer and temporal,
        num_repeats=args.num_repeats,
        out_channels=args.out_channels,
        dtype=dtype,
    )
    cnet = ControlNetModel(dtype=dtype)
    vae = AutoencoderKL(config=VAEConfig(scaling_factor=cfg.vae_scaling_factor),
                        dtype=dtype)
    if args.model_name == "sdxl":
        unet = UNet2DConditionModel(config=SDXL_CONFIG, dtype=dtype)
    elif args.model_name == "i2vgenxl":
        unet = I2VGenXLUNet(dtype=dtype)
    else:
        unet = UNetSpatioTemporalConditionModel(dtype=dtype)
    router = (
        ControlNetRouter(num_experts=num_experts, router_type=args.router_type)
        if num_experts > 1 else None
    )
    return CtrlAdapterTrainer(cfg, unet, cnet, adapter, vae, router=router)


def fabricate_frozen(args, trainer, b, f, lh, lw):
    cfg = trainer.config
    frozen = {"vae": fabricate(trainer.vae, jnp.ones((1, args.height, args.width, 3)))}
    cls = cfg.control_latent_size
    cn_args = (jnp.ones((b * f, cls, cls, 4)), jnp.ones((b * f,)),
               jnp.ones((b * f, 77, 768)), jnp.ones((b * f, cls * 8, cls * 8, 3)))
    for e in range(cfg.num_experts):
        frozen[f"controlnet_{e}"] = fabricate(trainer.controlnet, *cn_args, seed=e)
    if args.model_name == "sdxl":
        added = {"text_embeds": jnp.ones((b, 1280)), "time_ids": jnp.ones((b, 6))}
        frozen["unet"] = fabricate(
            trainer.unet, jnp.ones((b, lh, lw, 4)), jnp.ones((b,)),
            jnp.ones((b, 77, 2048)), added)
    elif args.model_name == "i2vgenxl":
        frozen["unet"] = fabricate(
            trainer.unet, jnp.ones((b, f, lh, lw, 4)), jnp.ones((b,)), jnp.ones((b,)),
            jnp.ones((b, f, lh, lw, 4)), jnp.ones((b, 1, 1024)), jnp.ones((b, 77, 1024)))
    else:
        frozen["unet"] = fabricate(
            trainer.unet, jnp.ones((b, f, lh, lw, 8)), jnp.ones((b,)),
            jnp.ones((b, 1, 1024)), jnp.ones((b, 3)))
    return frozen


def init_trainable(trainer, frozen, b, f):
    cfg = trainer.config
    cls = cfg.control_latent_size
    cn_args = (jnp.ones((b * f, cls, cls, 4)), jnp.ones((b * f,)),
               jnp.ones((b * f, 77, 768)), jnp.ones((b * f, cls * 8, cls * 8, 3)))
    downs_s, mid_s = jax.eval_shape(
        lambda: trainer.controlnet.apply(frozen["controlnet_0"], *cn_args))
    cd = trainer.adapter.cross_attention_dim
    use_mid = "M" in trainer.adapter.adapter_locations
    adapter_params = trainer.adapter.init(
        jax.random.PRNGKey(0),
        [jnp.zeros(s.shape) for s in downs_s],
        jnp.zeros(mid_s.shape) if use_mid else None,
        f, jnp.ones((b * f,)), jnp.ones((1, 1, cd)))
    trainable = {"adapter": adapter_params}
    if trainer.router is not None:
        from ctrl_adapter_tpu.models.router import build_router_input

        rin = build_router_input(
            trainer.router.router_type, jnp.zeros((1,)), jnp.zeros((1, 1, cd))
        )  # None for equal/simple router types
        trainable["router"] = trainer.router.init(jax.random.PRNGKey(1), rin)
    return trainable


def main():
    parser = argparse.ArgumentParser()
    add_train_args(parser)
    parser.add_argument("--fake_weights", action="store_true",
                        help="fabricated frozen towers + synthetic data (smoke/perf)")
    parser.add_argument("--synthetic_data", action="store_true")
    parser.add_argument("--run_validation", action="store_true",
                        help="generate a validation sample every validate_every_steps "
                             "(the reference's run_validation, `train.py:943-953`)")
    parser.add_argument("--use_wandb", action="store_true")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed for multi-host TPU slices")
    args = parser.parse_args()
    args = merge_yaml_over_args(args, args.yaml_file)
    random.seed(args.seed)
    np.random.seed(args.seed)
    if getattr(args, "save_n_steps", None):  # reference flag name wins when set
        args.checkpointing_steps = args.save_n_steps
    if getattr(args, "use_8bit_adam", False):
        print("8-bit Adam is a CUDA/bitsandbytes feature; using full-precision "
              "optax AdamW (states are sharded with the data mesh)", file=sys.stderr)
    if args.multihost:
        # multi-host: one process per host, mesh spans the slice over ICI
        # (TPU-native replacement for accelerate's NCCL process group, SURVEY §2.4)
        jax.distributed.initialize()

    if getattr(args, "scale_lr", False):
        args.learning_rate *= jax.device_count()  # reference `train.py:688-689`
    trainer = build_trainer(args)
    cfg = trainer.config
    mesh = create_mesh()
    n_dev = mesh.devices.size
    b = args.train_batch_size * n_dev
    f = 1 if args.model_name == "sdxl" else args.n_sample_frames
    lh, lw = args.height // 8, args.width // 8

    if args.fake_weights:
        frozen = fabricate_frozen(args, trainer, b, f, lh, lw)
        controlnet_by_type = None
    else:
        frozen, controlnet_by_type = load_frozen_real(args, trainer)
    if getattr(args, "mixed_precision", "bf16") == "bf16":
        # frozen towers live in bf16 on device (reference `train.py` casts them
        # to weight_dtype); only the trainable adapter/router keep fp32 params.
        # Halves frozen-param HBM (~2.8G at the i2vgenxl widths) — the full
        # 512^2 train step does not fit with fp32 frozen params.
        cast = lambda t: jax.tree.map(  # noqa: E731
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, t)
        frozen = cast(frozen)
        if controlnet_by_type is not None:
            controlnet_by_type = cast(controlnet_by_type)
    trainable = init_trainable(trainer, frozen, b, f)
    opt_state = trainer.init_optimizer(trainable)

    # adapter/optimizer resume (reference `train.py:603-614,716-735`)
    if args.adapter_resume_path and args.adapter_resume_step is not None:
        from ctrl_adapter_tpu.train.checkpoints import load_checkpoint

        restored = load_checkpoint(
            args.adapter_resume_path, args.adapter_resume_step,
            adapter_template=trainable["adapter"],
            router_template=trainable.get("router"),
            opt_template=opt_state,
        )
        trainable["adapter"] = restored["adapter"]
        if "router" in restored:
            trainable["router"] = restored["router"]
        if "opt_state" in restored and not getattr(
                args, "disable_optimizer_restore", False):
            opt_state = restored["opt_state"]  # `train.py:716-735` try/except analog
        print(f"resumed adapter from {args.adapter_resume_path} "
              f"@ step {args.adapter_resume_step}", file=sys.stderr)
    n_params = sum(x.size for x in jax.tree.leaves(trainable))
    print(f"trainable params: {n_params / 1e6:.1f}M over {n_dev} device(s)", file=sys.stderr)

    frozen = replicate(mesh, frozen)
    trainable = replicate(mesh, trainable)
    opt_state = replicate(mesh, opt_state)
    if controlnet_by_type:
        controlnet_by_type = {k: replicate(mesh, v)
                              for k, v in controlnet_by_type.items()}

    # data: synthetic (random) batches, or the video/image dataset pipeline
    if args.synthetic_data or args.fake_weights:
        rng_np = np.random.default_rng(args.seed)

        def next_batch():
            batch = {
                "frames": rng_np.uniform(-1, 1, (b, f, args.height, args.width, 3)).astype(np.float32),
                "controlnet_cond": rng_np.uniform(
                    0, 1, (cfg.num_experts, b * f,
                           cfg.control_latent_size * 8, cfg.control_latent_size * 8, 3)
                ).astype(np.float32),
                "controlnet_text_emb": rng_np.standard_normal((b, 77, 768)).astype(np.float32) * 0.1,
            }
            if args.model_name == "sdxl":
                batch["prompt_embeds"] = rng_np.standard_normal((b, 77, 2048)).astype(np.float32) * 0.1
                batch["pooled_prompt_embeds"] = np.ones((b, 1280), np.float32) * 0.1
                batch["additional_time_ids"] = np.ones((b, 6), np.float32)
            else:
                batch["prompt_embeds"] = rng_np.standard_normal((b, 77, 1024)).astype(np.float32) * 0.1
                batch["image_embeddings"] = np.ones((b, 1, 1024), np.float32) * 0.1
            if cfg.num_experts > 1:
                mask = np.zeros((cfg.num_experts,), np.float32)
                on = rng_np.choice(cfg.num_experts,
                                   rng_np.integers(1, args.max_num_multi_source_train + 1),
                                   replace=False)
                mask[on] = 1.0
                batch["expert_mask"] = mask
            return batch
    else:
        prefetcher = build_real_data_pipeline(args, cfg, b, f)

        def next_batch():
            batch = prefetcher.next()
            ctypes = batch.pop("control_types", None)
            if ctypes and controlnet_by_type:
                # mixed-type training: swap the matching frozen tower into the
                # step input (same shapes -> no recompile, stays on device)
                frozen["controlnet_0"] = controlnet_by_type[ctypes[0]]
            return batch

    log_path = os.path.join(args.DATA_PATH, "train_log.jsonl")
    os.makedirs(args.DATA_PATH, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)

    wandb_run = None
    if args.use_wandb:
        try:
            import wandb

            wandb_run = wandb.init(project="ctrl-adapter-tpu",
                                   config={k: str(v) for k, v in vars(args).items()})
        except Exception as e:  # zero-egress image: wandb likely unavailable
            print(f"wandb unavailable ({e}); falling back to JSONL log", file=sys.stderr)

    def run_validation(step, batch=None):
        """Generate one control-conditioned sample with the current adapter
        (the reference invokes the full inference path for EVERY backbone,
        `train.py:943-953`).

        With a real ``batch`` (the step's training batch), validation runs the
        pipeline on that batch's actual prompt/image embeddings, condition images
        and first-frame latent at the configured inference step count; without one
        (synthetic/fake-weights smoke) it falls back to fixed pseudo-inputs."""
        from ctrl_adapter_tpu.utils.image import save_concat_gif, save_gif, unit_to_uint8

        val_params = {
            "unet": frozen["unet"], "vae": frozen["vae"],
            "adapter": jax.tree.map(lambda x: x, trainable["adapter"]),
        }
        for e in range(cfg.num_experts):
            val_params[f"controlnet_{e}"] = frozen[f"controlnet_{e}"]
        # single-expert pipelines (svd/sdxl) read the unsuffixed key
        val_params["controlnet"] = frozen["controlnet_0"]
        if trainer.router is not None:
            val_params["router"] = trainable["router"]
        s = cfg.control_latent_size

        if batch is not None:
            # real-data validation: current batch's embeddings + conditions
            # (negative CFG halves are zero embeddings, as in training dropout)
            # SVD batches carry no prompt_embeds (text_enc is None for svd and
            # SVD generate() never consumes them) — fall back to zeros instead
            # of KeyError-ing the first real-data validation
            if "prompt_embeds" in batch:
                pe_pos = jnp.asarray(batch["prompt_embeds"][:1])
            else:
                pe_pos = jnp.zeros((1, 77, args.cross_attention_dim))
            cn_pos = jnp.asarray(batch["controlnet_text_emb"][:1])
            image_emb = jnp.asarray(batch.get("image_embeddings",
                                              jnp.zeros((1, 1, 1024)))[:1])
            first = jnp.asarray(batch["frames"][:1, 0])  # (1, h, w, 3)
            ff_mean, _ = trainer.vae.apply(frozen["vae"], first,
                                           method="encode_moments")
            cond = jnp.asarray(batch["controlnet_cond"][:, :f])  # (E, f, 8s, 8s, 3)
            prompt_embeds = jnp.concatenate([jnp.zeros_like(pe_pos), pe_pos])
            cn_embeds = jnp.concatenate([jnp.zeros_like(cn_pos), cn_pos])
            steps = args.num_inference_steps
        else:
            prompt_embeds = jnp.zeros((2, 77, args.cross_attention_dim))
            cn_embeds = jnp.zeros((2, 77, 768))
            image_emb = jnp.zeros((1, 1, 1024 if args.model_name != "sdxl"
                                   else args.cross_attention_dim))
            ff_mean = jnp.zeros((1, lh, lw, 4))
            cond = jnp.ones((cfg.num_experts, f, s * 8, s * 8, 3)) * 0.5
            steps = 4

        if args.model_name == "i2vgenxl":
            from ctrl_adapter_tpu.pipelines.i2vgenxl import (
                I2VGenXLControlNetAdapterPipeline,
            )

            pipe = I2VGenXLControlNetAdapterPipeline(
                unet=trainer.unet, controlnet=trainer.controlnet,
                adapter=trainer.adapter, vae=trainer.vae, router=trainer.router)
            video = pipe.generate(
                val_params, jax.random.PRNGKey(step),
                prompt_embeds=prompt_embeds,
                controlnet_prompt_embeds=cn_embeds,
                image_embeddings=image_emb,
                first_frame_latent=ff_mean,
                control_images=cond,
                height=args.height, width=args.width, num_frames=f,
                num_inference_steps=steps, control_latent_size=s,
            )
        elif args.model_name == "svd":
            from ctrl_adapter_tpu.pipelines.svd import SVDControlNetAdapterPipeline

            pipe = SVDControlNetAdapterPipeline(
                unet=trainer.unet, controlnet=trainer.controlnet,
                adapter=trainer.adapter, vae=trainer.vae)
            video = pipe.generate(
                val_params, jax.random.PRNGKey(step),
                image_embeddings=image_emb,
                image_latent=ff_mean,
                controlnet_prompt_embeds=cn_embeds,
                control_images=cond[0],  # (f, 8s, 8s, 3); SVD is single-expert
                height=args.height, width=args.width, num_frames=f,
                num_inference_steps=steps,
                skip_conv_in=cfg.skip_conv_in,
                control_latent_size=s,
            )
        else:  # sdxl
            from ctrl_adapter_tpu.pipelines.sdxl import SDXLControlNetAdapterPipeline

            pipe = SDXLControlNetAdapterPipeline(
                unet=trainer.unet, controlnet=trainer.controlnet,
                adapter=trainer.adapter, vae=trainer.vae)
            if batch is not None:
                pooled_pos = jnp.asarray(batch["pooled_prompt_embeds"][:1])
                pooled = jnp.concatenate([jnp.zeros_like(pooled_pos), pooled_pos])
            else:
                pooled = jnp.zeros((2, 1280))
            image = pipe.generate(
                val_params, jax.random.PRNGKey(step),
                prompt_embeds=prompt_embeds,
                add_text_embeds=pooled,
                controlnet_prompt_embeds=cn_embeds,
                control_image=cond[0, :1],  # (1, 8s, 8s, 3)
                height=args.height, width=args.width,
                num_inference_steps=steps, control_latent_size=s,
            )
            video = image[None] if image.ndim == 4 else image

        out = os.path.join(args.DATA_PATH, "validation", f"step_{step}.gif")
        frames_np = [np.asarray(v, np.float32) for v in video[0]]
        if len(frames_np) == 1:  # sdxl: single image
            from ctrl_adapter_tpu.utils.image import save_png

            out = out.replace(".gif", ".png")
            save_png(frames_np[0], out)
        else:
            save_gif(frames_np, out, fps=args.output_fps)
        if batch is not None and len(frames_np) > 1:
            # condition/generation side-by-side gif, as the reference's
            # validation writes (`inference.py:513-562` concat outputs)
            cond_vis = [unit_to_uint8(np.asarray(c, np.float32)) for c in cond[0]]
            gen_vis = [unit_to_uint8(v) for v in frames_np]
            if cond_vis[0].shape != gen_vis[0].shape:
                import cv2

                cond_vis = [cv2.resize(c, gen_vis[0].shape[:2][::-1]) for c in cond_vis]
            save_concat_gif([cond_vis, gen_vis],
                            out.replace(".gif", "_concat.gif"), fps=args.output_fps)
        print(f"validation sample -> {out}", file=sys.stderr)

    if args.run_validation and getattr(args, "run_validation_at_start", False):
        run_validation(0)  # reference `--run_validation_at_start` (`train.py:1432-1434`)

    for step in range(1, args.max_train_steps + 1):
        t0 = time.time()
        rng, step_rng = jax.random.split(rng)
        raw = next_batch()
        batch = shard_batch(mesh, {k: v for k, v in raw.items()
                                   if k not in ("controlnet_cond", "expert_mask")})
        batch["controlnet_cond"] = replicate(mesh, jnp.asarray(raw["controlnet_cond"]))
        if "expert_mask" in raw:
            batch["expert_mask"] = replicate(mesh, jnp.asarray(raw["expert_mask"]))

        sparse = None
        if args.apply_sparse_frame_mask:
            # traced (k,) index array: only k is static, so at most 4 compiled
            # step variants total (trainer.train_step docstring)
            k = random.randint(1, 4)
            sparse = jnp.asarray(sorted(random.sample(range(f), k)), jnp.int32)

        trainable, opt_state, metrics = trainer.train_step(
            trainable, opt_state, frozen, batch, sparse, step_rng)
        loss = float(metrics["loss"])
        dt = time.time() - t0
        lr_now = (float(trainer.lr_schedule(step)) if callable(trainer.lr_schedule)
                  else trainer.lr_schedule)
        rec = {"step": step, "loss": loss, "lr": lr_now, "loss_time": dt}
        if cfg.num_experts > 1:
            rec["down_block_weights"] = np.asarray(metrics["down_block_weights"]).tolist()
        with open(log_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        if wandb_run is not None:
            wandb_run.log(rec, step=step)
        print(f"step {step}: loss={loss:.5f} ({dt:.2f}s)", file=sys.stderr)

        if args.run_validation and step % args.validate_every_steps == 0:
            # real-data runs validate on the current batch's actual embeddings
            # and condition images (reference `train.py:943-953`)
            real_data = not (args.synthetic_data or args.fake_weights)
            run_validation(step, batch=raw if real_data else None)

        if (step % args.checkpointing_steps == 0 or step == args.max_train_steps) \
                and step >= getattr(args, "save_starting_step", 0):
            path = save_checkpoint(
                args.DATA_PATH, step, trainable["adapter"],
                trainable.get("router"), opt_state,
                config={"model_name": args.model_name,
                        "adapter_locations": list(args.adapter_locations)})
            print(f"checkpoint -> {path}", file=sys.stderr)

    if not (args.synthetic_data or args.fake_weights):
        prefetcher.close()


if __name__ == "__main__":
    main()
