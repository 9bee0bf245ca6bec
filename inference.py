"""Ctrl-Adapter TPU inference CLI.

Parity target: reference `inference.py` — per-backbone pipeline construction
(`:348-372`), adapter/router checkpoint loading (`:216-254`), per-sample loop with
condition loading/extraction (`:388-437`) and png/gif outputs (`:513-562`).

Differences (TPU-native):
- checkpoints load from *local* converted dirs (zero-egress image);
- ``--fake_weights`` fabricates random parameters at the real architecture so the full
  CLI path (fixtures -> conditions -> jitted sampling -> gif/png) runs end-to-end
  without any checkpoint — used by tests/verification and for performance smoke.
- the denoise loop is jit-compiled phase scans (see ctrl_adapter_tpu.pipelines).

Example (fixtures shipped with the reference, mounted read-only):
  python inference.py --model_name svd --control_types depth --fake_weights \
      --evaluation_input_folder /root/reference/assets/evaluation/frames \
      --num_inference_steps 4 --n_sample_frames 4 --height 128 --width 128
"""

from __future__ import annotations

import argparse
import json
import os
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

from ctrl_adapter_tpu.config import add_inference_args
from ctrl_adapter_tpu.conditions.extractors import MULTI_CONDITION_EXPERT_ORDER
from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
from ctrl_adapter_tpu.models.controlnet import ControlNetModel
from ctrl_adapter_tpu.models.router import ControlNetRouter
from ctrl_adapter_tpu.models.unet_2d import SDXL_CONFIG, UNet2DConditionModel
from ctrl_adapter_tpu.models.unet_i2vgen import I2VGenXLUNet
from ctrl_adapter_tpu.models.unet_svd import UNetSpatioTemporalConditionModel
from ctrl_adapter_tpu.models.vae import AutoencoderKL, VAEConfig
from ctrl_adapter_tpu.pipelines.i2vgenxl import I2VGenXLControlNetAdapterPipeline
from ctrl_adapter_tpu.pipelines.sdxl import SDXLControlNetAdapterPipeline
from ctrl_adapter_tpu.pipelines.svd import SVDControlNetAdapterPipeline
from ctrl_adapter_tpu.utils.image import (
    image_to_unit,
    load_image,
    save_concat_gif,
    save_gif,
    save_png,
    unit_to_uint8,
)

CROSS_DIM = {"i2vgenxl": 1024, "svd": 1024, "sdxl": 2048}
ADAPTER_LOCATIONS = {"i2vgenxl": ("A", "B", "C", "D", "M"),
                     "svd": ("A", "B", "C", "D", "M"),
                     "sdxl": ("A", "B", "C")}


def fabricate(module, *args, seed=0, scale=0.02, dtype=jnp.bfloat16, **kwargs):
    """Random params stored in bf16 (fp32 storage of a full backbone stack OOMs)."""
    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda s: jnp.asarray(rng.standard_normal(s.shape).astype(np.float32) * scale)
        .astype(dtype),
        shapes,
    )


def build_modules(args, dtype=jnp.bfloat16):
    temporal = args.model_name in ("i2vgenxl", "svd")
    adapter = ControlNetAdapter(
        backbone_model_name=args.model_name,
        num_blocks=1,
        cross_attention_dim=CROSS_DIM[args.model_name],
        adapter_locations=ADAPTER_LOCATIONS[args.model_name],
        add_spatial_resnet=True, add_temporal_resnet=temporal,
        add_spatial_transformer=True, add_temporal_transformer=temporal,
        dtype=dtype,
    )
    cnet = ControlNetModel(dtype=dtype)
    if args.model_name == "svd":
        # SVD decodes with the temporal-decoder VAE (reference
        # `svd/pipelines/svd_controlnet_adapter_pipeline.py:265-292`); a converted
        # SVD checkpoint only restores into this class (no post_quant_conv,
        # spatio-temporal decoder blocks + time_conv_out).
        from ctrl_adapter_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder

        vae = AutoencoderKLTemporalDecoder(
            config=VAEConfig(scaling_factor=0.18215), dtype=dtype)
    else:
        vae = AutoencoderKL(
            config=VAEConfig(
                scaling_factor=0.13025 if args.model_name == "sdxl" else 0.18215),
            dtype=dtype,
        )
    if args.model_name == "sdxl":
        unet = UNet2DConditionModel(config=SDXL_CONFIG, dtype=dtype)
        pipe = SDXLControlNetAdapterPipeline(unet=unet, controlnet=cnet, adapter=adapter, vae=vae)
    elif args.model_name == "i2vgenxl":
        unet = I2VGenXLUNet(dtype=dtype)
        router = None
        if len(args.control_types) > 1:
            router = ControlNetRouter(num_experts=len(MULTI_CONDITION_EXPERT_ORDER))
        pipe = I2VGenXLControlNetAdapterPipeline(
            unet=unet, controlnet=cnet, adapter=adapter, vae=vae, router=router)
    else:
        unet = UNetSpatioTemporalConditionModel(dtype=dtype)
        pipe = SVDControlNetAdapterPipeline(unet=unet, controlnet=cnet, adapter=adapter, vae=vae)
    return pipe


def fabricate_params(args, pipe, dtype=jnp.bfloat16):
    """Random params at the real architecture (``--fake_weights``)."""
    b, f = 1, (1 if args.model_name == "sdxl" else args.n_sample_frames)
    lh, lw = args.height // 8, args.width // 8
    cls = min(64, lh)
    num_experts = len(args.control_types) if args.model_name == "i2vgenxl" else 1

    params = {"vae": fabricate(pipe.vae, jnp.ones((1, args.height, args.width, 3)))}
    cn_args = (jnp.ones((2 * b * f, cls, cls, 4)), jnp.ones((2 * b * f,)),
               jnp.ones((2 * b * f, 77, 768)), jnp.ones((2 * b * f, cls * 8, cls * 8, 3)))
    if args.model_name == "i2vgenxl":
        for e in range(num_experts):
            params[f"controlnet_{e}"] = fabricate(pipe.controlnet, *cn_args, seed=e)
        cn_key = "controlnet_0"
    else:
        params["controlnet"] = fabricate(pipe.controlnet, *cn_args)
        cn_key = "controlnet"
    downs_s, mid_s = jax.eval_shape(lambda: pipe.controlnet.apply(params[cn_key], *cn_args))

    cd = CROSS_DIM[args.model_name]
    params["adapter"] = fabricate(
        pipe.adapter, [jnp.zeros(s.shape) for s in downs_s],
        jnp.zeros(mid_s.shape) if "M" in pipe.adapter.adapter_locations else None,
        f, jnp.ones((2 * b * f,)), jnp.ones((1, 1, cd)))

    if args.model_name == "sdxl":
        added = {"text_embeds": jnp.ones((2 * b, 1280)), "time_ids": jnp.ones((2 * b, 6))}
        params["unet"] = fabricate(
            pipe.unet, jnp.ones((2 * b, lh, lw, 4)), jnp.ones((2 * b,)),
            jnp.ones((2 * b, 77, 2048)), added)
    elif args.model_name == "i2vgenxl":
        params["unet"] = fabricate(
            pipe.unet, jnp.ones((2 * b, f, lh, lw, 4)), jnp.ones((2 * b,)),
            jnp.ones((2 * b,)), jnp.ones((2 * b, f, lh, lw, 4)),
            jnp.ones((2 * b, 1, 1024)), jnp.ones((2 * b, 77, 1024)))
        if pipe.router is not None:
            params["router"] = pipe.router.init(jax.random.PRNGKey(0))
    else:
        params["unet"] = fabricate(
            pipe.unet, jnp.ones((2 * b, f, lh, lw, 8)), jnp.ones((2 * b,)),
            jnp.ones((2 * b, 1, 1024)), jnp.ones((2 * b, 3)))
    return params


def load_params(args, pipe):
    """Load converted local checkpoints (adapter/router per `inference.py:216-254`,
    backbones from --pretrained_model_path)."""
    from ctrl_adapter_tpu.train.checkpoints import load_torch_release

    params = {}
    adapter_tree, _ = load_torch_release(args.adapter_checkpoint_path)
    params["adapter"] = adapter_tree
    if args.router_checkpoint_path:
        router_tree, _ = load_torch_release(args.router_checkpoint_path)
        params["router"] = router_tree
    if not args.pretrained_model_path:
        raise SystemExit("--pretrained_model_path required (local converted backbone)")
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        for name in ("unet", "vae"):
            params[name] = ckptr.restore(
                os.path.abspath(os.path.join(args.pretrained_model_path, name)))
    for i, path in enumerate(args.controlnet_model_paths or []):
        tree, _ = load_torch_release(path)
        key = f"controlnet_{i}" if args.model_name == "i2vgenxl" else "controlnet"
        params[key] = tree
    return params


def load_conditions(args, input_root, sample_name, frames):
    """Load pre-extracted condition frames (reference fixture layout:
    ``{input_root}/{control_type}/{sample}/*.png``), or extract on the fly
    (`inference.py:410-437`)."""
    conds = []
    for ctype in args.control_types:
        cdir = os.path.join(input_root, ctype, sample_name)
        if os.path.isdir(cdir) and not args.extract_control_conditions:
            files = sorted(
                fn for fn in os.listdir(cdir)
                if fn.lower().endswith((".png", ".jpg", ".jpeg"))
            )[: len(frames)]
            maps = [load_image(os.path.join(cdir, fn), (512, 512)) for fn in files]
            while len(maps) < len(frames):
                maps.append(maps[-1])
        else:
            from ctrl_adapter_tpu.conditions.extractors import ConditionExtractor

            maps = ConditionExtractor().extract(ctype, frames)
        conds.append(np.stack([image_to_unit(m) for m in maps]))
    return np.stack(conds)  # (E, f, 512, 512, 3)


def main():
    parser = argparse.ArgumentParser()
    add_inference_args(parser)
    parser.add_argument("--fake_weights", action="store_true",
                        help="random params at real architecture (no checkpoints needed)")
    parser.add_argument("--max_samples", type=int, default=None)
    parser.add_argument("--lora", type=str, default=None,
                        help="LoRA checkpoint folded into the backbone UNet "
                             "(`inference.py:374-375` load_lora_weights parity)")
    parser.add_argument("--lora_scale", type=float, default=1.0)
    args = parser.parse_args()

    pipe = build_modules(args)
    params = fabricate_params(args, pipe) if args.fake_weights else load_params(args, pipe)
    if args.lora:
        from ctrl_adapter_tpu.convert.lora import apply_lora, load_lora_file

        lora_sd = load_lora_file(args.lora)
        n = apply_lora(params["unet"], lora_sd, scale=args.lora_scale)
        print(f"merged LoRA deltas into {n} UNet modules from {args.lora}")

    # conditioning embeddings: with fake weights use fixed pseudo-embeddings so the
    # CLI runs hermetically; with real checkpoints use the CLIP encoders.
    f = 1 if args.model_name == "sdxl" else args.n_sample_frames
    rng_np = np.random.default_rng(args.seed)

    def pseudo_text(n, dim):
        return jnp.asarray(rng_np.standard_normal((n, 77, dim)).astype(np.float32) * 0.1)

    # caption lookup (`inference.py:183-185`)
    captions = {}
    cap_path = os.path.join(args.evaluation_input_folder, args.evaluation_prompt_file)
    if os.path.exists(cap_path):
        raw = json.load(open(cap_path))
        captions = {os.path.splitext(k)[0]: v for k, v in raw.items()}

    encoders = None
    if not args.fake_weights and args.pretrained_model_path:
        from ctrl_adapter_tpu.models.text_encoders import (
            CLIPImageEncoder, CLIPTextEncoder, ControlNetTextEncoder,
        )

        from ctrl_adapter_tpu.models.text_encoders import build_controlnet_text_encoder

        encoders = {
            "controlnet": build_controlnet_text_encoder(
                args.pretrained_model_path,
                getattr(args, "controlnet_text_encoder_path", None),
                args.model_name),
        }
        if args.model_name == "sdxl":
            # dual-encoder SDXL conditioning: penultimate hiddens of CLIP-L and
            # OpenCLIP-bigG concatenated (2048), pooled bigG -> add_text_embeds
            encoders["text"] = CLIPTextEncoder(args.pretrained_model_path)
            encoders["text_2"] = CLIPTextEncoder(
                args.pretrained_model_path, subfolder="text_encoder_2",
                with_projection=True)
        else:
            # the reference I2VGen-XL pipeline encodes prompts with clip_skip=1
            # (`i2vgen_xl_..._pipeline.py:568`)
            encoders["text"] = CLIPTextEncoder(
                args.pretrained_model_path,
                clip_skip=1 if args.model_name == "i2vgenxl" else 0)
        if args.model_name in ("i2vgenxl", "svd"):
            encoders["image"] = CLIPImageEncoder(args.pretrained_model_path)

    out_root = os.path.join(
        args.evaluation_output_folder, args.model_name, "_".join(args.control_types))
    os.makedirs(out_root, exist_ok=True)

    # evaluation set: reference fixture layout {root}/raw_input/{sample}/*.png with
    # sibling {root}/{control_type}/{sample}/ condition dirs
    input_root = args.evaluation_input_folder
    raw_root = os.path.join(input_root, "raw_input")
    if not os.path.isdir(raw_root):
        raw_root = input_root
    samples = sorted(
        d for d in os.listdir(raw_root) if os.path.isdir(os.path.join(raw_root, d))
    ) or [""]
    if args.max_samples:
        samples = samples[: args.max_samples]

    for sample_name in samples:
        frame_dir = os.path.join(raw_root, sample_name)
        frame_files = sorted(
            fn for fn in os.listdir(frame_dir)
            if fn.lower().endswith((".png", ".jpg", ".jpeg"))
        )[:f]
        if not frame_files:
            print(f"skip {sample_name}: no frames", file=sys.stderr)
            continue
        frames = [load_image(os.path.join(frame_dir, fn), (512, 512)) for fn in frame_files]
        while len(frames) < f:
            frames.append(frames[-1])
        conds = load_conditions(args, input_root, sample_name, frames)  # (E,f,512,512,3)
        # SDXL: ControlNet features live at half the backbone latent size — the
        # adapter's first layer upsamples x2 (`ctrl_adapter.py:61-66`); video
        # backbones share the 64x64 latent grid with the ControlNet.
        if args.use_size_512:
            ctrl_latent = (min(64, args.height // 16) if args.model_name == "sdxl"
                           else min(64, args.height // 8))
            cond_hw = (ctrl_latent * 8, ctrl_latent * 8)
        elif args.model_name == "sdxl":
            # Native-resolution control on SDXL: the adapter ALWAYS upsamples
            # its residuals x2 (`ctrl_adapter.py:61-66`), so the control grid
            # must sit at HALF the backbone latent grid — scaled with the
            # sample instead of fixed at 64/512. (The reference's own
            # use_size_512=False SDXL path would feed full-latent-size features
            # through the x2 upsample and crash the injection; this is the
            # coherent native-size mapping for the trained-adapter contract.)
            ctrl_latent = (args.height // 16, args.width // 16)
            cond_hw = (args.height // 2, args.width // 2)
        else:
            # use_size_512=False (`ctrl_helper.py:60-70`, reference
            # `inference.py:433-449`): no 512 crop/resize — the condition image
            # stays at the sample's own (possibly non-square) resolution and the
            # ControlNet consumes the latents unpooled.
            ctrl_latent = (args.height // 8, args.width // 8)
            cond_hw = (args.height, args.width)
        if tuple(conds.shape[2:4]) != cond_hw:
            import cv2

            conds = np.stack([
                np.stack([cv2.resize(fr, (cond_hw[1], cond_hw[0])) for fr in c])
                for c in conds
            ])

        prompt = captions.get(sample_name, "")

        def cn_embeds():
            if encoders is not None:
                return jnp.asarray(encoders["controlnet"](
                    [prompt], [args.negative_prompt]))  # (2, 77, 768) [neg; pos]
            return pseudo_text(2, 768)

        def backbone_text(dim):
            if encoders is not None and args.model_name == "i2vgenxl":
                pos = encoders["text"]([prompt])
                neg = encoders["text"]([args.negative_prompt])
                return jnp.asarray(np.concatenate([neg, pos], axis=0))
            return pseudo_text(2, dim)

        def sdxl_text():
            """(prompt_embeds (2,77,2048) [neg; pos], add_text_embeds (2,1280))."""
            if encoders is None or "text_2" not in encoders:
                return pseudo_text(2, 2048), jnp.ones((2, 1280)) * 0.1
            embs, pools = [], []
            for text in (args.negative_prompt, prompt):  # [neg; pos]
                h1, _ = encoders["text"].encode_with_pooled([text])
                h2, pool2 = encoders["text_2"].encode_with_pooled([text])
                embs.append(np.concatenate([h1, h2], axis=-1))
                pools.append(pool2)
            return (jnp.asarray(np.concatenate(embs, axis=0)),
                    jnp.asarray(np.concatenate(pools, axis=0)))

        def image_embeds():
            if encoders is not None and "image" in encoders:
                # SVD preprocesses with the antialiased resize path
                # (`svd_..._pipeline.py:239-263`)
                return jnp.asarray(encoders["image"](
                    [frames[0]], antialiased=args.model_name == "svd"))
            return jnp.ones((1, 1, 1024)) * 0.1

        def conditioning_image_latent(latent_rng):
            """VAE-encode the first frame for the video backbones.

            I2VGen-XL: latent_dist.sample() (`i2vgen_xl_...py:804-812`); SVD:
            noise-augmented latent_dist.mode() (`svd_...py:560-574`). With
            ``--fake_weights`` the latent stays zero (hermetic CLI path: random
            VAE params produce meaningless latents anyway).
            """
            shape = (1, args.height // 8, args.width // 8, 4)
            if args.fake_weights:
                return jnp.zeros(shape)
            from ctrl_adapter_tpu.pipelines.image_latents import (
                encode_first_frame_latent, encode_svd_image_latent,
            )

            img = frames[0]
            if img.shape[:2] != (args.height, args.width):
                import cv2

                img = cv2.resize(img, (args.width, args.height))
            unit = image_to_unit(img)
            if args.model_name == "svd":
                return encode_svd_image_latent(
                    pipe.vae, params["vae"], unit, latent_rng,
                    noise_aug_strength=args.noise_aug_strength)
            return encode_first_frame_latent(pipe.vae, params["vae"], unit, latent_rng)

        rng = jax.random.PRNGKey(args.seed)
        rng, latent_rng = jax.random.split(rng)
        t0 = time.time()

        # --controlnet_conditioning_scale/--control_guidance_* accept one value
        # per expert (nargs="+"); single-expert backbones take the scalar
        def _scalar(v):
            return float(v[0]) if isinstance(v, (list, tuple)) else float(v)

        if args.model_name == "sdxl":
            sdxl_prompt_embeds, sdxl_pooled = sdxl_text()
            video = pipe.generate(
                params, rng,
                prompt_embeds=sdxl_prompt_embeds,
                add_text_embeds=sdxl_pooled,
                controlnet_prompt_embeds=cn_embeds(),
                control_image=jnp.asarray(conds[0]),
                height=args.height, width=args.width,
                num_inference_steps=args.num_inference_steps,
                guidance_scale=args.guidance_scale,
                controlnet_conditioning_scale=_scalar(args.controlnet_conditioning_scale),
                control_guidance_start=_scalar(args.control_guidance_start),
                control_guidance_end=_scalar(args.control_guidance_end),
                guess_mode=args.guess_mode,
                control_latent_size=ctrl_latent,
            )
            video = np.asarray(video)[None]  # (1, 1, h, w, 3)
        elif args.model_name == "i2vgenxl":
            video = np.asarray(pipe.generate(
                params, rng,
                prompt_embeds=backbone_text(1024),
                controlnet_prompt_embeds=cn_embeds(),
                image_embeddings=image_embeds(),
                first_frame_latent=conditioning_image_latent(latent_rng),
                control_images=jnp.asarray(conds.reshape(conds.shape[0], -1, *conds.shape[2:])),
                height=args.height, width=args.width, num_frames=f,
                num_inference_steps=args.num_inference_steps,
                guidance_scale=args.guidance_scale,
                controlnet_conditioning_scale=args.controlnet_conditioning_scale,
                control_guidance_start=args.control_guidance_start,
                control_guidance_end=args.control_guidance_end,
                sparse_frames=args.sparse_frames,
                inference_expert_masks=args.inference_expert_masks,
                skip_conv_in=args.skip_conv_in,
                guess_mode=args.guess_mode,
                control_latent_size=ctrl_latent,
            ))
        else:
            video = np.asarray(pipe.generate(
                params, rng,
                image_embeddings=image_embeds(),
                image_latent=conditioning_image_latent(latent_rng),
                controlnet_prompt_embeds=cn_embeds(),
                control_images=jnp.asarray(conds[0]),
                height=args.height, width=args.width, num_frames=f,
                num_inference_steps=args.num_inference_steps,
                controlnet_conditioning_scale=_scalar(args.controlnet_conditioning_scale),
                control_guidance_start=_scalar(args.control_guidance_start),
                control_guidance_end=_scalar(args.control_guidance_end),
                sparse_frames=args.sparse_frames,
                skip_conv_in=args.skip_conv_in,
                guess_mode=args.guess_mode,
                control_latent_size=ctrl_latent,
            ))
        dt = time.time() - t0
        print(f"{sample_name or 'sample'}: {video.shape} in {dt:.1f}s", file=sys.stderr)

        out_dir = os.path.join(out_root, sample_name or "sample")
        os.makedirs(out_dir, exist_ok=True)
        vid = video[0]
        if vid.shape[0] == 1:
            save_png(vid[0], os.path.join(out_dir, "output.png"))
        else:
            save_gif(list(vid), os.path.join(out_dir, "output.gif"), fps=args.output_fps)
            cond_vis = [unit_to_uint8(c) for c in conds[0][: vid.shape[0]]]
            gen_vis = [unit_to_uint8(v) for v in vid]
            if cond_vis[0].shape != gen_vis[0].shape:
                import cv2

                cond_vis = [cv2.resize(c, gen_vis[0].shape[:2][::-1]) for c in cond_vis]
            save_concat_gif([cond_vis, gen_vis],
                            os.path.join(out_dir, "output_concat.gif"), fps=args.output_fps)

        if args.evaluate:
            # per-sample control-fidelity metrics next to the outputs (the reference
            # leaves evaluation as a TODO, `README.md:228`; this implements the
            # paper's spatial-control / temporal-smoothness measurements)
            from ctrl_adapter_tpu.evaluation.metrics import evaluate_video

            cond_uint8 = np.stack(
                [unit_to_uint8(c) for c in conds[0][: vid.shape[0]]]
            )
            if cond_uint8.shape[1:3] != vid.shape[1:3]:
                import cv2

                # nearest-neighbor: bilinear would interpolation-shift (and
                # soften) edge/segment maps, biasing the F1 metric
                cond_uint8 = np.stack(
                    [cv2.resize(c, vid.shape[1:3][::-1],
                                interpolation=cv2.INTER_NEAREST)
                     for c in cond_uint8])
            metrics = evaluate_video(
                np.asarray(vid, np.float32), cond_uint8,
                control_type=args.control_types[0])
            with open(os.path.join(out_dir, "metrics.json"), "w") as fh:
                json.dump({"sample": sample_name or "sample",
                           "control_type": args.control_types[0], **metrics}, fh)
            print(f"metrics[{sample_name or 'sample'}]: {metrics}", file=sys.stderr)

    print(json.dumps({"status": "ok", "output": out_root}))


if __name__ == "__main__":
    main()
