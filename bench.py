"""Benchmark: SVD 512^2 depth-controlled video generation — frames/sec/chip.

North-star metric (BASELINE.md): frames/sec/chip for SVD 14-frame depth-controlled
generation (25 EDM steps, CFG, skip_conv_in latent skipping), i.e. the full reference
recipe of `inference_scripts/svd/*` re-expressed as jitted phase scans.

The reference repo publishes no numbers (BASELINE.md); ``vs_baseline`` is therefore
reported against a documented engineering estimate of the torch/A100 reference:
~0.75 frames/sec (25 UNet steps at CFG batch 2 x 14 frames x 64^2 latents on A100
plus chunked VAE decode, per the reference's per-step Python dispatch pipeline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

import os as _os

jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get("CTRL_ADAPTER_JAX_CACHE", "/tmp/jax_ctrl_adapter_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ctrl_adapter_tpu.utils.platform import respect_env_platforms

respect_env_platforms()  # explicit JAX_PLATFORMS (e.g. cpu smoke) wins over the proxy plugin

TORCH_A100_REFERENCE_FPS_ESTIMATE = 0.75  # documented estimate, see module docstring


def kernel_numerics_selfcheck():
    """Assert the Pallas kernels agree with their XLA fallbacks ON THIS CHIP.

    Interpret-mode tests cannot catch Mosaic miscompiles/precision hazards: in
    round 1 the fused GroupNorm kernel's stat matmuls ran at default MXU
    precision (bf16 rounding of fp32 sums), corrupting every GroupNorm by ~3e-2
    and NaN-ing near-constant groups — invisible to the CPU suite. This check
    runs the real kernels on the real chip before any timing.
    """
    import numpy as np

    from ctrl_adapter_tpu.ops.group_norm import _xla_group_norm_silu, group_norm_silu

    rng = np.random.default_rng(0)
    for shape, groups in (((2, 64, 64, 320), 32), ((2, 8, 8, 1280), 32)):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        scale = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
        bias = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32) * 0.02
        got = np.asarray(jax.jit(
            lambda a, s, b, g=groups: group_norm_silu(a, s, b, g, 1e-6, True)
        )(x, scale, bias))
        want = np.asarray(jax.jit(
            lambda a, s, b, g=groups: _xla_group_norm_silu(a, s, b, g, 1e-6, True)
        )(x, scale, bias))
        err = np.abs(got - want).max()
        assert np.isfinite(got).all() and err < 1e-4, (
            f"fused GroupNorm diverges from fallback on this chip: "
            f"shape={shape} maxdiff={err:.3e}")
    print("# kernel numerics self-check passed", file=sys.stderr)


def fabricate(module, *args, seed=0, scale=0.02, dtype=jnp.bfloat16, **kwargs):
    """Random params stored in bf16 — fp32 storage of the full SVD stack (~9.5GB)
    plus per-step bf16 conversion temps OOMs the 16GB chip."""
    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))
    rng = np.random.default_rng(seed)

    def fill(s):
        arr = rng.standard_normal(s.shape).astype(np.float32) * scale
        return jnp.asarray(arr).astype(dtype)

    return jax.tree.map(fill, shapes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--quick", action="store_true", help="tiny shapes (CI smoke)")
    ap.add_argument("--breakdown", action="store_true",
                    help="also time denoise-only vs VAE-decode (stderr)")
    args = ap.parse_args()

    if args.quick:
        args.frames, args.steps, args.height, args.width = 4, 5, 128, 128

    if jax.default_backend() == "tpu":
        kernel_numerics_selfcheck()

    from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
    from ctrl_adapter_tpu.models.controlnet import ControlNetModel
    from ctrl_adapter_tpu.models.unet_svd import UNetSpatioTemporalConditionModel
    from ctrl_adapter_tpu.models.vae import VAEConfig
    from ctrl_adapter_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder
    from ctrl_adapter_tpu.pipelines.svd import SVDControlNetAdapterPipeline

    dtype = jnp.bfloat16
    b, f = 1, args.frames
    lh, lw = args.height // 8, args.width // 8
    cls = lh  # pooled control latent size tracks latent size (64 at 512^2)

    unet = UNetSpatioTemporalConditionModel(dtype=dtype)
    cnet = ControlNetModel(dtype=dtype)
    adapter = ControlNetAdapter(
        backbone_model_name="svd", cross_attention_dim=1024, num_blocks=1,
        adapter_locations=("A", "B", "C", "D", "M"),
        add_temporal_resnet=True, add_temporal_transformer=True, dtype=dtype,
    )
    # SVD's real decode path is the temporal-decoder VAE (reference
    # `svd_controlnet_adapter_pipeline.py:265-292`)
    vae = AutoencoderKLTemporalDecoder(config=VAEConfig(), dtype=dtype)
    pipe = SVDControlNetAdapterPipeline(unet=unet, controlnet=cnet, adapter=adapter, vae=vae)

    # fabricate params (random weights: identical compute to released checkpoints)
    sample8 = jnp.ones((2 * b, f, lh, lw, 8), dtype)
    params = {
        "unet": fabricate(unet, sample8, jnp.ones((2 * b,)), jnp.ones((2 * b, 1, 1024), dtype),
                          jnp.ones((2 * b, 3), dtype)),
        "vae": fabricate(vae, jnp.ones((1, args.height, args.width, 3), dtype)),
    }
    cn_args = (jnp.ones((2 * b * f, cls, cls, 4), dtype), jnp.ones((2 * b * f,)),
               jnp.ones((2 * b * f, 77, 768), dtype),
               jnp.ones((2 * b * f, cls * 8, cls * 8, 3), dtype))
    params["controlnet"] = fabricate(cnet, *cn_args)
    downs_s, mid_s = jax.eval_shape(lambda: cnet.apply(params["controlnet"], *cn_args))
    params["adapter"] = fabricate(
        adapter, [jnp.zeros(s.shape, dtype) for s in downs_s], jnp.zeros(mid_s.shape, dtype),
        f, jnp.ones((2 * b * f,)), jnp.ones((1, 1, 1024), dtype))

    image_emb = jnp.ones((b, 1, 1024), dtype) * 0.1
    image_latent = jnp.ones((b, lh, lw, 4), dtype) * 0.1
    cn_prompt = jnp.ones((2 * b, 77, 768), dtype) * 0.02
    ctrl_images = jnp.ones((b * f, cls * 8, cls * 8, 3), dtype) * 0.5

    def run(seed):
        video = pipe.generate(
            params, jax.random.PRNGKey(seed), image_emb, image_latent, cn_prompt,
            ctrl_images, height=args.height, width=args.width, num_frames=f,
            num_inference_steps=args.steps, skip_conv_in=True,
            control_guidance_end=0.8, control_latent_size=cls,
        )
        # A scalar host read forces full on-device execution. block_until_ready alone
        # is NOT sufficient under this image's remote-TPU tunnel (buffers report
        # ready at enqueue, yielding impossible ~0.03s "timings").
        checksum = float(jnp.sum(video.astype(jnp.float32)))
        return video, checksum

    t0 = time.time()
    video, checksum = run(0)  # compile + first run
    compile_wall = time.time() - t0
    print(f"# first run (incl. compile): {compile_wall:.1f}s, video {video.shape}, "
          f"checksum {checksum:.3f}", file=sys.stderr)

    if args.breakdown:
        def run_latent(seed):
            lat = pipe.generate(
                params, jax.random.PRNGKey(seed), image_emb, image_latent, cn_prompt,
                ctrl_images, height=args.height, width=args.width, num_frames=f,
                num_inference_steps=args.steps, skip_conv_in=True,
                control_guidance_end=0.8, control_latent_size=cls,
                output_type="latent",
            )
            float(jnp.sum(lat.astype(jnp.float32)))
            return lat

        lat = run_latent(100)  # compile (decode-free program)
        t0 = time.time()
        run_latent(101)
        denoise_t = time.time() - t0
        t0 = time.time()
        float(jnp.sum(pipe._decode(params["vae"], lat, 0.18215).astype(jnp.float32)))
        decode_t = time.time() - t0
        print(f"# breakdown: denoise {denoise_t:.2f}s "
              f"({denoise_t / args.steps * 1000:.0f}ms/step), decode {decode_t:.2f}s",
              file=sys.stderr)

    times = []
    for i in range(args.repeats):
        t0 = time.time()
        run(i + 1)
        times.append(time.time() - t0)
    best = min(times)
    fps = (b * f) / best
    print(f"# steady-state generation: {best:.2f}s for {f} frames "
          f"({args.steps} steps, {args.height}x{args.width})", file=sys.stderr)

    print(json.dumps({
        "metric": "frames/sec/chip (SVD depth-controlled generation, "
                  f"{f}f {args.steps}steps {args.height}x{args.width}, CFG, latent-skip)",
        "value": round(fps, 4),
        "unit": "frames/sec",
        "vs_baseline": round(fps / TORCH_A100_REFERENCE_FPS_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
