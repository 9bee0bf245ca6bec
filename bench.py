"""Benchmark matrix: Ctrl-Adapter TPU generation/training throughput per chip.

Headline (default, recorded by the driver): SVD 512^2 depth-controlled video
generation — frames/sec/chip (25 EDM steps, CFG, skip_conv_in latent skipping),
i.e. the full reference recipe of `inference_scripts/svd/*` as jitted phase scans.

``--config`` selects the measured recipe (BASELINE.md operating points):
  svd_depth            SVD 14f 512^2 depth, 25 steps (default; north star)
  svd_softedge_sparse  SVD 14f 512^2, sparse key-frame control (frames 0/5/10/13)
  i2vgenxl_depth       I2VGen-XL 16f 512^2 depth, 50 DDIM steps
  i2vgenxl_multi       I2VGen-XL 16f multi-condition (7-expert router, 2 active)
  sdxl_depth           SDXL 1024^2 depth, 50 steps
  train_step           I2VGen-XL 512^2x8f training step (adapter+AdamW), steps/sec

The reference repo publishes no numbers (BASELINE.md); ``vs_baseline`` is
reported against a documented engineering estimate of the torch/A100 reference
for the headline config (~0.75 frames/sec) and is null for the other configs.

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

# Persistent compile cache INSIDE the repo (gitignored via `.cache/`): driver
# containers are fresh (cold /tmp) but share this checkout, so a cache warmed
# during development turns the ~10 min cold compile of the jitted phase scans
# into a seconds-long cache load.
jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get(
        "CTRL_ADAPTER_JAX_CACHE",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".cache", "jax"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Wall-clock budget (seconds): once exceeded, timing falls back to a single
# post-compile repeat so the JSON line is always emitted within the harness
# budget (a killed bench records nothing, which is worse than fewer repeats).
BENCH_BUDGET_S = float(_os.environ.get("CTRL_ADAPTER_BENCH_BUDGET_S", "420"))
_BENCH_T0 = time.time()

from ctrl_adapter_tpu.utils.platform import respect_env_platforms

respect_env_platforms()  # explicit JAX_PLATFORMS (e.g. cpu smoke) wins over the proxy plugin

TORCH_A100_REFERENCE_FPS_ESTIMATE = 0.75  # documented estimate, see module docstring


def kernel_numerics_selfcheck(full: bool = False):
    """Assert the Pallas kernels agree with their XLA fallbacks ON THIS CHIP.

    Interpret-mode tests cannot catch Mosaic miscompiles/precision hazards: in
    round 1 the fused GroupNorm kernel's stat matmuls ran at default MXU
    precision (bf16 rounding of fp32 sums), corrupting every GroupNorm by ~3e-2
    and NaN-ing near-constant groups — invisible to the CPU suite. This check
    runs the real kernels on the real chip before any timing.

    Default: the GroupNorm case ONLY — it is the family that produced the real
    r1 miscompile, and it compiles in seconds. The fused-FF and fused-temporal
    cases each force a standalone Mosaic compile of a large kernel that the main
    benchmark program compiles anyway (measured 2026-08-19: the default 3-case
    check alone held the bench past the ~10-minute driver budget on a congested
    tunnel, twice). ``--full_selfcheck`` restores the whole sweep;
    ``CTRL_ADAPTER_SKIP_SELFCHECK=1`` skips entirely.
    """
    if _os.environ.get("CTRL_ADAPTER_SKIP_SELFCHECK") == "1":
        print("# kernel numerics self-check SKIPPED (env)", file=sys.stderr)
        return
    t_case = time.time()

    def tick(label):
        nonlocal t_case
        print(f"# selfcheck {label}: {time.time() - t_case:.1f}s", file=sys.stderr)
        t_case = time.time()

    from ctrl_adapter_tpu.ops.group_norm import _xla_group_norm_silu, group_norm_silu

    rng = np.random.default_rng(0)
    gn_cases = (((2, 64, 64, 320), 32), ((2, 8, 8, 1280), 32))
    for shape, groups in gn_cases if full else gn_cases[:1]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        scale = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
        bias = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32) * 0.02
        jax.block_until_ready(x)
        tick("gn device put")
        got = np.asarray(jax.jit(
            lambda a, s, b, g=groups: group_norm_silu(a, s, b, g, 1e-6, True)
        )(x, scale, bias))
        tick("gn kernel compile+run+readback")
        want = np.asarray(jax.jit(
            lambda a, s, b, g=groups: _xla_group_norm_silu(a, s, b, g, 1e-6, True)
        )(x, scale, bias))
        tick("gn fallback compile+run+readback")
        err = np.abs(got - want).max()
        assert np.isfinite(got).all() and err < 1e-4, (
            f"fused GroupNorm diverges from fallback on this chip: "
            f"shape={shape} maxdiff={err:.3e}")
        tick(f"group_norm {shape}")

    if not full:
        print("# kernel numerics self-check passed (GN; --full_selfcheck for all)",
              file=sys.stderr)
        return

    from ctrl_adapter_tpu.ops.fused_block import _xla_ln_ff_residual, ln_ff_residual

    ff_cases = ((1024, 320), (256, 1280))
    for (m, c) in ff_cases:
        inner = 4 * c
        mk = lambda *s: jnp.asarray(  # noqa: E731
            rng.standard_normal(s).astype(np.float32))
        x, lns, lnb = mk(m, c) * 0.5, mk(c), mk(c) * 0.1
        wg, bg = mk(c, 2 * inner) * 0.05, mk(2 * inner) * 0.1
        w2, b2 = mk(inner, c) * 0.05, mk(c) * 0.1
        # tanh-gelu mode: the only mode the kernel dispatches (Mosaic lacks erf)
        got = np.asarray(jax.jit(lambda *a: ln_ff_residual(
            *a, 1e-5, True, True, None, True))(x, lns, lnb, wg, bg, w2, b2))
        want = np.asarray(jax.jit(lambda *a: _xla_ln_ff_residual(
            *a, 1e-5, True, True, None))(x, lns, lnb, wg, bg, w2, b2))
        err = np.abs(got - want).max()
        rel = err / max(np.abs(want).max(), 1e-6)
        assert np.isfinite(got).all() and rel < 2e-2, (
            f"fused LN-FF diverges from fallback on this chip: "
            f"m={m} c={c} maxdiff={err:.3e} rel={rel:.3e}")
        tick(f"ln_ff ({m},{c})")
    from ctrl_adapter_tpu.ops import fused_temporal as ft

    # fused temporal block: full mode (width 320) + attention-only (hybrid)
    ft_cases = ((320, 320, ("ffin", "attn", "ff")),
                (512, 320, ("attn",)),
                (640, 640, ("attn",)))
    for c, ia, parts in ft_cases:
        b, f, s, nh, hd = 2, 14, 128, ia // 64, 64
        mk = lambda *sh: jnp.asarray(  # noqa: E731
            rng.standard_normal(sh).astype(np.float32) * 0.05, jnp.bfloat16)
        p = {"lnin_s": mk(c).astype(jnp.float32) + 1,
             "lnin_b": mk(c).astype(jnp.float32),
             "ffin_wg": mk(c, 8 * c), "ffin_bg": mk(8 * c),
             "ffin_w2": mk(4 * c, c), "ffin_b2": mk(c),
             "ln1_s": mk(c).astype(jnp.float32) + 1,
             "ln1_b": mk(c).astype(jnp.float32),
             "wq": mk(c, ia), "wk": mk(c, ia), "wv": mk(c, ia),
             "wo": mk(ia, c), "bo": mk(c),
             "ln3_s": mk(c).astype(jnp.float32) + 1,
             "ln3_b": mk(c).astype(jnp.float32),
             "ff_wg": mk(c, 8 * c), "ff_bg": mk(8 * c),
             "ff_w2": mk(4 * c, c), "ff_b2": mk(c)}
        x = mk(b, f, s, c) * 10
        cb = mk(b, s, c)
        cfg = (parts, True, True, nh, hd, 1e-5, True)
        got = np.asarray(jax.jit(
            lambda xx, cc: ft.temporal_block(xx, cc, p, cfg, True))(x, cb),
            np.float32)
        want = np.asarray(jax.jit(
            lambda xx, cc: ft.temporal_block(xx, cc, p, cfg, False))(x, cb),
            np.float32)
        err = np.abs(got - want).max()
        rel = err / max(np.abs(want).max(), 1e-6)
        assert np.isfinite(got).all() and rel < 2e-2, (
            f"fused temporal block diverges from fallback on this chip: "
            f"c={c} parts={parts} maxdiff={err:.3e} rel={rel:.3e}")
        tick(f"temporal_block c={c} {parts}")

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


def force(x) -> float:
    """Scalar host read to force full on-device execution. block_until_ready
    alone is NOT sufficient under this image's remote-TPU tunnel (buffers report
    ready at enqueue, yielding impossible ~0.03s "timings")."""
    return float(jnp.sum(x.astype(jnp.float32)))


def timed_runs(run, repeats, label):
    t0 = time.time()
    run(0)
    print(f"# {label}: first run (incl. compile) {time.time() - t0:.1f}s", file=sys.stderr)
    if time.time() - _BENCH_T0 > BENCH_BUDGET_S:
        # budget exceeded during compile: a single post-compile measurement still
        # records a valid steady-state number (no compile in it) — do that and emit.
        print(f"# {label}: over {BENCH_BUDGET_S:.0f}s budget, single-repeat fallback",
              file=sys.stderr)
        repeats = 1
    times = []
    for i in range(repeats):
        t0 = time.time()
        run(i + 1)
        times.append(time.time() - t0)
    return min(times)


# ----------------------------------------------------------------------- SVD
def bench_svd(args, sparse=False):
    from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
    from ctrl_adapter_tpu.models.controlnet import ControlNetModel
    from ctrl_adapter_tpu.models.unet_svd import UNetSpatioTemporalConditionModel
    from ctrl_adapter_tpu.models.vae import VAEConfig
    from ctrl_adapter_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder
    from ctrl_adapter_tpu.pipelines.svd import SVDControlNetAdapterPipeline

    dtype = jnp.bfloat16
    b, f = args.batch, args.frames
    lh, lw = args.height // 8, args.width // 8
    cls = min(64, lh)  # pooled control latent size (64 at 512^2)

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

    sample8 = jnp.ones((2 * b, f, lh, lw, 8), dtype)
    params = {
        "unet": fabricate(unet, sample8, jnp.ones((2 * b,)), jnp.ones((2 * b, 1, 1024), dtype),
                          jnp.ones((2 * b, 3), dtype)),
        "vae": fabricate(vae, jnp.ones((1, args.height, args.width, 3), dtype)),
    }
    sparse_frames = (0, 5, 10, 13) if sparse else None
    n_ctrl = 2 * b * f  # ControlNet always sees all CFG-doubled frames; sparsity
    # subselects AFTER the tower (reference `svd_...py:697-749`)
    cn_args = (jnp.ones((n_ctrl, cls, cls, 4), dtype), jnp.ones((n_ctrl,)),
               jnp.ones((n_ctrl, 77, 768), dtype),
               jnp.ones((n_ctrl, cls * 8, cls * 8, 3), dtype))
    params["controlnet"] = fabricate(cnet, *cn_args)
    downs_s, mid_s = jax.eval_shape(lambda: cnet.apply(params["controlnet"], *cn_args))
    params["adapter"] = fabricate(
        adapter, [jnp.zeros(s.shape, dtype) for s in downs_s], jnp.zeros(mid_s.shape, dtype),
        f, jnp.ones((n_ctrl,)), jnp.ones((1, 1, 1024), dtype))

    image_emb = jnp.ones((b, 1, 1024), dtype) * 0.1
    image_latent = jnp.ones((b, lh, lw, 4), dtype) * 0.1
    cn_prompt = jnp.ones((2 * b, 77, 768), dtype) * 0.02
    ctrl_images = jnp.ones((b * f, cls * 8, cls * 8, 3), dtype) * 0.5

    mesh = None
    if args.mesh:
        # multi-device generation: batch shards over the `data` axis. The flag
        # is exercised at scale by the CPU-mesh tests and the driver's
        # virtual-device dryrun; demanding more devices than exist is an error
        # (a silent clamp would record an N-device claim that ran on fewer).
        if args.mesh > jax.device_count():
            raise SystemExit(
                f"--mesh {args.mesh} but only {jax.device_count()} device(s)")
        from ctrl_adapter_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(args.mesh)
        print(f"# mesh: {mesh.shape} over {len(mesh.devices.flat)} device(s)",
              file=sys.stderr)

    def run(seed, output_type="np"):
        out = pipe.generate(
            params, jax.random.PRNGKey(seed), image_emb, image_latent, cn_prompt,
            ctrl_images, height=args.height, width=args.width, num_frames=f,
            num_inference_steps=args.steps, skip_conv_in=True,
            control_guidance_end=0.8, control_latent_size=cls,
            sparse_frames=sparse_frames, output_type=output_type, mesh=mesh,
        )
        force(out)
        return out

    if args.breakdown:
        lat = run(100, output_type="latent")
        t0 = time.time()
        run(101, output_type="latent")
        denoise_t = time.time() - t0
        t0 = time.time()
        force(pipe._decode(params["vae"], lat, 0.18215))
        decode_t = time.time() - t0
        print(f"# breakdown: denoise {denoise_t:.2f}s "
              f"({denoise_t / args.steps * 1000:.0f}ms/step), decode {decode_t:.2f}s",
              file=sys.stderr)

    tag = "sparse softedge" if sparse else "depth"
    best = timed_runs(run, args.repeats, f"svd {tag}")
    fps = (b * f) / best
    print(f"# steady-state: {best:.2f}s for {b}x{f} frames", file=sys.stderr)

    sustained_fps = None
    if args.sustained > 1:
        # serving throughput: enqueue N videos before blocking — jax's async
        # dispatch overlaps each video's host-side prep/readback with the
        # previous video's device work (the per-video `force` above measures
        # latency, which cannot hide that gap)
        def gen(seed):
            return pipe.generate(
                params, jax.random.PRNGKey(seed), image_emb, image_latent,
                cn_prompt, ctrl_images, height=args.height, width=args.width,
                num_frames=f, num_inference_steps=args.steps, skip_conv_in=True,
                control_guidance_end=0.8, control_latent_size=cls,
                sparse_frames=sparse_frames, mesh=mesh)
        t0 = time.time()
        outs = [gen(200 + i) for i in range(args.sustained)]
        for o in outs:
            jax.block_until_ready(o)
        dt = time.time() - t0
        sustained_fps = args.sustained * b * f / dt
        print(f"# sustained: {args.sustained} videos in {dt:.2f}s -> "
              f"{sustained_fps:.4f} f/s", file=sys.stderr)
    return {
        "metric": f"frames/sec/chip (SVD {tag}-controlled generation, "
                  + (f"batch {b}x" if b > 1 else "")
                  + f"{f}f {args.steps}steps {args.height}x{args.width}, CFG, latent-skip"
                  + (", sparse 0/5/10/13" if sparse else "")
                  + (f", {args.mesh}-device mesh" if mesh is not None else "") + ")",
        "value": round(fps, 4),
        **({"sustained_fps": round(sustained_fps, 4)} if sustained_fps else {}),
        "unit": "frames/sec",
        "vs_baseline": (round(fps / TORCH_A100_REFERENCE_FPS_ESTIMATE, 3)
                        if not sparse and b == 1 else None),
        # measured single-chip speed-of-light for this FLOP graph (v5e op-level
        # ceilings, arithmetic in docs/PERFORMANCE.md "Roofline"): 1.30-1.49 f/s;
        # the >=3x-A100-estimate target (2.25 f/s) exceeds the chip's bf16 peak
        # for this workload mix and is reachable only by batching or scale-out.
        "roofline_fps_single_chip": [1.30, 1.49],
    }


# ------------------------------------------------------------------ I2VGen-XL
def bench_i2vgenxl(args, multi=False):
    from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
    from ctrl_adapter_tpu.models.controlnet import ControlNetModel
    from ctrl_adapter_tpu.models.router import ControlNetRouter
    from ctrl_adapter_tpu.models.unet_i2vgen import I2VGenXLUNet
    from ctrl_adapter_tpu.models.vae import AutoencoderKL, VAEConfig
    from ctrl_adapter_tpu.pipelines.i2vgenxl import I2VGenXLControlNetAdapterPipeline

    dtype = jnp.bfloat16
    b, f = args.batch, args.frames
    lh, lw = args.height // 8, args.width // 8
    cls = min(64, lh)
    num_experts = 7 if multi else 1
    active = 2 if multi else 1  # reference multi demo: depth+canny of 7 loaded

    unet = I2VGenXLUNet(dtype=dtype)
    cnet = ControlNetModel(dtype=dtype)
    adapter = ControlNetAdapter(
        backbone_model_name="i2vgenxl", cross_attention_dim=1024, num_blocks=1,
        adapter_locations=("A", "B", "C", "D", "M"),
        add_temporal_resnet=True, add_temporal_transformer=True, dtype=dtype,
    )
    vae = AutoencoderKL(config=VAEConfig(), dtype=dtype)
    router = ControlNetRouter(num_experts=num_experts) if multi else None
    pipe = I2VGenXLControlNetAdapterPipeline(
        unet=unet, controlnet=cnet, adapter=adapter, vae=vae, router=router)

    params = {
        "unet": fabricate(unet, jnp.ones((2 * b, f, lh, lw, 4), dtype),
                          jnp.ones((2 * b,)), jnp.ones((2 * b,)),
                          jnp.ones((2 * b, f, lh, lw, 4), dtype),
                          jnp.ones((2 * b, 1, 1024), dtype),
                          jnp.ones((2 * b, 77, 1024), dtype)),
        "vae": fabricate(vae, jnp.ones((1, args.height, args.width, 3), dtype)),
    }
    cn_args = (jnp.ones((2 * b * f, cls, cls, 4), dtype), jnp.ones((2 * b * f,)),
               jnp.ones((2 * b * f, 77, 768), dtype),
               jnp.ones((2 * b * f, cls * 8, cls * 8, 3), dtype))
    for e in range(num_experts):
        params[f"controlnet_{e}"] = fabricate(cnet, *cn_args, seed=e)
    downs_s, mid_s = jax.eval_shape(lambda: cnet.apply(params["controlnet_0"], *cn_args))
    params["adapter"] = fabricate(
        adapter, [jnp.zeros(s.shape, dtype) for s in downs_s], jnp.zeros(mid_s.shape, dtype),
        f, jnp.ones((2 * b * f,)), jnp.ones((1, 1, 1024), dtype))
    if router is not None:
        params["router"] = router.init(jax.random.PRNGKey(0))

    prompt_embeds = jnp.ones((2 * b, 77, 1024), dtype) * 0.02
    cn_prompt = jnp.ones((2 * b, 77, 768), dtype) * 0.02
    image_emb = jnp.ones((b, 1, 1024), dtype) * 0.1
    ffl = jnp.ones((b, lh, lw, 4), dtype) * 0.1
    ctrl_images = jnp.ones((num_experts, b * f, cls * 8, cls * 8, 3), dtype) * 0.5
    masks = [1] * active + [0] * (num_experts - active) if multi else None

    def run(seed):
        video = pipe.generate(
            params, jax.random.PRNGKey(seed), prompt_embeds, cn_prompt, image_emb,
            ffl, ctrl_images, height=args.height, width=args.width, num_frames=f,
            num_inference_steps=args.steps, guidance_scale=9.0,
            control_guidance_end=1.0 if multi else 0.8,
            inference_expert_masks=masks, control_latent_size=cls,
        )
        force(video)
        return video

    tag = f"multi-condition {active}/{num_experts} experts" if multi else "depth"
    best = timed_runs(run, args.repeats, f"i2vgenxl {tag}")
    fps = (b * f) / best
    print(f"# steady-state: {best:.2f}s for {f} frames", file=sys.stderr)
    return {
        "metric": f"frames/sec/chip (I2VGen-XL {tag} generation, "
                  f"{f}f {args.steps}steps {args.height}x{args.width}, CFG)",
        "value": round(fps, 4),
        "unit": "frames/sec",
        "vs_baseline": None,
    }


# ----------------------------------------------------------------------- SDXL
def bench_sdxl(args):
    from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
    from ctrl_adapter_tpu.models.controlnet import ControlNetModel
    from ctrl_adapter_tpu.models.unet_2d import SDXL_CONFIG, UNet2DConditionModel
    from ctrl_adapter_tpu.models.vae import AutoencoderKL, VAEConfig
    from ctrl_adapter_tpu.pipelines.sdxl import SDXLControlNetAdapterPipeline

    dtype = jnp.bfloat16
    b = 1
    lh = args.height // 8
    cls = 64  # control path fixed at 64 latent / 512 image (`sdxl_...py:1305-1312`)

    unet = UNet2DConditionModel(config=SDXL_CONFIG, dtype=dtype)
    cnet = ControlNetModel(dtype=dtype)
    adapter = ControlNetAdapter(
        backbone_model_name="sdxl", cross_attention_dim=2048, num_blocks=1,
        adapter_locations=("A", "B", "C"),
        add_temporal_resnet=False, add_temporal_transformer=False, dtype=dtype,
    )
    vae = AutoencoderKL(config=VAEConfig(scaling_factor=0.13025), dtype=dtype)
    pipe = SDXLControlNetAdapterPipeline(unet=unet, controlnet=cnet, adapter=adapter, vae=vae)

    added = {"text_embeds": jnp.ones((2 * b, 1280), dtype),
             "time_ids": jnp.ones((2 * b, 6), dtype)}
    params = {
        "unet": fabricate(unet, jnp.ones((2 * b, lh, lh, 4), dtype), jnp.ones((2 * b,)),
                          jnp.ones((2 * b, 77, 2048), dtype), added),
        "vae": fabricate(vae, jnp.ones((1, args.height, args.width, 3), dtype)),
    }
    cn_args = (jnp.ones((2 * b, cls, cls, 4), dtype), jnp.ones((2 * b,)),
               jnp.ones((2 * b, 77, 768), dtype),
               jnp.ones((2 * b, cls * 8, cls * 8, 3), dtype))
    params["controlnet"] = fabricate(cnet, *cn_args)
    downs_s, _mid_s = jax.eval_shape(lambda: cnet.apply(params["controlnet"], *cn_args))
    params["adapter"] = fabricate(
        adapter, [jnp.zeros(s.shape, dtype) for s in downs_s], None,
        1, jnp.ones((2 * b,)), jnp.ones((2 * b, 77, 2048), dtype))

    prompt_embeds = jnp.ones((2 * b, 77, 2048), dtype) * 0.02
    pooled = jnp.ones((2 * b, 1280), dtype) * 0.02
    cn_prompt = jnp.ones((2 * b, 77, 768), dtype) * 0.02
    control_image = jnp.ones((b, cls * 8, cls * 8, 3), dtype) * 0.5

    def run(seed):
        image = pipe.generate(
            params, jax.random.PRNGKey(seed), prompt_embeds, pooled, cn_prompt,
            control_image, height=args.height, width=args.width,
            num_inference_steps=args.steps, guidance_scale=7.5,
            control_guidance_end=0.6, control_latent_size=cls,
        )
        force(image)
        return image

    best = timed_runs(run, args.repeats, "sdxl depth")
    ips = b / best
    print(f"# steady-state: {best:.2f}s per image", file=sys.stderr)
    return {
        "metric": f"images/sec/chip (SDXL depth-controlled generation, "
                  f"{args.steps}steps {args.height}x{args.width}, CFG)",
        "value": round(ips, 4),
        "unit": "images/sec",
        "vs_baseline": None,
    }


# ----------------------------------------------------------------- train step
def bench_train(args):
    """I2VGen-XL depth training-step throughput (the paper's '<10 GPU-hours'
    training story, reference `train.py:1018-1424`): full jitted step incl. VAE
    encode, frozen towers, adapter fwd/bwd, AdamW."""
    from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
    from ctrl_adapter_tpu.models.controlnet import ControlNetModel
    from ctrl_adapter_tpu.models.unet_i2vgen import I2VGenXLUNet
    from ctrl_adapter_tpu.models.vae import AutoencoderKL, VAEConfig
    from ctrl_adapter_tpu.train.trainer import CtrlAdapterTrainer, TrainConfig

    dtype = jnp.bfloat16
    b, f = args.batch, args.frames
    lh = args.height // 8
    cls = min(64, lh)

    cfg = TrainConfig(model_name="i2vgenxl", n_sample_frames=f,
                      control_latent_size=cls, max_vae_encode=2)
    unet = I2VGenXLUNet(dtype=dtype)
    cnet = ControlNetModel(dtype=dtype)
    adapter = ControlNetAdapter(
        backbone_model_name="i2vgenxl", cross_attention_dim=1024, num_blocks=1,
        adapter_locations=("A", "B", "C", "D", "M"),
        add_temporal_resnet=True, add_temporal_transformer=True, dtype=dtype,
    )
    vae = AutoencoderKL(config=VAEConfig(), dtype=dtype)
    trainer = CtrlAdapterTrainer(cfg, unet, cnet, adapter, vae)

    frozen = {
        "unet": fabricate(unet, jnp.ones((b, f, lh, lh, 4), dtype), jnp.ones((b,)),
                          jnp.ones((b,)), jnp.ones((b, f, lh, lh, 4), dtype),
                          jnp.ones((b, 1, 1024), dtype), jnp.ones((b, 77, 1024), dtype)),
        "vae": fabricate(vae, jnp.ones((1, args.height, args.width, 3), dtype)),
    }
    cn_args = (jnp.ones((b * f, cls, cls, 4), dtype), jnp.ones((b * f,)),
               jnp.ones((b * f, 77, 768), dtype),
               jnp.ones((b * f, cls * 8, cls * 8, 3), dtype))
    frozen["controlnet_0"] = fabricate(cnet, *cn_args)
    downs_s, mid_s = jax.eval_shape(lambda: cnet.apply(frozen["controlnet_0"], *cn_args))
    # trainable adapter params in fp32 (optimizer numerics)
    trainable = {"adapter": jax.tree.map(
        lambda x: x.astype(jnp.float32),
        fabricate(adapter, [jnp.zeros(s.shape, dtype) for s in downs_s],
                  jnp.zeros(mid_s.shape, dtype), f, jnp.ones((b * f,)),
                  jnp.ones((1, 1, 1024), dtype)))}
    opt_state = trainer.init_optimizer(trainable)

    rng = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(rng.uniform(-1, 1, (b, f, args.height, args.width, 3))
                              .astype(np.float32)).astype(dtype),
        "controlnet_cond": jnp.ones((1, b * f, cls * 8, cls * 8, 3), dtype) * 0.5,
        "controlnet_text_emb": jnp.ones((b, 77, 768), dtype) * 0.02,
        "prompt_embeds": jnp.ones((b, 77, 1024), dtype) * 0.02,
        "image_embeddings": jnp.ones((b, 1, 1024), dtype) * 0.1,
    }

    state = {"trainable": trainable, "opt": opt_state}

    def run(seed):
        new_t, new_o, metrics = trainer.train_step(
            state["trainable"], state["opt"], frozen, batch, None,
            jax.random.PRNGKey(seed))
        loss = float(metrics["loss"])
        state["trainable"], state["opt"] = new_t, new_o
        return loss

    best = timed_runs(run, args.repeats, "i2vgenxl train step")
    print(f"# steady-state: {best:.2f}s per step", file=sys.stderr)
    return {
        "metric": f"train steps/sec/chip (I2VGen-XL depth adapter training, "
                  f"batch {b}x{f}f {args.height}x{args.width}, AdamW)",
        "value": round(1.0 / best, 4),
        "videos_per_sec": round(b / best, 4),
        "unit": "steps/sec",
        "vs_baseline": None,
    }


CONFIGS = {
    "svd_depth": lambda a: bench_svd(a, sparse=False),
    "svd_softedge_sparse": lambda a: bench_svd(a, sparse=True),
    "i2vgenxl_depth": bench_i2vgenxl,
    "i2vgenxl_multi": lambda a: bench_i2vgenxl(a, multi=True),
    "sdxl_depth": bench_sdxl,
    "train_step": bench_train,
}

DEFAULTS = {  # (frames, steps, height)
    "svd_depth": (14, 25, 512),
    "svd_softedge_sparse": (14, 25, 512),
    "i2vgenxl_depth": (16, 50, 512),
    "i2vgenxl_multi": (16, 50, 512),
    "sdxl_depth": (1, 50, 1024),
    "train_step": (8, 0, 512),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=sorted(CONFIGS), default="svd_depth")
    ap.add_argument("--batch", type=int, default=1,
                    help="videos per batch (svd configs): the parity-legal "
                         "throughput route named by the roofline analysis")
    ap.add_argument("--sustained", type=int, default=0,
                    help="ALSO measure serving throughput: enqueue N videos "
                         "before blocking (svd configs)")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the svd video batch over an N-device data mesh "
                         "(0 = single device; batch must divide by N)")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--quick", action="store_true", help="tiny shapes (CI smoke)")
    ap.add_argument("--breakdown", action="store_true",
                    help="also time denoise-only vs VAE-decode (stderr; svd only)")
    ap.add_argument("--full_selfcheck", action="store_true",
                    help="run every kernel-numerics case (default: GroupNorm only; "
                         "the FF/temporal cases re-compile large Mosaic kernels "
                         "standalone and can cost many minutes on a congested tunnel)")
    args = ap.parse_args()

    df, ds, dh = DEFAULTS[args.config]
    args.frames = args.frames if args.frames is not None else df
    args.steps = args.steps if args.steps is not None else ds
    args.height = args.height if args.height is not None else dh
    args.width = args.width if args.width is not None else args.height
    if args.quick:
        args.frames, args.steps, args.height, args.width = 4, 5, 128, 128

    if jax.default_backend() == "tpu":
        kernel_numerics_selfcheck(full=args.full_selfcheck)

    print(json.dumps(CONFIGS[args.config](args)))


if __name__ == "__main__":
    main()
