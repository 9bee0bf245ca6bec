"""Per-component timing + FLOP counts for the I2VGen-XL and SDXL configs.

The r2–r4 optimization program (docs/PERFORMANCE.md) was SVD-only; this tool
applies the same L-scan + scalar-checksum methodology (see "Measurement
pitfalls") to the other two benchmark configs so their numbers get the same
roofline treatment:

- i2vgenxl: 16f 512² CFG (2x16 frames), 64² latents, 50 DDIM steps, depth
- sdxl:     1024² CFG (batch 2), 128² latents, 50 steps, depth

FLOPs come from XLA's own cost analysis of each compiled component, so the
TFLOP/s column is consistent with how the SVD numbers were derived.

Usage: python tools/profile_pipeline_steps.py --model i2vgenxl [--only unet,...]
"""

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "CTRL_ADAPTER_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".cache", "jax"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DT = jnp.bfloat16


def fabricate(module, *args, seed=0, scale=0.02, **kwargs):
    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda s: jnp.asarray(rng.standard_normal(s.shape).astype(np.float32) * scale)
        .astype(s.dtype if s.dtype != jnp.float32 else DT), shapes)


def component_flops(fn, params, x):
    """XLA's flop estimate for one application of fn (single call, no scan)."""
    try:
        compiled = jax.jit(lambda p, x0: fn(p, x0)).lower(params, x).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception as e:  # noqa: BLE001
        print(f"#   cost_analysis failed: {e}", file=sys.stderr)
        return float("nan")


def scan_time(fn, params, x, loops, repeats, label, flops=None):
    @jax.jit
    def prog(p, x0):
        def body(carry, _):
            out = fn(p, carry)
            red = (sum(jnp.mean(o.astype(jnp.float32)) for o in out)
                   if isinstance(out, (tuple, list)) else jnp.mean(out.astype(jnp.float32)))
            return carry + 1e-6 * red, ()
        c, _ = jax.lax.scan(body, x0, None, length=loops)
        return jnp.sum(c.astype(jnp.float32))

    t0 = time.time()
    float(prog(params, x))
    print(f"#   {label}: compile+first {time.time() - t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(repeats):
        t0 = time.time()
        float(prog(params, x))
        times.append(time.time() - t0)
    ms = min(times) / loops * 1000
    line = f"{label}: {ms:.1f} ms"
    if flops and np.isfinite(flops):
        line += f", {flops / 1e12:.2f} TFLOP -> {flops / 1e9 / ms:.0f} TFLOP/s"
    print(line)
    return ms


def profile_i2vgenxl(args, only):
    from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
    from ctrl_adapter_tpu.models.controlnet import ControlNetModel
    from ctrl_adapter_tpu.models.unet_i2vgen import I2VGenXLUNet
    from ctrl_adapter_tpu.ops.resize import adaptive_avg_pool2d

    B, F, HW = 1, 16, 64
    n, nc = 2 * B, 2 * B * F
    unet = I2VGenXLUNet(dtype=DT)
    cnet = ControlNetModel(dtype=DT)
    adapter = ControlNetAdapter(
        backbone_model_name="i2vgenxl", cross_attention_dim=1024, num_blocks=1,
        adapter_locations=("A", "B", "C", "D", "M"),
        add_temporal_resnet=True, add_temporal_transformer=True, dtype=DT)

    sample = jnp.ones((n, F, HW, HW, 4), DT)
    il = jnp.ones((n, F, HW, HW, 4), DT)
    image_emb = jnp.ones((n, 1, 1024), DT) * 0.1
    prompt = jnp.ones((n, 77, 1024), DT) * 0.1
    p_unet = fabricate(unet, sample, jnp.ones((n,)), jnp.ones((n,)), il,
                       image_emb, prompt)

    cn_args = (jnp.ones((nc, HW, HW, 4), DT), jnp.ones((nc,)),
               jnp.ones((nc, 77, 768), DT), jnp.ones((nc, HW * 8, HW * 8, 3), DT))
    p_cnet = fabricate(cnet, *cn_args)
    downs_s, mid_s = jax.eval_shape(lambda: cnet.apply(p_cnet, *cn_args))
    p_adapter = fabricate(
        adapter, [jnp.zeros(s.shape, DT) for s in downs_s], jnp.zeros(mid_s.shape, DT),
        F, jnp.ones((nc,)), jnp.ones((1, 1, 1024), DT))

    if only is None or "unet" in only:
        fn = lambda p, x: unet.apply(  # noqa: E731
            p, sample + x.astype(DT), jnp.full((n,), 500.0) + x, jnp.full((n,), 16.0),
            il, image_emb, prompt)
        scan_time(fn, p_unet, jnp.asarray(0.0), args.loops, args.repeats,
                  "i2v_unet_fwd", component_flops(fn, p_unet, jnp.asarray(0.0)))

    if only is None or "cnet" in only:
        fn = lambda p, x: cnet.apply(  # noqa: E731
            p, cn_args[0] + x.astype(DT), cn_args[1] + x, cn_args[2], cn_args[3])[1]
        scan_time(fn, p_cnet, jnp.asarray(0.0), args.loops, args.repeats,
                  "i2v_controlnet(full)", component_flops(fn, p_cnet, jnp.asarray(0.0)))

    if only is None or "adapter" in only:
        def fn(p, x):
            downs = [jnp.full(s.shape, 0.1, DT) + x.astype(DT) for s in downs_s]
            mid = jnp.full(mid_s.shape, 0.1, DT) + x.astype(DT)
            a_downs, a_mid = adapter.apply(
                p, downs, mid, num_frames=F, timestep=jnp.full((nc,), 500.0) + x,
                encoder_hidden_states=jnp.ones((1, 1, 1024), DT))
            return sum(jnp.mean(d.astype(jnp.float32)) for d in a_downs) + \
                jnp.mean(a_mid.astype(jnp.float32))
        scan_time(fn, p_adapter, jnp.asarray(0.0), args.loops, args.repeats,
                  "i2v_adapter(13 blocks)",
                  component_flops(fn, p_adapter, jnp.asarray(0.0)))

    if only is None or "step" in only:
        params = {"unet": p_unet, "cnet": p_cnet, "adapter": p_adapter}

        def controlled_step(p, x):
            lat = jnp.full((B, F, HW, HW, 4), 0.2, jnp.float32) + x
            lmi = jnp.concatenate([lat, lat], axis=0).astype(DT)
            flat = lmi.reshape(nc, HW, HW, 4)
            pooled = adaptive_avg_pool2d(flat, (HW, HW))
            tvar = jnp.full((nc,), 500.0) + x * 1e-6
            downs, mid = cnet.apply(p["cnet"], pooled, tvar,
                                    jnp.ones((nc, 77, 768), DT),
                                    jnp.ones((nc, HW * 8, HW * 8, 3), DT))
            a_downs, a_mid = adapter.apply(
                p["adapter"], list(downs), mid, num_frames=F, timestep=tvar,
                encoder_hidden_states=jnp.ones((1, 1, 1024), DT))
            return unet.apply(p["unet"], lmi, jnp.full((n,), 500.0) + x * 1e-6,
                              jnp.full((n,), 16.0), il, image_emb, prompt,
                              down_block_additional_residuals=a_downs,
                              mid_block_additional_residual=a_mid)
        scan_time(controlled_step, params, jnp.asarray(0.0), args.loops,
                  args.repeats, "i2v_controlled_step",
                  component_flops(controlled_step, params, jnp.asarray(0.0)))


def profile_sdxl(args, only):
    from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
    from ctrl_adapter_tpu.models.controlnet import ControlNetModel
    from ctrl_adapter_tpu.models.unet_2d import SDXL_CONFIG, UNet2DConditionModel
    from ctrl_adapter_tpu.ops.resize import adaptive_avg_pool2d

    B, HW, S = 1, 128, 64  # 1024² latents; ControlNet pooled to 64²
    n = 2 * B
    unet = UNet2DConditionModel(config=SDXL_CONFIG, dtype=DT)
    cnet = ControlNetModel(dtype=DT)
    adapter = ControlNetAdapter(
        backbone_model_name="sdxl", cross_attention_dim=2048, num_blocks=1,
        adapter_locations=("A", "B", "C", "D"), dtype=DT)

    sample = jnp.ones((n, HW, HW, 4), DT)
    prompt = jnp.ones((n, 77, 2048), DT) * 0.1
    added = {"text_embeds": jnp.ones((n, 1280), DT) * 0.1,
             "time_ids": jnp.ones((n, 6), DT)}
    p_unet = fabricate(unet, sample, jnp.ones((n,)), prompt, added)

    cn_args = (jnp.ones((n, S, S, 4), DT), jnp.ones((n,)),
               jnp.ones((n, 77, 768), DT), jnp.ones((n, S * 8, S * 8, 3), DT))
    p_cnet = fabricate(cnet, *cn_args)
    downs_s, mid_s = jax.eval_shape(lambda: cnet.apply(p_cnet, *cn_args))
    p_adapter = fabricate(
        adapter, [jnp.zeros(s.shape, DT) for s in downs_s], None,
        1, jnp.ones((n,)), jnp.ones((1, 77, 2048), DT))

    if only is None or "unet" in only:
        fn = lambda p, x: unet.apply(  # noqa: E731
            p, sample + x.astype(DT), jnp.full((n,), 500.0) + x, prompt, added)
        scan_time(fn, p_unet, jnp.asarray(0.0), args.loops, args.repeats,
                  "sdxl_unet_fwd", component_flops(fn, p_unet, jnp.asarray(0.0)))

    if only is None or "cnet" in only:
        fn = lambda p, x: cnet.apply(  # noqa: E731
            p, cn_args[0] + x.astype(DT), cn_args[1] + x, cn_args[2], cn_args[3])[1]
        scan_time(fn, p_cnet, jnp.asarray(0.0), args.loops, args.repeats,
                  "sdxl_controlnet(full, 64²)",
                  component_flops(fn, p_cnet, jnp.asarray(0.0)))

    if only is None or "adapter" in only:
        def fn(p, x):
            downs = [jnp.full(s.shape, 0.1, DT) + x.astype(DT) for s in downs_s]
            a_downs, _ = adapter.apply(
                p, downs, None, num_frames=1, timestep=jnp.full((n,), 500.0) + x,
                encoder_hidden_states=jnp.ones((1, 77, 2048), DT))
            return sum(jnp.mean(d.astype(jnp.float32)) for d in a_downs)
        scan_time(fn, p_adapter, jnp.asarray(0.0), args.loops, args.repeats,
                  "sdxl_adapter(12 blocks, x2 upsample)",
                  component_flops(fn, p_adapter, jnp.asarray(0.0)))

    if only is None or "step" in only:
        params = {"unet": p_unet, "cnet": p_cnet, "adapter": p_adapter}

        def controlled_step(p, x):
            lat = jnp.full((B, HW, HW, 4), 0.2, jnp.float32) + x
            lmi = jnp.concatenate([lat, lat], axis=0).astype(DT)
            pooled = adaptive_avg_pool2d(lmi, (S, S))
            tvar = jnp.full((n,), 500.0) + x * 1e-6
            downs, _ = cnet.apply(p["cnet"], pooled, tvar,
                                  jnp.ones((n, 77, 768), DT),
                                  jnp.ones((n, S * 8, S * 8, 3), DT))
            a_downs, _ = adapter.apply(
                p["adapter"], list(downs), None, num_frames=1, timestep=tvar,
                encoder_hidden_states=jnp.ones((1, 77, 2048), DT))
            return unet.apply(p["unet"], lmi, tvar, prompt, added,
                              down_block_additional_residuals=a_downs,
                              mid_block_additional_residual=jnp.zeros((), DT))
        scan_time(controlled_step, params, jnp.asarray(0.0), args.loops,
                  args.repeats, "sdxl_controlled_step",
                  component_flops(controlled_step, params, jnp.asarray(0.0)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["i2vgenxl", "sdxl"], default="i2vgenxl")
    ap.add_argument("--loops", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--only", type=str, default=None,
                    help="comma list: unet,cnet,adapter,step")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    if args.model == "i2vgenxl":
        profile_i2vgenxl(args, only)
    else:
        profile_sdxl(args, only)


if __name__ == "__main__":
    main()
