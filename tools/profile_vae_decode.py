"""Knockout attribution of the SVD temporal-VAE decode (431 ms / 14 frames, r4).

The decoder runs at ~39 TFLOP/s effective vs the 130 TFLOP/s conv ceiling —
the worst ratio left in the headline pipeline (docs/PERFORMANCE.md). This tool
times the whole decode with one component class at a time stubbed out
(monkeypatched BEFORE param fabrication, so shapes stay consistent), the same
bisection method as the UNet knockouts. Numerics are garbage under a knockout;
only the timing delta matters.

Variants:
  baseline      full decode, chunk=14 (the production configuration)
  no_temporal   TemporalResnetBlock -> identity (keeps AlphaBlender)
  no_blender    AlphaBlender -> spatial input passthrough
  no_attn       VAEAttention (mid, single-head 512 @ 64^2) -> identity
  gn_identity   GroupNorm -> affine-only (no stats): bounds the GN cost
  fp32          whole decoder in fp32 (the goldens configuration)

Usage: python tools/profile_vae_decode.py [--repeats 3] [--only a,b]
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

F, HW = 14, 64


def fabricate(module, *args, seed=0, scale=0.02, dt=jnp.bfloat16, **kwargs):
    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda s: jnp.asarray(rng.standard_normal(s.shape).astype(np.float32) * scale)
        .astype(s.dtype if s.dtype != jnp.float32 else dt), shapes)


def time_decode(vae_cls, vae_cfg_cls, label, repeats, dt=jnp.bfloat16):
    vae = vae_cls(config=vae_cfg_cls(), dtype=dt)
    p = fabricate(vae, jnp.ones((1, HW * 8, HW * 8, 3), dt), dt=dt)
    lat = jnp.ones((F, HW, HW, 4), dt) * 0.1

    @jax.jit
    def dec(p, z):
        out = vae.apply(p, z, F, method="decode")
        return jnp.sum(out.astype(jnp.float32))

    t0 = time.time()
    float(dec(p, lat))
    print(f"#   {label}: compile+first {time.time() - t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(repeats):
        t0 = time.time()
        float(dec(p, lat))
        times.append(time.time() - t0)
    ms = min(times) * 1000
    print(f"{label}: {ms:.0f} ms / {F} frames")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    import ctrl_adapter_tpu.nn.resnet as rn
    import ctrl_adapter_tpu.nn.unet_st_blocks as stb
    import ctrl_adapter_tpu.models.vae as vae_mod
    from ctrl_adapter_tpu.models.vae import VAEConfig
    from ctrl_adapter_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder

    orig_temporal = stb.TemporalResnetBlock.__call__
    orig_blender = rn.AlphaBlender.__call__ if hasattr(rn, "AlphaBlender") else None
    if orig_blender is None:
        orig_blender = stb.AlphaBlender.__call__
        blender_holder = stb.AlphaBlender
    else:
        blender_holder = rn.AlphaBlender
    orig_attn = vae_mod.VAEAttention.__call__
    orig_gn = rn.GroupNorm.__call__

    def run(label):
        return time_decode(AutoencoderKLTemporalDecoder, VAEConfig, label,
                           args.repeats)

    if only is None or "baseline" in only:
        run("baseline(bf16,chunk=14)")

    if only is None or "no_temporal" in only:
        stb.TemporalResnetBlock.__call__ = lambda self, x, temb=None: x
        try:
            run("no_temporal_resnets")
        finally:
            stb.TemporalResnetBlock.__call__ = orig_temporal

    if only is None or "no_blender" in only:
        blender_holder.__call__ = (
            lambda self, spatial, temporal, image_only_indicator=None: spatial)
        try:
            run("no_alpha_blender")
        finally:
            blender_holder.__call__ = orig_blender

    if only is None or "no_attn" in only:
        vae_mod.VAEAttention.__call__ = lambda self, x: x
        try:
            run("no_mid_attention")
        finally:
            vae_mod.VAEAttention.__call__ = orig_attn

    if only is None or "gn_identity" in only:
        def gn_affine_only(self, x, silu=False):
            y = x.astype(jnp.float32)
            scale = self.param("scale", jax.nn.initializers.ones, (x.shape[-1],),
                               self.param_dtype)
            bias = self.param("bias", jax.nn.initializers.zeros, (x.shape[-1],),
                              self.param_dtype)
            y = y * scale + bias
            if silu:
                y = jax.nn.silu(y)
            return y.astype(x.dtype)
        # raw assignment bypasses flax's wrap_method_once/@compact machinery and
        # self.param then raises; re-wrap like flax's metaclass does
        import flax.linen as fnn
        from flax.linen.module import wrap_method_once

        rn.GroupNorm.__call__ = wrap_method_once(fnn.compact(gn_affine_only))
        try:
            run("gn_affine_only(no stats)")
        finally:
            rn.GroupNorm.__call__ = orig_gn

    if only is None or "fp32" in only:
        time_decode(AutoencoderKLTemporalDecoder, VAEConfig,
                    "baseline(fp32,chunk=14)", args.repeats, dt=jnp.float32)


if __name__ == "__main__":
    main()
