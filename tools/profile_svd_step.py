"""Fresh per-component timing of the SVD headline config on the real chip.

Times, with the L-scan + scalar-checksum methodology (docs/PERFORMANCE.md
"Measurement pitfalls"): the SVD UNet forward, the SD-v1.5 ControlNet
(latent-skip), the 13-block adapter forward, the full controlled denoise step
body, and the temporal-decoder VAE decode at several chunk sizes. Used to keep
docs/PERFORMANCE.md's breakdown current (r4).

Usage: python tools/profile_svd_step.py [--loops 8] [--repeats 2] [--only X,Y]
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
B, F, HW = 1, 14, 64  # CFG doubles to 2*B


def fabricate(module, *args, seed=0, scale=0.02, **kwargs):
    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda s: jnp.asarray(rng.standard_normal(s.shape).astype(np.float32) * scale)
        .astype(s.dtype if s.dtype != jnp.float32 else DT), shapes)


def scan_time(fn, params, x, loops, repeats, label):
    """min over repeats of (time of L-loop scan) / L, with checksum readback."""

    @jax.jit
    def prog(p, x0):
        def body(carry, _):
            out = fn(p, carry)
            # feed a hash of the output back into the carry so iterations chain
            return carry + 1e-6 * jnp.mean(out.astype(jnp.float32)), ()
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
    print(f"{label}: {ms:.1f} ms")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--only", type=str, default=None,
                    help="comma list: unet,cnet,adapter,step,decode")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
    from ctrl_adapter_tpu.models.controlnet import ControlNetModel
    from ctrl_adapter_tpu.models.unet_svd import UNetSpatioTemporalConditionModel
    from ctrl_adapter_tpu.models.vae import VAEConfig
    from ctrl_adapter_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder
    from ctrl_adapter_tpu.ops.resize import adaptive_avg_pool2d

    unet = UNetSpatioTemporalConditionModel(dtype=DT)
    cnet = ControlNetModel(dtype=DT)
    adapter = ControlNetAdapter(
        backbone_model_name="svd", cross_attention_dim=1024, num_blocks=1,
        adapter_locations=("A", "B", "C", "D", "M"),
        add_temporal_resnet=True, add_temporal_transformer=True, dtype=DT)
    vae = AutoencoderKLTemporalDecoder(config=VAEConfig(), dtype=DT)

    n = 2 * B
    sample8 = jnp.ones((n, F, HW, HW, 8), DT)
    image_emb = jnp.ones((n, 1, 1024), DT) * 0.1
    tids = jnp.ones((n, 3), DT)
    p_unet = fabricate(unet, sample8, jnp.ones((n,)), image_emb, tids)

    nc = n * F
    cn_args = (jnp.ones((nc, HW, HW, 4), DT), jnp.ones((nc,)),
               jnp.ones((nc, 77, 768), DT), jnp.ones((nc, HW * 8, HW * 8, 3), DT))
    p_cnet = fabricate(cnet, *cn_args)
    downs_s, mid_s = jax.eval_shape(lambda: cnet.apply(p_cnet, *cn_args))
    p_adapter = fabricate(
        adapter, [jnp.zeros(s.shape, DT) for s in downs_s], jnp.zeros(mid_s.shape, DT),
        F, jnp.ones((nc,)), jnp.ones((1, 1, 1024), DT))

    if only is None or "unet" in only:
        scan_time(
            lambda p, x: unet.apply(p, x * sample8 + sample8, jnp.full((n,), -1.0),
                                    image_emb, tids),
            p_unet, jnp.asarray(0.0), args.loops, args.repeats, "unet_fwd")

    if only is None or "cnet" in only:
        scan_time(
            lambda p, x: cnet.apply(p, cn_args[0] * 0, cn_args[1] + x, cn_args[2],
                                    cn_args[3], skip_conv_in=True)[1],
            p_cnet, jnp.asarray(0.0), args.loops, args.repeats,
            "controlnet(skip_conv_in)")

    if only is None or "adapter" in only:
        def adapter_fwd(p, x):
            downs = [jnp.full(s.shape, 0.1, DT) + x.astype(DT) for s in downs_s]
            mid = jnp.full(mid_s.shape, 0.1, DT) + x.astype(DT)
            a_downs, a_mid = adapter.apply(
                p, downs, mid, num_frames=F, timestep=jnp.full((nc,), 500.0) + x,
                encoder_hidden_states=jnp.ones((1, 1, 1024), DT))
            return sum(jnp.mean(d.astype(jnp.float32)) for d in a_downs) + \
                jnp.mean(a_mid.astype(jnp.float32))
        scan_time(adapter_fwd, p_adapter, jnp.asarray(0.0), args.loops, args.repeats,
                  "adapter_fwd(13 blocks)")

    if only is None or "step" in only:
        params = {"unet": p_unet, "cnet": p_cnet, "adapter": p_adapter}

        def controlled_step(p, x):
            lat = jnp.full((B, F, HW, HW, 4), 0.2, jnp.float32) + x
            lmi = jnp.concatenate([lat, lat], axis=0).astype(DT)
            flat = lmi.reshape(nc, HW, HW, 4)
            pooled = adaptive_avg_pool2d(flat, (HW, HW))
            # every tower input must depend on the scan carry x, or XLA hoists
            # the whole cnet+adapter out of the timing loop as loop-invariant
            # (observed: "composite" 387 ms vs real 594 ms)
            tvar = jnp.full((nc,), 500.0) + x * 1e-6
            downs, mid = cnet.apply(p["cnet"], pooled * 0, tvar,
                                    jnp.ones((nc, 77, 768), DT),
                                    jnp.ones((nc, HW * 8, HW * 8, 3), DT),
                                    skip_conv_in=True)
            a_downs, a_mid = adapter.apply(
                p["adapter"], list(downs), mid, num_frames=F,
                timestep=tvar,
                encoder_hidden_states=jnp.ones((1, 1, 1024), DT))
            unet_in = jnp.concatenate([lmi, sample8[..., :4]], axis=-1)
            out = unet.apply(p["unet"], unet_in, jnp.full((n,), -1.0), image_emb,
                             tids, down_block_additional_residuals=a_downs,
                             mid_block_additional_residual=a_mid)
            return out
        scan_time(controlled_step, params, jnp.asarray(0.0), args.loops,
                  args.repeats, "controlled_step(cnet+adapter+unet)")

    if only is None or "decode" in only:
        p_vae = fabricate(vae, jnp.ones((1, HW * 8, HW * 8, 3), DT))
        lat = jnp.ones((F, HW, HW, 4), DT) * 0.1

        for chunk in (2, 7, 14):
            @jax.jit
            def dec(p, z, chunk=chunk):
                zs = z.reshape(-1, chunk, HW, HW, 4)
                out = jax.lax.map(
                    lambda c: vae.apply(p, c, chunk, method="decode"), zs)
                return jnp.sum(out.astype(jnp.float32))

            t0 = time.time()
            float(dec(p_vae, lat))
            print(f"#   decode chunk={chunk}: compile+first {time.time() - t0:.1f}s",
                  file=sys.stderr)
            times = []
            for _ in range(args.repeats):
                t0 = time.time()
                float(dec(p_vae, lat))
                times.append(time.time() - t0)
            print(f"vae_decode(chunk={chunk}): {min(times) * 1000:.0f} ms "
                  f"for {F} frames")


if __name__ == "__main__":
    main()
