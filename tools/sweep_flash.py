"""Flash-attention block-size / layout sweep at the real UNet shapes (v5e).

Times, with the L-scan + checksum methodology (docs/PERFORMANCE.md):
- the stock Pallas kernel at several BlockSizes, including the single-step
  path (block_k == kv_seq: no running-max/rescale VPU work per k block);
- the same including the (B,T,N,H)->(B,N,T,H) head-split transposes that the
  attention modules pay around the kernel call;
- XLA's fused path for reference.

Shapes: UNet spatial self-attention at 512^2 video — (b=28, heads, 4096, 64)
for widths 320/640/1280 -> heads 5/10/20 at decreasing seq.

Usage: python tools/sweep_flash.py [--loops 20] [--repeats 3]
"""

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, args, loops, repeats, label):
    @jax.jit
    def prog(*xs):
        def body(c, _):
            # every input must depend on the carry (nonzero factor — XLA folds
            # `c * 0` to 0 and hoists the body as loop-invariant; see
            # tools/profile_svd_step.py "387 ms vs real 594 ms")
            out = fn(*[x + (c * 1e-6).astype(x.dtype) for x in xs])
            return c + 1e-6 * jnp.mean(out.astype(jnp.float32)), ()
        c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), None,
                            length=loops)
        return c

    try:
        t0 = time.time()
        float(prog(*args))
        compile_s = time.time() - t0
    except Exception as e:  # noqa: BLE001 — VMEM OOM configs report and move on
        print(f"{label}: FAILED ({type(e).__name__}: {str(e)[:120]})")
        return None
    times = []
    for _ in range(repeats):
        t0 = time.time()
        float(prog(*args))
        times.append(time.time() - t0)
    ms = min(times) / loops * 1000
    print(f"{label}: {ms:.2f} ms  (compile {compile_s:.0f}s)")
    return ms


def make_flash(bq, bkv, layout_btnh):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    sizes = BlockSizes(
        block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkv,
        block_k_dkv=bkv, block_q_dkv=bq,
        block_k_major_dq=bkv, block_k_dq=bkv, block_q_dq=bq,
    )

    def fn(q, k, v):
        if layout_btnh:  # inputs (B,T,N,H): pay the module's real transposes
            q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
        out = flash_attention(q, k, v, causal=False,
                              sm_scale=q.shape[-1] ** -0.5, block_sizes=sizes)
        if layout_btnh:
            out = out.transpose(0, 2, 1, 3)
        return out

    return fn


def xla_attn(q, k, v):  # (B,T,N,H)
    return jax.nn.dot_product_attention(q, k, v)


def pad_head_flash(bq, bkv, hd_pad):
    """Flash with head_dim zero-padded to an MXU-friendly size (for the SD
    ControlNet's 8-head dims 40/80): QK^T is unchanged by zero-padding K's
    head axis, and V's padded columns produce zeros that are sliced off."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    sizes = BlockSizes(
        block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkv,
        block_k_dkv=bkv, block_q_dkv=bq,
        block_k_major_dq=bkv, block_k_dq=bkv, block_q_dq=bq,
    )

    def fn(q, k, v):  # (B,T,N,H)
        h = q.shape[-1]
        pad = [(0, 0)] * 3 + [(0, hd_pad - h)]
        qp, kp, vp = (jnp.pad(x, pad).transpose(0, 2, 1, 3) for x in (q, k, v))
        out = flash_attention(qp, kp, vp, causal=False,
                              sm_scale=h ** -0.5, block_sizes=sizes)
        return out.transpose(0, 2, 1, 3)[..., :h]

    return fn


def module_current(q_in, wq, wk, wv, wo, n, h, bq, bkv):
    """Projections + flash + out-proj exactly as nn/attention.py does today:
    reshape to (B,T,N,H), transpose to kernel layout and back."""
    fl = make_flash(bq, bkv, True)
    b, t, c = q_in.shape
    q = (q_in @ wq).reshape(b, t, n, h)
    k = (q_in @ wk).reshape(b, t, n, h)
    v = (q_in @ wv).reshape(b, t, n, h)
    out = fl(q, k, v).reshape(b, t, n * h)
    return out @ wo


def module_einsum(q_in, wq, wk, wv, wo, n, h, bq, bkv):
    """Same math with the head split/merge folded into the projection einsums
    so XLA can emit the kernel layout directly (no standalone transposes)."""
    fl = make_flash(bq, bkv, False)
    wq4 = wq.reshape(-1, n, h)
    wk4 = wk.reshape(-1, n, h)
    wv4 = wv.reshape(-1, n, h)
    q = jnp.einsum("btc,cnh->bnth", q_in, wq4)
    k = jnp.einsum("btc,cnh->bnth", q_in, wk4)
    v = jnp.einsum("btc,cnh->bnth", q_in, wv4)
    out = fl(q, k, v)
    return jnp.einsum("bnth,nhd->btd", out, wo.reshape(n, h, -1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--shapes", type=str, default="28,5,4096,64")
    ap.add_argument("--pad_head", action="store_true",
                    help="sweep the ControlNet head_dim-40/80 padded-flash "
                         "case instead of the block sweep")
    ap.add_argument("--module", action="store_true",
                    help="sweep whole proj+attn+out modules (layout study)")
    args = ap.parse_args()

    if args.pad_head:
        rng = np.random.default_rng(0)
        for b, n, t, h, hp in ((28, 8, 4096, 40, 64), (28, 8, 1024, 80, 128)):
            print(f"== cnet shape (b={b}, heads={n}, seq={t}, hd={h})")
            q = jnp.asarray(rng.standard_normal((b, t, n, h)), jnp.bfloat16)
            k = jnp.asarray(rng.standard_normal((b, t, n, h)), jnp.bfloat16)
            v = jnp.asarray(rng.standard_normal((b, t, n, h)), jnp.bfloat16)
            timeit(xla_attn, (q, k, v), args.loops, args.repeats,
                   "xla (B,T,N,H)")
            for bq, bkv in ((2048, 1024), (1024, 1024), (512, t)):
                if t % bq or t % bkv:
                    continue
                timeit(pad_head_flash(bq, bkv, hp), (q, k, v), args.loops,
                       args.repeats, f"flash pad{h}->{hp} bq{bq}/bk{bkv}")
        return

    if args.module:
        rng = np.random.default_rng(0)
        b, n, t, h = (int(x) for x in args.shapes.split(";")[0].split(","))
        c = n * h
        x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.bfloat16)
        ws = [jnp.asarray(rng.standard_normal((c, c)) * 0.02, jnp.bfloat16)
              for _ in range(4)]
        for bq, bkv in ((2048, 1024), (1024, t)):
            if t % bq or t % bkv:
                continue
            timeit(functools.partial(module_current, n=n, h=h, bq=bq, bkv=bkv),
                   (x, *ws), args.loops, args.repeats,
                   f"module reshape+transpose bq{bq}/bk{bkv}")
            timeit(functools.partial(module_einsum, n=n, h=h, bq=bq, bkv=bkv),
                   (x, *ws), args.loops, args.repeats,
                   f"module einsum-layout     bq{bq}/bk{bkv}")
        return

    rng = np.random.default_rng(0)
    for shape_s in args.shapes.split(";"):
        b, n, t, h = (int(x) for x in shape_s.split(","))
        print(f"== shape (b={b}, heads={n}, seq={t}, hd={h})")
        q_bnth = jnp.asarray(rng.standard_normal((b, n, t, h)), jnp.bfloat16)
        k_bnth = jnp.asarray(rng.standard_normal((b, n, t, h)), jnp.bfloat16)
        v_bnth = jnp.asarray(rng.standard_normal((b, n, t, h)), jnp.bfloat16)
        q_btnh = q_bnth.transpose(0, 2, 1, 3)
        k_btnh = k_bnth.transpose(0, 2, 1, 3)
        v_btnh = v_bnth.transpose(0, 2, 1, 3)

        timeit(xla_attn, (q_btnh, k_btnh, v_btnh), args.loops, args.repeats,
               "xla (B,T,N,H)")
        for bq, bkv in ((2048, 1024), (1024, 1024), (512, t), (1024, t),
                        (2048, t), (256, t)):
            if t % bq or t % bkv:
                continue
            tag = " single-step" if bkv == t else ""
            timeit(make_flash(bq, bkv, False), (q_bnth, k_bnth, v_bnth),
                   args.loops, args.repeats,
                   f"flash bq{bq}/bk{bkv}{tag} (B,N,T,H kernel-native)")
            timeit(make_flash(bq, bkv, True), (q_btnh, k_btnh, v_btnh),
                   args.loops, args.repeats,
                   f"flash bq{bq}/bk{bkv}{tag} (+4 transposes from B,T,N,H)")


if __name__ == "__main__":
    main()
