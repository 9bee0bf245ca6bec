"""Knockout profiling of the SVD Ctrl-Adapter forward on the real chip.

Times the full 13-block adapter forward (bench configuration: batch 2x14
frames, SD-v1.5 ControlNet feature shapes) and component-knockout variants to
attribute the milliseconds. Each measurement scans the forward L times inside
one jitted program and reads back a scalar checksum (the only reliable timing
on the remote-TPU tunnel; see docs/PERFORMANCE.md).

Usage: python tools/profile_adapter.py [--loops 20]
"""

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from ctrl_adapter_tpu.models.adapter import ControlNetAdapter  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ctrl_adapter_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DT = jnp.bfloat16
B, F = 2, 14  # CFG batch x frames
BF = B * F

# SD-v1.5 ControlNet residual shapes at 64^2 latents
DOWN_SHAPES = [
    (BF, 64, 64, 320), (BF, 64, 64, 320), (BF, 64, 64, 320),
    (BF, 32, 32, 320), (BF, 32, 32, 640), (BF, 32, 32, 640),
    (BF, 16, 16, 640), (BF, 16, 16, 1280), (BF, 16, 16, 1280),
    (BF, 8, 8, 1280), (BF, 8, 8, 1280), (BF, 8, 8, 1280),
]
MID_SHAPE = (BF, 8, 8, 1280)


def fabricate(module, *args, **kwargs):
    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))
    rng = np.random.default_rng(0)

    def fill(s):
        return jnp.asarray(rng.standard_normal(s.shape).astype(np.float32) * 0.02).astype(DT)

    return jax.tree.map(fill, shapes)


def measure(adapter, label, loops):
    downs = [jnp.asarray(np.random.default_rng(1).standard_normal(s), DT) * 0.1
             for s in DOWN_SHAPES]
    mid = jnp.asarray(np.random.default_rng(2).standard_normal(MID_SHAPE), DT) * 0.1
    ts = jnp.ones((BF,))
    ehs = jnp.ones((1, 1, 1024), DT) * 0.1
    params = fabricate(adapter, downs, mid, F, ts, ehs)

    @jax.jit
    def run(p, d, m):
        def body(carry, _):
            outs, om = adapter.apply(p, [x + carry for x in d], m + carry, F, ts, ehs)
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            s = s + jnp.sum(om.astype(jnp.float32))
            return (s * 1e-12).astype(DT), s

        return jax.lax.scan(body, jnp.zeros((), DT), None, length=loops)[1]

    out = run(params, downs, mid)
    float(jnp.sum(out))  # compile+exec
    t0 = time.time()
    out = run(params, downs, mid)
    float(jnp.sum(out))
    dt = (time.time() - t0) / loops * 1000
    print(f"{label:42s} {dt:8.1f} ms/fwd")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=20)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()

    base = dict(backbone_model_name="svd", cross_attention_dim=1024, num_blocks=1,
                adapter_locations=("A", "B", "C", "D", "M"),
                add_temporal_resnet=True, add_temporal_transformer=True, dtype=DT)
    variants = {
        "full": {},
        "no_temporal_transformer": dict(add_temporal_transformer=False),
        "no_spatial_transformer": dict(add_spatial_transformer=False),
        "no_transformers": dict(add_spatial_transformer=False,
                                add_temporal_transformer=False),
        "no_temporal_resnet": dict(add_temporal_resnet=False),
        "no_resnets": dict(add_spatial_resnet=False, add_temporal_resnet=False),
    }
    results = {}
    for name, over in variants.items():
        if args.only and name != args.only:
            continue
        results[name] = measure(ControlNetAdapter(**{**base, **over}), name, args.loops)
    if "full" in results:
        for name, t in results.items():
            if name != "full":
                print(f"  {name}: component ~= {results['full'] - t:.1f} ms")


if __name__ == "__main__":
    main()
