"""Knockout profiling of the SVD Ctrl-Adapter forward on the real chip.

Times the full 13-block adapter forward (bench configuration: batch 2x14
frames, SD-v1.5 ControlNet feature shapes) and component-knockout variants to
attribute the milliseconds. Each measurement scans the forward L times inside
one jitted program and reads back a scalar checksum (the only reliable timing
on the remote-TPU tunnel; see docs/PERFORMANCE.md).

Caveats baked into the report:
- an ``identity`` baseline (same carry-adds + fp32 checksum, no adapter) is
  measured and subtracted from the ``full`` number, so the harness overhead
  doesn't inflate the absolute ms/fwd figure;
- knockout attribution (full - variant) INCLUDES interaction terms: disabling
  one transformer also removes its AlphaBlender mixer, and ``no_transformers``
  additionally removes the shared norm/proj_in/proj_out — per-component
  estimates are upper bounds, printed as such.

Usage: python tools/profile_adapter.py [--loops 20] [--repeats 3]
"""

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctrl_adapter_tpu.models.adapter import ControlNetAdapter  # noqa: E402

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
    """Random params at each leaf's DECLARED dtype (param_dtype=fp32 leaves stay
    fp32 — matching deployment parameter memory traffic)."""
    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))
    rng = np.random.default_rng(0)

    def fill(s):
        return jnp.asarray(rng.standard_normal(s.shape).astype(np.float32) * 0.02).astype(s.dtype)

    return jax.tree.map(fill, shapes)


def measure(adapter, label, loops, repeats):
    """min-of-``repeats`` ms per forward; adapter=None measures the harness
    (carry-adds + checksum) alone."""
    downs = [jnp.asarray(np.random.default_rng(1).standard_normal(s), DT) * 0.1
             for s in DOWN_SHAPES]
    mid = jnp.asarray(np.random.default_rng(2).standard_normal(MID_SHAPE), DT) * 0.1
    ts = jnp.ones((BF,))
    ehs = jnp.ones((1, 1, 1024), DT) * 0.1
    params = fabricate(adapter, downs, mid, F, ts, ehs) if adapter is not None else {}

    @jax.jit
    def run(p, d, m):
        def body(carry, _):
            ins = [x + carry for x in d]
            min_ = m + carry
            if adapter is not None:
                outs, om = adapter.apply(p, ins, min_, F, ts, ehs)
            else:
                outs, om = ins, min_  # identity: harness cost only
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            s = s + jnp.sum(om.astype(jnp.float32))
            return (s * 1e-12).astype(DT), s

        return jax.lax.scan(body, jnp.zeros((), DT), None, length=loops)[1]

    out = run(params, downs, mid)
    float(jnp.sum(out))  # compile+exec
    times = []
    for _ in range(max(1, repeats)):
        t0 = time.time()
        out = run(params, downs, mid)
        float(jnp.sum(out))
        times.append((time.time() - t0) / loops * 1000)
    dt = min(times)
    spread = (max(times) - dt) / dt * 100 if dt else 0.0
    print(f"{label:42s} {dt:8.1f} ms/fwd  (min of {len(times)}, +{spread:.0f}% spread)")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()

    base = dict(backbone_model_name="svd", cross_attention_dim=1024, num_blocks=1,
                adapter_locations=("A", "B", "C", "D", "M"),
                add_temporal_resnet=True, add_temporal_transformer=True, dtype=DT)
    variants = {
        "identity": None,  # harness-only baseline (carry-adds + checksum)
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
        adapter = None if over is None else ControlNetAdapter(**{**base, **over})
        results[name] = measure(adapter, name, args.loops, args.repeats)
    if "full" in results:
        harness = results.get("identity", 0.0)
        if harness:
            print(f"  adapter-only (full - identity harness): "
                  f"{results['full'] - harness:.1f} ms")
        print("  knockout deltas are UPPER bounds: each includes the removed "
              "component's AlphaBlender mixer and, for no_transformers, the "
              "shared norm/proj_in/proj_out")
        for name, t in results.items():
            if name not in ("full", "identity"):
                print(f"  {name}: component <= {results['full'] - t:.1f} ms")


if __name__ == "__main__":
    main()
