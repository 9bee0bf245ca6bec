"""On-chip numerics check of the einsum-layout flash self-attention path.

The ``Attention`` module routes flash-eligible self-attention through
projection einsums that emit the kernel-native (B, N, T, H) layout
(nn/attention.py). CPU tests never dispatch that path (no Mosaic), so —
per the r2 lesson that only the real chip catches real-kernel numerics —
this compares it against the reference Dense + XLA-attention path
(CTRL_ADAPTER_NO_FLASH=1 equivalent) ON THE SAME CHIP, same params, bf16.

Usage: python tools/check_attn_einsum.py
Prints max abs/rel diff per shape; exits nonzero above tolerance.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax"),
)

from ctrl_adapter_tpu.nn.attention import Attention  # noqa: E402
from ctrl_adapter_tpu.ops import flash_attention as fa  # noqa: E402


def main() -> int:
    failures = 0
    # (batch, seq, heads) at the real UNet/adapter widths; head_dim 64.
    for b, t, n in ((4, 4096, 5), (4, 1024, 10), (2, 4096, 8)):
        c = n * 64
        mod = Attention(query_dim=c, heads=n, dim_head=64, dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.bfloat16)
        params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

        y_einsum = jax.jit(mod.apply)(params, x)
        assert fa.flash_eligible(t, t, 64), "expected flash dispatch on chip"

        os.environ["CTRL_ADAPTER_NO_FLASH"] = "1"
        try:
            # bf16 reference: Dense + XLA attention (the pre-flash path).
            y_ref = jax.jit(mod.apply, static_argnames=())(params, x)
            # fp32 oracle: same math, full precision — the ground truth both
            # bf16 paths approximate. Distances to it separate "bf16/kernel
            # rounding" from "wrong math in the einsum rewiring".
            mod32 = Attention(query_dim=c, heads=n, dim_head=64,
                              dtype=jnp.float32)
            p32 = jax.tree.map(lambda a: a.astype(jnp.float32), params)
            y_oracle = jax.jit(mod32.apply)(p32, x.astype(jnp.float32))
        finally:
            del os.environ["CTRL_ADAPTER_NO_FLASH"]

        a = np.asarray(y_einsum, np.float32)
        r = np.asarray(y_ref, np.float32)
        o = np.asarray(y_oracle, np.float32)
        d_new = float(np.abs(a - o).max())
        d_ref = float(np.abs(r - o).max())
        maxabs = float(np.abs(a - r).max())
        # The new path must sit in the same bf16-rounding band as the old one:
        # no further from the fp32 truth than the old path + one bf16 ulp of
        # the output scale, and absolutely close to the old path.
        ulp = float(np.spacing(np.abs(o).max(), dtype=np.float32)) + 2 ** -8
        ok = d_new <= d_ref + ulp and maxabs < 0.05
        print(f"(b={b}, t={t}, heads={n}): |new-oracle|={d_new:.2e} "
              f"|ref-oracle|={d_ref:.2e} |new-ref|={maxabs:.2e} "
              f"{'OK' if ok else 'FAIL'}")
        failures += 0 if ok else 1
    return failures


if __name__ == "__main__":
    sys.exit(main())
