"""Fused GEGLU (matmul + bias + gated gelu) — Pallas TPU kernel with XLA fallback.

Every transformer feed-forward in the UNets/ControlNet/adapters starts with a
GEGLU: ``a = x @ W + b`` (width 8·C), split into value/gate halves, ``value *
gelu(gate)`` (width 4·C). Unfused, the 8·C-wide intermediate is written to HBM
and read back — at the 64² video shapes that is ~0.6 GB written + re-read around
0.66 ms of matmul (measured ~2.0 ms total on v5e). The Pallas kernel computes the
projection into VMEM tiles and writes only the 4·C-wide gated product: one read
of x, one write of the result.

Design notes (see /opt/skills/guides/pallas_guide.md):
- grid over row tiles (TM = 256 rows, 128 when the weight is wide); the full
  (C, 2D) weight is resident in VMEM per program — eligible while
  ``C·2D·itemsize`` fits the budget (C ≤ 640 at mult-4 FFs; the 1280-channel
  blocks take the XLA fallback, where the intermediate is 4× smaller anyway).
- accumulation in fp32 (``preferred_element_type``), gate math in fp32, output
  cast to the storage dtype.
- differentiable via custom_vjp whose backward is the VJP of the XLA reference
  (identical math), so the trainable-adapter path can use the fused forward.
- dispatch tracks ``jax.default_backend()`` uncached (platform can switch to
  cpu at runtime on this terminal); interpret mode off-TPU for tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_W_VMEM_BUDGET = 8 * 1024 * 1024  # resident weight bytes


def _on_tpu() -> bool:
    import os

    # OPT-IN (CTRL_ADAPTER_FUSED_FF=1): standalone, the kernel beats the XLA
    # chain (1.66 vs 1.95 ms at (114k, 320->2x1280) on v5e), but inside a full
    # transformer program the pallas_call boundary blocks XLA from fusing the
    # neighboring elementwise/matmul ops and the module NET-slows by ~35%
    # (2.96 vs 2.19 ms measured). Kept for shapes/programs where the boundary
    # cost doesn't apply; default stays with XLA.
    if os.environ.get("CTRL_ADAPTER_FUSED_FF") != "1":
        return False
    from .backend import is_tpu_backend

    return is_tpu_backend()


def _xla_geglu(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
               approximate: bool, dtype) -> jnp.ndarray:
    """Reference math — identical to flax nn.Dense + split + gelu."""
    cd = dtype or x.dtype
    a = x.astype(cd) @ kernel.astype(cd) + bias.astype(cd)
    value, gate = jnp.split(a, 2, axis=-1)
    return value * jax.nn.gelu(gate, approximate=approximate)


def _kernel(x_ref, w_ref, b_ref, out_ref, *, approximate):
    a = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    a = a + b_ref[:].astype(jnp.float32)
    d = a.shape[-1] // 2
    value, gate = a[:, :d], a[:, d:]
    out_ref[:] = (value * jax.nn.gelu(gate, approximate=approximate)).astype(
        out_ref.dtype)


def _pallas_geglu(x2: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                  approximate: bool, tm: int, interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, c = x2.shape
    d2 = kernel.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel, approximate=approximate),
        out_shape=jax.ShapeDtypeStruct((m, d2 // 2), x2.dtype),
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, d2 // 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, kernel, bias.reshape(1, d2))


def _tile_rows(c: int) -> int:
    return 256 if c <= 384 else 128


def _eligible(m: int, c: int, d2: int, itemsize: int) -> bool:
    tm = _tile_rows(c)
    return (
        m % tm == 0
        and d2 % 2 == 0
        and c * d2 * itemsize <= _W_VMEM_BUDGET
        # fp32 accumulator tile must stay modest
        and tm * d2 * 4 <= 6 * 1024 * 1024
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def geglu(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
          approximate: bool = False, dtype=None,
          use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """x (..., C) @ kernel (C, 2D) + bias -> value * gelu(gate), (..., D).

    ``use_pallas``: None = auto (TPU + shapes eligible), True = force
    (interpret off-TPU, for tests), False = XLA fallback."""
    m = int(np.prod(x.shape[:-1]))
    c, d2 = kernel.shape
    eligible = _eligible(m, c, d2, jnp.dtype(x.dtype).itemsize)
    use = use_pallas if use_pallas is not None else (_on_tpu() and eligible)
    if use and eligible:
        cd = dtype or x.dtype
        x2 = x.reshape(m, c).astype(cd)
        out = _pallas_geglu(x2, kernel.astype(cd), bias.astype(cd), approximate,
                            _tile_rows(c), interpret=not _on_tpu())
        return out.reshape(x.shape[:-1] + (d2 // 2,))
    return _xla_geglu(x, kernel, bias, approximate, dtype)


def _fwd(x, kernel, bias, approximate, dtype, use_pallas):
    return geglu(x, kernel, bias, approximate, dtype, use_pallas), (x, kernel, bias)


def _bwd(approximate, dtype, use_pallas, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(
        lambda xx, kk, bb: _xla_geglu(xx, kk, bb, approximate, dtype),
        x, kernel, bias)
    return vjp(g)


geglu.defvjp(_fwd, _bwd)
