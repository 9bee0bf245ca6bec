"""Fused LayerNorm -> GEGLU feed-forward -> +residual — one Pallas TPU kernel.

This is the complete transformer FF *residual sub-block*
(``x + net_2(geglu(net_0(LN(x))))``), the pattern closing every
BasicTransformerBlock / TemporalBasicTransformerBlock and opening every
TemporalBasicTransformerBlock (``norm_in``/``ff_in``) — ~48 instances per UNet
forward and ~39 per adapter forward.

Round-1 lesson (docs/PERFORMANCE.md): fusing only the GEGLU *sub-op* loses more
at the pallas_call boundary than it saves, because XLA can no longer fuse the
LN/residual neighbors. This kernel therefore owns the whole residual sub-block:
its boundaries (block input -> block output) are points where HBM traffic is
unavoidable anyway.

HBM traffic per application, unfused vs fused (M rows, width C, inner 4C):
  XLA   : read x (LN) + write ln + read ln (mm1) + write 8C inter + read 8C
          + write 4C gated + read 4C (mm2) + write out + read x (res)
          ~= (3 + 16 + 8 + 2) * M*C
  kernel: read x + read weights (streamed col-tiles) + write out = 2*M*C + W
The (M, 8C) intermediate — 8x the block input — never exists.

Design (see /opt/skills/guides/pallas_guide.md):
- 2D grid (row tiles x col tiles of the 4C inner width). Per (i, j): LN of the
  x tile (recomputed per j — VPU-cheap), matmul against the j-th value/gate
  weight columns, gated-gelu, partial (TM, C) product accumulated in an fp32
  VMEM scratch; residual added at j==0, output written at the last j.
- weights stream per col-tile, so the kernel is eligible at EVERY width
  (320/640/1280) — resident footprint is 3*TN*C*itemsize, not C*8C.
- matmuls run at native MXU precision for the storage dtype (bf16 in prod);
  LN statistics and the accumulator are fp32.
- differentiable via custom_vjp: backward is the VJP of the XLA reference.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_ACC_VMEM_BUDGET = 10 * 1024 * 1024


def _on_tpu() -> bool:
    # OPT-IN (CTRL_ADAPTER_FUSED_BLOCK=1): measured on the full SVD denoise step
    # (v5e r2): all-width fusion 586 ms/step, C=320-only 573 ms/step vs 563 ms
    # unfused — the pallas_call boundary (lost XLA overlap with neighboring ops)
    # outweighs the intra-block HBM saving even at whole-sub-block granularity,
    # at every width. Kept for programs where the boundary cost doesn't apply.
    if os.environ.get("CTRL_ADAPTER_FUSED_BLOCK") != "1":
        return False
    from .backend import is_tpu_backend

    return is_tpu_backend()


def _gelu(x: jnp.ndarray, approximate: bool) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=approximate)


def _xla_ln_ff_residual(x, ln_scale, ln_bias, wg, bg, w2, b2, eps, approximate,
                        residual, dtype):
    """Reference math: flax LayerNorm (fp32 stats) -> GEGLU -> Dense -> +x."""
    cd = dtype or x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.maximum(((xf - mean) ** 2).mean(axis=-1, keepdims=True), 0.0)
    ln = (xf - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    a = ln.astype(cd) @ wg.astype(cd) + bg.astype(cd)
    value, gate = jnp.split(a, 2, axis=-1)
    h = value * _gelu(gate, approximate)
    out = h @ w2.astype(cd) + b2.astype(cd)
    if residual:
        out = out + x.astype(cd)
    return out.astype(x.dtype)


def _kernel(x_ref, lns_ref, lnb_ref, wgv_ref, wgg_ref, bgv_ref, bgg_ref,
            w2_ref, b2_ref, out_ref, acc_ref, *, eps, approximate, residual,
            n_col_tiles):
    import jax.experimental.pallas as pl

    j = pl.program_id(1)

    x = x_ref[0].astype(jnp.float32)  # (TM, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean((x - mean) ** 2, axis=-1, keepdims=True), 0.0)
    ln = (x - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    ln = ln.astype(out_ref.dtype)

    value = jnp.dot(ln, wgv_ref[:], preferred_element_type=jnp.float32) \
        + bgv_ref[0].astype(jnp.float32)
    gate = jnp.dot(ln, wgg_ref[:], preferred_element_type=jnp.float32) \
        + bgg_ref[0].astype(jnp.float32)
    h = (value * _gelu(gate, approximate)).astype(out_ref.dtype)
    partial = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        base = partial + b2_ref[0].astype(jnp.float32)
        if residual:
            base = base + x
        acc_ref[:, :] = base

    @pl.when(j > 0)
    def _acc():
        acc_ref[:, :] += partial

    @pl.when(j == n_col_tiles - 1)
    def _emit():
        out_ref[0] = acc_ref[:, :].astype(out_ref.dtype)


def _tiles(m: int, c: int, inner: int, itemsize: int):
    """(TM, TN) or None if ineligible."""
    tm = 256
    while tm > 8 and m % tm:
        tm //= 2
    if m % tm:
        return None
    # col tile over the 4C inner width: must divide inner, be a multiple of 128
    # (Mosaic lane constraint on weight blocks), and keep 3 streamed weight
    # blocks of TN*C within budget
    tn = None
    for cand in range(inner, 127, -128):
        if inner % cand == 0 and 3 * cand * c * itemsize <= 4 * 1024 * 1024:
            tn = cand
            break
    if tn is None:
        return None
    # fp32 acc (TM, C) + h (TM, TN) + x/out blocks
    if tm * c * 4 + tm * tn * 4 + tm * c * 2 * itemsize > _ACC_VMEM_BUDGET:
        return None
    return tm, tn


def _pallas_ln_ff_residual(x2, ln_scale, ln_bias, wg, bg, w2, b2, eps,
                           approximate, residual, tm, tn, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, c = x2.shape
    inner = w2.shape[0]  # 4C
    n_col = inner // tn
    cout = w2.shape[1]

    grid = (m // tm, n_col)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, approximate=approximate,
                          residual=residual, n_col_tiles=n_col),
        out_shape=jax.ShapeDtypeStruct((1, m, cout), x2.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tm, c), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),  # x (leading dummy dim)
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            # gate columns live at offset inner in wg; second view via index map
            pl.BlockSpec((c, tn), lambda i, j, _n=n_col: (0, j + _n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, _n=n_col: (0, j + _n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, cout), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, cout), lambda i, j: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, cout), jnp.float32)],
        interpret=interpret,
    )(
        x2[None], ln_scale.reshape(1, c), ln_bias.reshape(1, c),
        wg, wg, bg.reshape(1, -1), bg.reshape(1, -1), w2,
        b2.reshape(1, cout),
    )
    return out[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def ln_ff_residual(
    x: jnp.ndarray,            # (..., C)
    ln_scale: jnp.ndarray,     # (C,)
    ln_bias: jnp.ndarray,      # (C,)
    wg: jnp.ndarray,           # (C, 2*inner) GEGLU proj kernel [value; gate]
    bg: jnp.ndarray,           # (2*inner,)
    w2: jnp.ndarray,           # (inner, C_out)
    b2: jnp.ndarray,           # (C_out,)
    eps: float = 1e-5,
    approximate: bool = False,
    residual: bool = True,
    dtype=None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """``x + Dense(geglu(LN(x)))`` as one kernel (falls back to XLA off-TPU or
    at ineligible shapes)."""
    orig_shape = x.shape
    c = x.shape[-1]
    m = int(np.prod(x.shape[:-1]))
    inner = w2.shape[0]
    itemsize = jnp.dtype(x.dtype).itemsize
    tiles = _tiles(m, c, inner, itemsize)
    # Mosaic cannot lower erf/erfc (exact gelu); production bf16 runs the tanh
    # form, fp32 exact-gelu calls take the XLA path. Width gate: measured on the
    # full SVD denoise step (v5e), fusing every width was a net -4% (pallas_call
    # boundaries beat the saved HBM traffic at 640/1280 where XLA's narrow-K
    # matmuls already run ~100 TF/s); only the 320-wide level-0 blocks — where
    # the XLA chain bottoms out — stay on the kernel.
    use = use_pallas if use_pallas is not None else (
        _on_tpu() and tiles is not None and approximate and c <= 320 and m >= 4096)
    if use and tiles is not None:
        x2 = x.reshape(m, c)
        out = _pallas_ln_ff_residual(
            x2, ln_scale, ln_bias, wg, bg, w2, b2, eps, approximate, residual,
            tiles[0], tiles[1], interpret=not _on_tpu())
        return out.reshape(orig_shape[:-1] + (w2.shape[1],))
    return _xla_ln_ff_residual(x, ln_scale, ln_bias, wg, bg, w2, b2, eps,
                               approximate, residual, dtype)


def _fwd(x, ln_scale, ln_bias, wg, bg, w2, b2, eps, approximate, residual,
         dtype, use_pallas):
    out = ln_ff_residual(x, ln_scale, ln_bias, wg, bg, w2, b2, eps, approximate,
                         residual, dtype, use_pallas)
    return out, (x, ln_scale, ln_bias, wg, bg, w2, b2)


def _bwd(eps, approximate, residual, dtype, use_pallas, res, g):
    x, ln_scale, ln_bias, wg, bg, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _xla_ln_ff_residual(*a, eps, approximate, residual, dtype),
        x, ln_scale, ln_bias, wg, bg, w2, b2,
    )
    return vjp(g)


ln_ff_residual.defvjp(_fwd, _bwd)
