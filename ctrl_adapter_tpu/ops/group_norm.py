"""Fused GroupNorm(+SiLU) — single-HBM-pass Pallas TPU kernel with XLA fallback.

GroupNorm→SiLU is the most frequent op pair in every UNet/ControlNet block
(~60 instances per backbone forward; reference `model/resnet_block_2d.py:164-221`,
`controlnet/controlnet.py:347-438`). Standalone, XLA executes it as a reduce pass
(read x) plus a normalize+SiLU pass (read x, write y); the Pallas kernel does
stats + normalize + affine + SiLU in ONE read + ONE write. In the conv-sandwiched
UNet context, however, XLA fuses the stat pass into the producing conv's epilogue
and the normalize into the consumer — beating the kernel (see ``_on_tpu``), so
dispatch is opt-in.

Design notes (see /opt/skills/guides/pallas_guide.md):
- grid over the batch axis; block = one sample's full (S, C) feature map in VMEM.
  VMEM peak ≈ 2·(in+out) blocks (double-buffered) ≈ 8·S·C bytes at bf16 — the kernel
  never materialises a full fp32 copy: statistics and the normalize pass loop over
  static S-chunks (fp32 math on chunk-sized temps only). Samples too big for VMEM
  (SDXL 1024² first-level maps, temporal GN over f·h·w rows) take the XLA fallback.
- channel→group reduction via tiny one-hot matmuls (C, G) on the MXU instead of
  (S, G, C/G) reshapes, which would break lane alignment for C/G = 10.
- stats in fp32 regardless of storage dtype (matches flax.linen.GroupNorm with
  use_fast_variance: var = E[x²] − E[x]²).
- differentiable: custom_vjp whose backward is the VJP of the XLA reference
  implementation (identical math), so the trainable adapter path can use the fused
  forward.
- dispatch tracks ``jax.default_backend()`` *uncached*: this image force-registers the
  TPU plugin and entry points switch jax_platforms to cpu at runtime.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# double-buffered bf16 in+out blocks must fit ~16MB VMEM with headroom
_VMEM_BLOCK_BUDGET = 12 * 1024 * 1024  # bytes, compared against 8*S*C
_CHUNK_F32_BYTES = 1024 * 1024  # per-chunk fp32 temp target


def _on_tpu() -> bool:
    # OPT-IN (CTRL_ADAPTER_FUSED_GN=1): the kernel wins standalone (one HBM pass
    # vs two), but measured on the full SVD UNet step (v5e r2) it is a net LOSS:
    # 333.4 ms/step with it vs 325.2 ms without. XLA fuses the GN *stat* pass
    # into the producing conv's epilogue (`convert_reduce_fusion`, ~126 TFLOP/s)
    # and the normalize+SiLU into the consumer, at conv-preferred layouts — the
    # pallas_call boundary instead forces {3,2,1,0} relayout copies on both
    # sides. Kept for programs whose GN neighbors aren't convolutions.
    if os.environ.get("CTRL_ADAPTER_FUSED_GN") != "1":
        return False
    from .backend import is_tpu_backend

    return is_tpu_backend()


def _xla_group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float,
    silu: bool,
) -> jnp.ndarray:
    """flax.linen.GroupNorm math (fp32 stats, E[x^2]-E[x]^2 fast variance) in a
    channel-sum formulation: the big tensor is only ever touched as (n, s, c)
    row-major — per-channel sums first, the (g, c/g) split only on tiny (n, c)
    stats. The naive (n, s, g, c/g) reshape puts c/g (10 for the UNet's 320/32)
    on the lane axis; if XLA materialises it, the 128-lane padding is a 12.8x
    memory blow-up (measured: 7.2 s vs 0.17 s for one adapter forward on v5e).
    This layout also lets XLA fuse the stat pass into the producing conv's
    epilogue, which is why the fallback beats the Pallas kernel between convs."""
    c = x.shape[-1]
    n = x.shape[0]
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(n, -1, c)
    s = xf.shape[1]
    ch_sum = jnp.sum(xf, axis=1)  # (n, c)
    ch_sq = jnp.sum(xf * xf, axis=1)
    g_sum = ch_sum.reshape(n, num_groups, cg).sum(-1)  # (n, g) — tiny
    g_sq = ch_sq.reshape(n, num_groups, cg).sum(-1)
    count = s * cg
    g_mean = g_sum / count
    g_var = g_sq / count - g_mean * g_mean
    # E[x^2] - E[x]^2 can go epsilon-negative in fp32 for near-constant groups
    g_rstd = jax.lax.rsqrt(jnp.maximum(g_var, 0.0) + eps)
    mean_c = jnp.repeat(g_mean, cg, axis=-1)[:, None]  # (n, 1, c)
    rstd_c = jnp.repeat(g_rstd, cg, axis=-1)[:, None]
    y = (xf - mean_c) * rstd_c * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.reshape(x.shape).astype(x.dtype)


def _pick_chunk(s: int, c: int) -> int:
    """Largest power-of-two divisor of s whose fp32 chunk fits the temp target."""
    chunk = 1
    while (
        chunk < s
        and s % (chunk * 2) == 0
        and (chunk * 2) * c * 4 <= _CHUNK_F32_BYTES
    ):
        chunk *= 2
    return chunk


def _kernel(
    x_ref, scale_ref, bias_ref, onehot_ref, out_ref, *, num_groups, eps, silu, chunk
):
    import jax.experimental.pallas as pl

    s, c = x_ref.shape[1], x_ref.shape[2]
    n_chunks = s // chunk
    m = onehot_ref[:]  # (C, G) one-hot group membership
    n_per_group = float(s * (c // num_groups))

    def stat_body(i, acc):
        ch_sum, ch_sq = acc
        xb = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)  # (chunk, C)
        return (
            ch_sum + jnp.sum(xb, axis=0, keepdims=True),
            ch_sq + jnp.sum(xb * xb, axis=0, keepdims=True),
        )

    ch_sum, ch_sq = jax.lax.fori_loop(
        0, n_chunks, stat_body,
        (jnp.zeros((1, c), jnp.float32), jnp.zeros((1, c), jnp.float32)),
    )
    # HIGHEST precision is load-bearing: the MXU's default matmul precision
    # rounds fp32 operands to bf16 (preferred_element_type only sets the OUTPUT
    # dtype), which corrupts the channel sums by ~1e-3 relative — and when the
    # true group variance is tiny, the rounded E[x^2] - E[x]^2 goes negative
    # beyond eps and rsqrt returns NaN (measured on v5e; maxdiff 3e-2 on UNet
    # widths at default precision, exact at HIGHEST).
    hi = jax.lax.Precision.HIGHEST
    g_sum = jnp.dot(ch_sum, m, preferred_element_type=jnp.float32, precision=hi)
    g_sq = jnp.dot(ch_sq, m, preferred_element_type=jnp.float32, precision=hi)
    g_mean = g_sum / n_per_group
    g_var = g_sq / n_per_group - g_mean * g_mean
    g_rstd = jax.lax.rsqrt(jnp.maximum(g_var, 0.0) + eps)
    # broadcast group stats back to channels: (1, G) · (C, G)ᵀ -> (1, C)
    mean_c = jax.lax.dot_general(
        g_mean, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=hi,
    )
    rstd_c = jax.lax.dot_general(
        g_rstd, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=hi,
    )
    gamma = scale_ref[:].astype(jnp.float32)
    beta = bias_ref[:].astype(jnp.float32)

    def norm_body(i, _):
        xb = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = (xb - mean_c) * rstd_c * gamma + beta
        if silu:
            y = y * jax.nn.sigmoid(y)
        out_ref[0, pl.ds(i * chunk, chunk), :] = y.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm_body, 0)


def _pallas_group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float,
    silu: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    n, c = x.shape[0], x.shape[-1]
    s = int(np.prod(x.shape[1:-1]))
    x3 = x.reshape(n, s, c)
    onehot = jnp.asarray(
        np.repeat(np.eye(num_groups, dtype=np.float32), c // num_groups, axis=0)
    )  # (C, G)

    out = pl.pallas_call(
        functools.partial(
            _kernel, num_groups=num_groups, eps=eps, silu=silu,
            chunk=_pick_chunk(s, c),
        ),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x3, scale.reshape(1, c), bias.reshape(1, c), onehot)
    return out.reshape(orig_shape)


def _eligible(x: jnp.ndarray, num_groups: int) -> bool:
    if x.ndim < 2:
        return False
    c = x.shape[-1]
    s = int(np.prod(x.shape[1:-1]))
    itemsize = jnp.dtype(x.dtype).itemsize
    # Mosaic pads non-128-multiple lane counts internally (UNet channels are
    # 320/640/1280), so only group divisibility and the VMEM budget gate dispatch.
    return (
        c % num_groups == 0
        and s >= 8
        and s % _pick_chunk(s, c) == 0
        and 4 * s * c * itemsize <= _VMEM_BLOCK_BUDGET
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-6,
    silu: bool = False,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """GroupNorm over trailing channels (+ optional fused SiLU).

    x: (N, ..., C); statistics per sample over all non-channel dims within each of
    ``num_groups`` contiguous channel groups. ``use_pallas``: None = auto
    (CTRL_ADAPTER_FUSED_GN=1 on TPU and the sample fits VMEM), "prefer" = kernel
    whenever on TPU and eligible regardless of the env default (module-level
    override: the adapter's op mix degenerates under XLA GN — 7.2 s vs 0.17 s
    per forward on v5e — while the conv-sandwiched UNet/ControlNet towers are
    faster WITHOUT the kernel), True = force (interpret mode off-TPU, for
    tests), False = XLA fallback.
    """
    from .backend import is_tpu_backend

    if use_pallas == "prefer":
        use_pallas = True if (is_tpu_backend() and _eligible(x, num_groups)) else False
    use = use_pallas if use_pallas is not None else (_on_tpu() and _eligible(x, num_groups))
    if use and _eligible(x, num_groups):
        # interpret tracks the real backend (tests force use_pallas=True on CPU);
        # the env gate only controls the *default* dispatch.
        return _pallas_group_norm_silu(
            x, scale, bias, num_groups, eps, silu, interpret=not is_tpu_backend()
        )
    return _xla_group_norm_silu(x, scale, bias, num_groups, eps, silu)


def _fwd(x, scale, bias, num_groups, eps, silu, use_pallas):
    return group_norm_silu(x, scale, bias, num_groups, eps, silu, use_pallas), (
        x,
        scale,
        bias,
    )


def _bwd(num_groups, eps, silu, use_pallas, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: _xla_group_norm_silu(xx, ss, bb, num_groups, eps, silu),
        x,
        scale,
        bias,
    )
    return vjp(g)


group_norm_silu.defvjp(_fwd, _bwd)
