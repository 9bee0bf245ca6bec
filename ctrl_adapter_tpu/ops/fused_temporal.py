"""Fused TemporalBasicTransformerBlock — whole-block Pallas TPU kernels.

The temporal transformer (diffusers ``TemporalBasicTransformerBlock``; reference
`model/adapter_spatial_temporal.py:119-130` and the SVD/I2VGen UNet temporal
attention) is the most memory-bound module of the denoise step: per application
the XLA path pays ~12 HBM round trips of the (b*f, s, c) activation — two
physical (b*f,s,c)<->(b*s,f,c) transposes, three LayerNorms, two GEGLU FFs, a
QKV/out projection chain — while the per-token attention sequence is only
``num_frames`` (14/16) tokens, far too small to amortise anything.

This kernel owns the complete residual block. Its inputs/outputs stay in the
UNet's native (b, f, s, c) layout; frames are regrouped per spatial position
*inside* VMEM, so the two HBM transposes vanish entirely, and every sub-block
intermediate lives only in VMEM:

    x ->[ LN_in -> GEGLU FF_in (+res) ]          "ffin" part
      ->[ LN1 -> QKV -> attn(f x f) -> out +res
           (+ per-row cross-attn bias) ]          "attn" part
      ->[ LN3 -> GEGLU FF (+res) ]                "ff"   part

Single-key cross-attention (the 1-token CLIP-image ``time_context`` of SVD /
I2VGen / all Ctrl-Adapter temporal blocks) is softmax-free — the output is
exactly ``to_out(to_v(ctx))`` broadcast over frames — so it enters the kernel
as a precomputed (b*s, c) bias, and LN2/to_q/to_k are dead (the XLA path DCEs
them identically).

VMEM packing: weights must be resident (~16 MB/core budget, see
/opt/skills/guides/pallas_guide.md). Width 320 fits the whole block in one
kernel; wider blocks are split into consecutive part-groups, each its own
pallas_call — every split boundary is a residual-stream point where one HBM
round trip replaces the XLA path's many.

Numerics mirror the XLA modules exactly: LN statistics fp32, matmuls at the
storage dtype (bf16 in production, MXU fp32 accumulation), bf16 attention
logits with fp32 softmax — the same quantization ``nn.Dense``/``_sdpa``
produce. Backward = VJP of the XLA mirror (custom_vjp), so training semantics
are unchanged.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_WEIGHT_BUDGET = 9 * 1024 * 1024   # resident weight bytes per pallas_call
_VMEM_BUDGET = 14 * 1024 * 1024    # rough total (weights + activations)


def _on_tpu() -> bool:
    if os.environ.get("CTRL_ADAPTER_NO_FUSED_TEMPORAL") == "1":
        return False
    from .backend import is_tpu_backend

    return is_tpu_backend()


# ---------------------------------------------------------------------------
# XLA mirror (fallback path + custom_vjp backward). Must match the flax
# module math op-for-op; tests/test_fused_temporal.py pins this against
# TemporalBasicTransformerBlock.
# ---------------------------------------------------------------------------


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.maximum(((xf - mean) ** 2).mean(axis=-1, keepdims=True), 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _geglu_ff(x, wg, bg, w2, b2, approximate):
    a = x @ wg + bg
    value, gate = jnp.split(a, 2, axis=-1)
    h = value * jax.nn.gelu(gate, approximate=approximate)
    return h @ w2 + b2


def _xla_temporal_block(x, cross_bias, p, cfg):
    """x: (b, f, s, c); cross_bias: (b, s, c) or None; p: weight dict."""
    b, f, s, c = x.shape
    cur = x
    if "ffin" in cfg["parts"]:
        y = _ln(cur, p["lnin_s"], p["lnin_b"], cfg["eps"])
        y = _geglu_ff(y, p["ffin_wg"], p["ffin_bg"], p["ffin_w2"], p["ffin_b2"],
                      cfg["approximate"])
        cur = y + cur if cfg["is_res"] else y
    if "attn" in cfg["parts"]:
        nh, hd = cfg["heads"], cfg["head_dim"]
        y = _ln(cur, p["ln1_s"], p["ln1_b"], cfg["eps"])
        q = y @ p["wq"]
        k = y @ p["wk"]
        v = y @ p["wv"]
        # attention over the frame axis, per (batch, spatial) position
        q = q.reshape(b, f, s, nh, hd)
        k = k.reshape(b, f, s, nh, hd)
        v = v.reshape(b, f, s, nh, hd)
        logits = jnp.einsum("bisnh,bjsnh->bsnij", q, k) * (hd ** -0.5)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        o = jnp.einsum("bsnij,bjsnh->bisnh", probs, v)
        o = o.reshape(b, f, s, nh * hd)
        cur = cur + (o @ p["wo"] + p["bo"])
        if cross_bias is not None:
            cur = cur + cross_bias[:, None]
    if "ff" in cfg["parts"]:
        y = _ln(cur, p["ln3_s"], p["ln3_b"], cfg["eps"])
        y = _geglu_ff(y, p["ff_wg"], p["ff_bg"], p["ff_w2"], p["ff_b2"],
                      cfg["approximate"])
        cur = y + cur if cfg["is_res"] else y
    return cur


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _kernel(*refs, cfg):
    import jax.experimental.pallas as pl  # noqa: F401

    parts = cfg["parts"]
    f, ts = cfg["f"], cfg["ts"]
    eps, approximate = cfg["eps"], cfg["approximate"]
    it = iter(refs[:-1])
    x_ref = next(it)
    out_ref = refs[-1]
    cdtype = out_ref.dtype

    x = x_ref[0]  # (f, ts, c)
    c = x.shape[-1]
    cur = x.reshape(f * ts, c)

    def ln(y, s_ref, b_ref):
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean((yf - mean) ** 2, axis=-1, keepdims=True), 0.0)
        n = (yf - mean) * jax.lax.rsqrt(var + eps)
        n = n * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
        return n.astype(cdtype)

    def dot(a, b_):
        # Mosaic requires a 32-bit accumulator; rounding the fp32 result to
        # the storage dtype reproduces XLA's bf16 Dense numerics exactly.
        return jnp.dot(a, b_, preferred_element_type=jnp.float32).astype(cdtype)

    def geglu_ff(y, wg_ref, bg_ref, w2_ref, b2_ref):
        iff = w2_ref.shape[0]
        value = dot(y, wg_ref[:, :iff]) + bg_ref[0, :iff]
        gate = dot(y, wg_ref[:, iff:]) + bg_ref[0, iff:]
        h = value * jax.nn.gelu(gate, approximate=approximate)
        return dot(h, w2_ref[:]) + b2_ref[0]

    if "ffin" in parts:
        lnin_s, lnin_b, wg, bg, w2, b2 = (next(it) for _ in range(6))
        y = geglu_ff(ln(cur, lnin_s, lnin_b), wg, bg, w2, b2)
        cur = y + cur if cfg["is_res"] else y

    if "attn" in parts:
        ln1_s, ln1_b, wq, wk, wv, wo, bo = (next(it) for _ in range(7))
        nh, hd = cfg["heads"], cfg["head_dim"]
        y = ln(cur, ln1_s, ln1_b)
        q = dot(y, wq[:])
        k = dot(y, wk[:])
        v = dot(y, wv[:])
        # Frame-axis attention as a masked dense matmul per head. Mosaic
        # cannot split the lane dim into (heads, head_dim), and tiny batched
        # (f x f) dots waste the MXU pipeline — instead each head runs one
        # dense (R, R) = (f*ts, f*ts) QK^T; rows r and columns j attend iff
        # they share a spatial position (r % ts == j % ts). The ~ts-fold extra
        # scores are cheap dense MXU work (<1 ms across the whole UNet).
        r = f * ts
        rm = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0) % ts
        cm = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1) % ts
        valid = rm == cm
        neg = jnp.float32(-1e30)
        outs = []
        for h in range(nh):
            sl = slice(h * hd, (h + 1) * hd)
            logits = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cdtype) * (hd ** -0.5)
            lf = jnp.where(valid, logits.astype(jnp.float32), neg)
            probs = jax.nn.softmax(lf, axis=-1).astype(cdtype)
            outs.append(dot(probs, v[:, sl]))
        o = jnp.concatenate(outs, axis=-1)
        cur = cur + dot(o, wo[:]) + bo[0]
        if cfg["has_cross"]:
            cb = next(it)
            cur = (cur.reshape(f, ts, c) + cb[0][None]).reshape(f * ts, c)

    if "ff" in parts:
        ln3_s, ln3_b, wg, bg, w2, b2 = (next(it) for _ in range(6))
        y = geglu_ff(ln(cur, ln3_s, ln3_b), wg, bg, w2, b2)
        cur = y + cur if cfg["is_res"] else y

    out_ref[0] = cur.reshape(f, ts, c)


def _part_weight_bytes(c, ia, iff, itemsize):
    return {
        "ffin": (c * 2 * iff + 2 * iff + iff * c + c) * itemsize,
        "attn": (3 * c * ia + ia * c + c) * itemsize,
        "ff": (c * 2 * iff + 2 * iff + iff * c + c) * itemsize,
    }


def _plan(parts, c, ia, iff, s, f, itemsize):
    """Group consecutive parts into pallas_call groups fitting the weight
    budget, and pick a spatial tile TS. Returns (groups, ts) or None."""
    sizes = _part_weight_bytes(c, ia, iff, itemsize)
    if any(sizes[p] > _WEIGHT_BUDGET for p in parts):
        return None
    groups = []
    cur, cur_bytes = [], 0
    for part in parts:
        if cur and cur_bytes + sizes[part] > _WEIGHT_BUDGET:
            groups.append(tuple(cur))
            cur, cur_bytes = [], 0
        cur.append(part)
        cur_bytes += sizes[part]
    if cur:
        groups.append(tuple(cur))

    def act_bytes(group, cand):
        # per-row fp32 LN copy + part-specific intermediates
        a = f * cand * 4 * c
        if "attn" in group:
            # q/k/v/out rows + (f*ts, f*ts) mask + fp32 logits (+copies)
            a += f * cand * 6 * max(c, ia) * itemsize
            a += 10 * (f * cand) ** 2
        if "ffin" in group or "ff" in group:
            a += f * cand * 4 * iff * itemsize
        return a

    force_ts = int(os.environ.get("CTRL_ADAPTER_FT_TS", "0"))
    if force_ts and s % force_ts == 0:
        return groups, force_ts
    ts = None
    for cand in (64, 32, 16, 8):
        if s % cand:
            continue
        worst = max(sum(sizes[p] for p in g) + act_bytes(g, cand) for g in groups)
        if worst <= _VMEM_BUDGET:
            ts = cand
            break
    if ts is None:
        return None
    return groups, ts


_PART_KEYS = {
    "ffin": ("lnin_s", "lnin_b", "ffin_wg", "ffin_bg", "ffin_w2", "ffin_b2"),
    "attn": ("ln1_s", "ln1_b", "wq", "wk", "wv", "wo", "bo"),
    "ff": ("ln3_s", "ln3_b", "ff_wg", "ff_bg", "ff_w2", "ff_b2"),
}


def _pallas_temporal_block(x, cross_bias, p, cfg, groups, ts, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, f, s, c = x.shape
    grid = (b, s // ts)
    cur = x
    for group in groups:
        gcfg = dict(cfg, parts=group, f=f, ts=ts,
                    has_cross=cfg["has_cross"] and "attn" in group)
        operands = [cur]
        in_specs = [pl.BlockSpec((1, f, ts, c), lambda ib, is_: (ib, 0, is_, 0),
                                 memory_space=pltpu.VMEM)]

        def w_spec(arr):
            shape = arr.shape
            if arr.ndim == 1:
                arr = arr.reshape(1, -1)
                shape = arr.shape
            nd = len(shape)
            return arr, pl.BlockSpec(
                shape, lambda ib, is_, _n=nd: (0,) * _n, memory_space=pltpu.VMEM)

        for part in group:
            for key in _PART_KEYS[part]:
                arr, spec = w_spec(p[key])
                operands.append(arr)
                in_specs.append(spec)
            if part == "attn" and gcfg["has_cross"]:
                operands.append(cross_bias)
                in_specs.append(pl.BlockSpec(
                    (1, ts, c), lambda ib, is_: (ib, is_, 0),
                    memory_space=pltpu.VMEM))

        cur = pl.pallas_call(
            functools.partial(_kernel, cfg=gcfg),
            out_shape=jax.ShapeDtypeStruct((b, f, s, c), x.dtype),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, f, ts, c), lambda ib, is_: (ib, 0, is_, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(*operands)
    return cur


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------

_CFG_FIELDS = ("parts", "is_res", "has_cross", "heads", "head_dim", "eps",
               "approximate")


def dispatch_mode(b, f, s, c, ia, iff, dtype) -> Optional[str]:
    """How to run a (b, f, s, c) temporal block with attention inner dim ia
    and FF inner dim iff:

    - "full":   the whole block fits one pallas_call (measured 1.66x vs XLA at
      width 320) — multi-call splits measured a net LOSS (0.83x at width 512),
      so they are never dispatched;
    - "hybrid": attention sub-block (LN1 -> QKV -> frame attn -> out -> +res
      -> +cross bias) as one kernel, GEGLU FFs stay XLA on the transpose-free
      (b, f, s, c) layout;
    - None:     XLA path.
    """
    mode_env = os.environ.get("CTRL_ADAPTER_FT_MODE", "auto")
    if not _on_tpu() or mode_env == "off":
        return None
    if dtype != jnp.bfloat16 or f > 32:
        return None
    itemsize = jnp.dtype(dtype).itemsize
    if mode_env in ("full", "hybrid"):
        parts = ("ffin", "attn", "ff") if mode_env == "full" else ("attn",)
        return mode_env if _plan(parts, c, ia, iff, s, f, itemsize) else None
    full = _plan(("ffin", "attn", "ff"), c, ia, iff, s, f, itemsize)
    if full is not None and len(full[0]) == 1:
        return "full"
    if _plan(("attn",), c, ia, iff, s, f, itemsize) is not None:
        return "hybrid"
    return None


def eligible(b, f, s, c, ia, iff, dtype) -> bool:
    return dispatch_mode(b, f, s, c, ia, iff, dtype) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def temporal_block(x, cross_bias, params, cfg_tuple, force_pallas=None):
    """Whole TemporalBasicTransformerBlock on (b, f, s, c) activations.

    cfg_tuple: tuple of (parts, is_res, has_cross, heads, head_dim, eps,
    approximate) — hashable for custom_vjp.
    """
    cfg = dict(zip(_CFG_FIELDS, cfg_tuple))
    b, f, s, c = x.shape
    ia = cfg["heads"] * cfg["head_dim"]
    if "ff_w2" in params:
        iff = params["ff_w2"].shape[0]
    elif "ffin_w2" in params:
        iff = params["ffin_w2"].shape[0]
    else:
        iff = 4 * c
    itemsize = jnp.dtype(x.dtype).itemsize
    plan = _plan(cfg["parts"], c, ia, iff, s, f, itemsize)
    use = force_pallas if force_pallas is not None else (_on_tpu() and plan is not None)
    if use and plan is not None:
        groups, ts = plan
        return _pallas_temporal_block(x, cross_bias, params, cfg, groups, ts,
                                      interpret=not _on_tpu())
    return _xla_temporal_block(x, cross_bias, params, cfg)


def _fwd(x, cross_bias, params, cfg_tuple, force_pallas):
    out = temporal_block(x, cross_bias, params, cfg_tuple, force_pallas)
    return out, (x, cross_bias, params)


def _bwd(cfg_tuple, force_pallas, res, g):
    x, cross_bias, params = res
    cfg = dict(zip(_CFG_FIELDS, cfg_tuple))
    if cross_bias is None:
        _, vjp = jax.vjp(lambda xx, pp: _xla_temporal_block(xx, None, pp, cfg),
                         x, params)
        dx, dp = vjp(g)
        return dx, None, dp
    _, vjp = jax.vjp(lambda xx, cb, pp: _xla_temporal_block(xx, cb, pp, cfg),
                     x, cross_bias, params)
    return vjp(g)


temporal_block.defvjp(_fwd, _bwd)
