"""Flash attention dispatch for TPU (Pallas kernel) with XLA fallback.

The hot attention in this framework is the per-frame *spatial* self-attention of the
UNets: seq = (h/8 * w/8) tokens — 4096 at 512^2 video, 16384 at SDXL 1024^2 — at
head_dim 64, CFG batch 2 x frames. Materialising the (seq, seq) logits in HBM is the
dominant bandwidth cost (SURVEY §7 step 9); the Pallas flash kernel streams K/V tiles
through VMEM instead.

Dispatch rule: use the Pallas TPU flash kernel when
- running on TPU,
- self-attention (q_seq == kv_seq), seq >= MIN_SEQ and divisible by the block size,
- head_dim is MXU-friendly (64 or 128).
Everything else (cross-attention over 77 text tokens, temporal attention over <=16
frames, VAE single-head) goes through ``jax.nn.dot_product_attention`` — XLA already
fuses those small chains well.

Enabled by default on TPU; set CTRL_ADAPTER_NO_FLASH=1 to force the XLA path.
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp

MIN_SEQ = 1024
_BLOCK = 512

# Trace-time flag: inside a differentiated train step the kernel's forward also
# saves l/m residuals (f32[b,n,t,128] each) and the bq 2048 / bkv 1024 blocks
# overflow the 16 MB scoped-VMEM stack at the adapter's (8,5,4096,64) shapes
# (measured: 18.88M > 16.00M, r4 bench_matrix_log). Under grad we drop every
# block-size slot to 512 — the residual-saving forward and the dkv/dq backward
# kernels then fit. Inference keeps the measured-faster 2048/1024 blocks.
_GRAD_SAFE = False


@contextlib.contextmanager
def grad_safe_blocks():
    """Use VMEM-safe 512-block flash attention (for differentiated callers).

    Trace-time state: wrap the region whose trace should use the small blocks
    (e.g. the body of a jitted train step) — not the runtime call site.
    """
    global _GRAD_SAFE
    prev = _GRAD_SAFE
    _GRAD_SAFE = True
    try:
        yield
    finally:
        _GRAD_SAFE = prev


def _flash_available() -> bool:
    # NOT cached: entry points may switch jax_platforms (cpu dryruns/tests) after
    # import — dispatch must track the current default backend.
    if os.environ.get("CTRL_ADAPTER_NO_FLASH") == "1":
        return False
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention  # noqa: F401
    except Exception:
        return False
    from .backend import is_tpu_backend

    return is_tpu_backend()


def _eligible(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    b, tq, n, h = q.shape
    tk = k.shape[1]
    return (
        tq == tk
        and tq >= MIN_SEQ
        and tq % _BLOCK == 0
        and h in (64, 128)
    )


def flash_eligible(tq: int, tk: int, head_dim: int) -> bool:
    """True when these (static) attention dims would dispatch to the Pallas
    flash kernel on the current backend. Callers that know this at trace time
    can build q/k/v directly in the kernel's (B, N, T, H) layout and call
    :func:`attention_bnth`, skipping the four head-split transposes the
    (B, T, N, H) entry point pays."""
    return (
        _flash_available()
        and tq == tk
        and tq >= MIN_SEQ
        and tq % _BLOCK == 0
        and head_dim in (64, 128)
    )


def attention_bnth(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Flash attention over kernel-native (B, N, T, H) tensors.

    Use together with :func:`flash_eligible`; eligibility is NOT re-checked.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    # measured on v5e at the video shapes (B=28, T=4096, H=64): bq 2048 /
    # bk 1024 runs ~14% faster than 512/512; larger blocks fail to compile
    # (VMEM) on this part. Under grad (residual-saving forward + dq/dkv
    # backward) only 512/512 fits scoped VMEM — see grad_safe_blocks().
    if _GRAD_SAFE:
        bq = bkv = 512
    else:
        bq = next(bb for bb in (2048, 1024, 512) if q.shape[2] % bb == 0)
        bkv = next(bb for bb in (1024, 512) if k.shape[2] % bb == 0)
    sizes = BlockSizes(
        block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkv,
        block_k_dkv=bkv, block_q_dkv=bq,
        block_k_major_dq=bkv, block_k_dq=bkv, block_q_dq=bq,
    )
    return flash_attention(
        q, k, v, causal=False, sm_scale=1.0 / (q.shape[-1] ** 0.5),
        block_sizes=sizes,
    )


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(B, T, N, H) attention; flash kernel on TPU for large self-attention.

    Note: packing tiny-seq (frames) attention g-groups-per-MXU-tile under a
    block-diagonal mask was tried and REVERTED — the g^2-fold larger fp32
    softmax dominates (3.8 ms vs 2.1 ms unpacked at (8192, 14, 5, 64) on v5e).
    """
    tk = k.shape[1]
    if tk == 1:
        # Single-key attention is exact identity over V: softmax of one logit
        # is 1 regardless of scale (SVD/I2VGen temporal cross-attention and all
        # Ctrl-Adapter cross-attention run against a 1-token image context —
        # skip QK^T entirely).
        return jnp.broadcast_to(v, q.shape[:2] + v.shape[2:]).astype(v.dtype)
    if q.shape[1] <= 32 and tk <= 32:
        # tiny-seq (temporal/frame) attention: a direct einsum chain measures
        # ~25% faster than jax.nn.dot_product_attention at (8192, 14, 5, 64)
        # on v5e (1.54 vs 2.06 ms). Softmax stays fp32; logits carry the input
        # dtype (bf16 under mixed precision — the same quantization the torch
        # reference accepts from fp16 SDPA).
        scale = q.shape[-1] ** -0.5
        s = jnp.einsum("btnh,bsnh->bnts", q, k) * scale
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
        return jnp.einsum("bnts,bsnh->btnh", p, v)
    if _flash_available() and _eligible(q, k):
        # kernel layout: (B, N, T, H)
        out = attention_bnth(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3))
        return out.transpose(0, 2, 1, 3)
    return jax.nn.dot_product_attention(q, k, v)
