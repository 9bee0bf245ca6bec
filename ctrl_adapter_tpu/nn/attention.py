"""Attention / transformer blocks (TPU-native, batch-seq-channel layout).

Re-implements the behavior of diffusers' ``Attention``, ``FeedForward`` (GEGLU),
``BasicTransformerBlock`` and ``TemporalBasicTransformerBlock`` as used by the
reference adapter (`model/adapter_spatial_temporal.py:106-130`) and the UNets /
ControlNet towers. Design differences from the torch reference:

- sequences stay channel-last; QKV projections run in bf16 on the MXU with fp32 softmax
  accumulation via ``jax.nn.dot_product_attention``;
- no attention processors / xformers plumbing: XLA fuses the (QK^T -> softmax -> V)
  chain, and a Pallas flash-attention kernel can be swapped in via
  ``ctrl_adapter_tpu.ops.flash_attention`` for long sequences.

Torch param-name layout is preserved (``to_q``, ``to_k``, ``to_v``, ``to_out_0``,
``ff.net_0.proj`` …) so HF checkpoints convert mechanically.
"""

from __future__ import annotations

import os

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .embeddings import TimestepEmbedding, Timesteps  # noqa: F401  (re-export convenience)


def _sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, upcast: bool = False) -> jnp.ndarray:
    """Scaled dot-product attention over (B, T, N, H) tensors.

    Large spatial self-attention routes to the Pallas TPU flash kernel
    (ops/flash_attention.py); small/cross attention uses XLA's fused path.
    """
    from ..ops.flash_attention import dot_product_attention

    if upcast:
        q, k, v = q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    return dot_product_attention(q, k, v)


class _IPProjections(nn.Module):
    """IP-Adapter key/value projections, named to match diffusers' loaded layout
    ``...attn2.processor.to_k_ip.0.weight`` -> ``processor/to_k_ip_0/kernel``."""

    inner_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ip_hidden_states: jnp.ndarray):
        dense = lambda name: nn.Dense(  # noqa: E731
            self.inner_dim, use_bias=False, name=name,
            dtype=self.dtype, param_dtype=self.param_dtype)
        return dense("to_k_ip_0")(ip_hidden_states), dense("to_v_ip_0")(ip_hidden_states)


class Attention(nn.Module):
    """Multi-head attention with optional cross-attention context.

    Mirrors diffusers ``Attention`` numerics: bias-free QKV, biased output proj,
    scale = head_dim ** -0.5 (the default inside dot_product_attention).

    ``ip_hidden_states`` enables the IP-Adapter branch (diffusers
    ``IPAdapterAttnProcessor``, reached through the reference's
    ``ip_adapter_image_embeds`` plumbing at `sdxl_...py:1354-1360`): extra
    bias-free K/V projections over the image tokens, attended with the same
    queries, added to the text-attention output with ``ip_scale`` before
    ``to_out``.
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: Optional[int] = None
    upcast_attention: bool = False
    out_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        ip_hidden_states: Optional[jnp.ndarray] = None,
        ip_scale: float = 1.0,
    ) -> jnp.ndarray:
        inner_dim = self.heads * self.dim_head
        context = hidden_states if encoder_hidden_states is None else encoder_hidden_states

        from ..ops.flash_attention import attention_bnth, flash_eligible

        if (
            encoder_hidden_states is None
            and ip_hidden_states is None
            and not self.upcast_attention
            and flash_eligible(hidden_states.shape[1], hidden_states.shape[1], self.dim_head)
        ):
            # Flash-bound self-attention: build q/k/v directly in the kernel's
            # (B, N, T, H) layout by folding the head split into the projection
            # einsums and the head merge into the output projection. XLA then
            # emits kernel-layout operands in place of four standalone
            # (B,T,N,H)<->(B,N,T,H) HBM copies — measured 12.23 -> 11.47 ms for
            # the whole proj+attn+out module at (28, 4096, 320) on v5e
            # (tools/sweep_flash.py --module). Params stay nn.Dense-identical
            # (to_q/to_k/to_v/to_out_0) so checkpoints convert unchanged.
            x = hidden_states.astype(self.dtype)
            proj_w = lambda name: _DenseParams(  # noqa: E731
                inner_dim, name=name, use_bias=False,
                param_dtype=self.param_dtype,
            )(x.shape[-1])[0].reshape(
                x.shape[-1], self.heads, self.dim_head).astype(self.dtype)
            q = jnp.einsum("btc,cnh->bnth", x, proj_w("to_q"))
            k = jnp.einsum("btc,cnh->bnth", x, proj_w("to_k"))
            v = jnp.einsum("btc,cnh->bnth", x, proj_w("to_v"))
            out = attention_bnth(q, k, v).astype(self.dtype)
            wo, bo = _DenseParams(
                self.query_dim, name="to_out_0", use_bias=self.out_bias,
                param_dtype=self.param_dtype,
            )(inner_dim)
            out = jnp.einsum(
                "bnth,nhd->btd", out,
                wo.reshape(self.heads, self.dim_head, -1).astype(self.dtype))
            if bo is not None:
                out = out + bo.astype(self.dtype)
            return out

        dense = lambda name: nn.Dense(  # noqa: E731
            inner_dim, use_bias=False, name=name, dtype=self.dtype, param_dtype=self.param_dtype
        )
        q = dense("to_q")(hidden_states)
        k = dense("to_k")(context)
        v = dense("to_v")(context)

        b, tq = q.shape[0], q.shape[1]
        tk = k.shape[1]
        q = q.reshape(b, tq, self.heads, self.dim_head)
        k = k.reshape(b, tk, self.heads, self.dim_head)
        v = v.reshape(b, tk, self.heads, self.dim_head)

        out = _sdpa(q, k, v, upcast=self.upcast_attention).astype(hidden_states.dtype)
        out = out.reshape(b, tq, inner_dim)

        if ip_hidden_states is not None:
            k_ip, v_ip = _IPProjections(
                inner_dim, name="processor", dtype=self.dtype, param_dtype=self.param_dtype
            )(ip_hidden_states)
            t_ip = k_ip.shape[1]
            k_ip = k_ip.reshape(b, t_ip, self.heads, self.dim_head)
            v_ip = v_ip.reshape(b, t_ip, self.heads, self.dim_head)
            ip_out = _sdpa(q, k_ip, v_ip, upcast=self.upcast_attention).astype(out.dtype)
            out = out + ip_scale * ip_out.reshape(b, tq, inner_dim)

        out = nn.Dense(
            self.query_dim,
            use_bias=self.out_bias,
            name="to_out_0",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(out)
        return out


class _DenseParams(nn.Module):
    """Creates nn.Dense-identical params (``kernel``/``bias``, same inits)
    without binding them to a matmul — so ops can consume them fused."""

    features: int
    param_dtype: jnp.dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features), self.param_dtype)
        if not self.use_bias:
            return kernel, None
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return kernel, bias


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.fused_ff import geglu

        kernel, bias = _DenseParams(
            self.dim_out * 2, name="proj", param_dtype=self.param_dtype
        )(x.shape[-1])
        # erf-gelu costs 6.5x tanh-gelu on the v5e VPU (2.14 vs 0.33 ms per
        # 147M activations) and the difference (<1e-3 relative) is below bf16
        # quantization noise, so bf16 compute uses the tanh form; fp32 (the
        # golden-parity test configuration) keeps the exact diffusers math.
        # CTRL_ADAPTER_EXACT_GELU=1 forces exact everywhere. On TPU the whole
        # projection+gate fuses into a Pallas kernel that never writes the
        # 2x-wide intermediate to HBM (ops/fused_ff.py).
        approx = self.dtype == jnp.bfloat16 and os.environ.get(
            "CTRL_ADAPTER_EXACT_GELU") != "1"
        return geglu(x, kernel, bias, approximate=approx, dtype=self.dtype)


class FeedForward(nn.Module):
    """GEGLU feed-forward: Linear(dim, 4*dim*2) -> geglu -> Linear(4*dim, dim_out).

    Torch layout: ``net.0.proj`` (GEGLU), ``net.2`` (output Linear); flax names
    ``net_0``/``net_2`` map 1:1.
    """

    dim_out: Optional[int] = None
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = x.shape[-1] * self.mult
        out_dim = self.dim_out or x.shape[-1]
        x = GEGLU(inner, name="net_0", dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = nn.Dense(out_dim, name="net_2", dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return x


class _LNParams(nn.Module):
    """LayerNorm-identical params (``scale``/``bias``) without the compute."""

    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          self.param_dtype)
        return scale, bias


class _AttnParams(nn.Module):
    """Attention-identical params (to_q/to_k/to_v/to_out_0) without the
    compute — same names and inits as ``Attention``."""

    query_dim: int
    inner: int
    kv_dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        dp = lambda feats, name, bias: _DenseParams(  # noqa: E731
            feats, name=name, param_dtype=self.param_dtype, use_bias=bias)
        wq, _ = dp(self.inner, "to_q", False)(self.query_dim)
        wk, _ = dp(self.inner, "to_k", False)(self.kv_dim)
        wv, _ = dp(self.inner, "to_v", False)(self.kv_dim)
        wo, bo = dp(self.query_dim, "to_out_0", True)(self.inner)
        return wq, wk, wv, wo, bo


class _GEGLUParams(nn.Module):
    """GEGLU-identical params (``proj`` Dense) without the compute."""

    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        return _DenseParams(self.features, name="proj",
                            param_dtype=self.param_dtype)(in_features)


class _FFParams(nn.Module):
    """FeedForward-identical params (net_0.proj + net_2) without the compute."""

    dim_out: int
    mult: int = 4
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        inner = in_features * self.mult
        kg, bg = _GEGLUParams(inner * 2, name="net_0",
                              param_dtype=self.param_dtype)(in_features)
        k2, b2 = _DenseParams(self.dim_out, name="net_2",
                              param_dtype=self.param_dtype)(inner)
        return kg, bg, k2, b2


def _ln_ff(x: jnp.ndarray, ln_name: str, ff_name: str, dim_out: int,
           residual: bool, dtype, param_dtype) -> jnp.ndarray:
    """LayerNorm -> GEGLU FF (+residual) through the whole-sub-block Pallas
    kernel (ops/fused_block.py); params keep the exact ``normX``/``ff`` names so
    checkpoints convert unchanged."""
    from ..ops.fused_block import ln_ff_residual

    c = x.shape[-1]
    ln_scale, ln_bias = _LNParams(name=ln_name, param_dtype=param_dtype)(c)
    kg, bg, k2, b2 = _FFParams(dim_out, name=ff_name, param_dtype=param_dtype)(c)
    approx = dtype == jnp.bfloat16 and os.environ.get(
        "CTRL_ADAPTER_EXACT_GELU") != "1"
    return ln_ff_residual(
        x, ln_scale, ln_bias, kg.astype(dtype), bg.astype(dtype),
        k2.astype(dtype), b2.astype(dtype),
        1e-5, approx, residual, dtype)


class BasicTransformerBlock(nn.Module):
    """LayerNorm-sandwiched self-attn, cross-attn, GEGLU FF with residuals.

    Parity target: diffusers ``BasicTransformerBlock`` (layer_norm variant) as used at
    `model/adapter_spatial_temporal.py:108-116` and inside SD ControlNet / UNet
    transformer stacks.
    """

    dim: int
    num_attention_heads: int
    attention_head_dim: int
    cross_attention_dim: Optional[int] = None
    only_cross_attention: bool = False
    upcast_attention: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        ip_hidden_states: Optional[jnp.ndarray] = None,
        ip_scale: float = 1.0,
    ) -> jnp.ndarray:
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=1e-5, name=name, dtype=self.dtype, param_dtype=self.param_dtype
        )
        attn = lambda name, cross_dim: Attention(  # noqa: E731
            query_dim=self.dim,
            heads=self.num_attention_heads,
            dim_head=self.attention_head_dim,
            cross_attention_dim=cross_dim,
            upcast_attention=self.upcast_attention,
            name=name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

        # 1. self-attention (or pure cross-attention when only_cross_attention).
        norm_hidden = ln("norm1")(hidden_states)
        ctx = encoder_hidden_states if self.only_cross_attention else None
        hidden_states = attn("attn1", self.cross_attention_dim if self.only_cross_attention else None)(
            norm_hidden, ctx
        ) + hidden_states

        # 2. cross-attention (+ optional IP-Adapter image-token branch).
        if self.cross_attention_dim is not None and not self.only_cross_attention:
            norm_hidden = ln("norm2")(hidden_states)
            hidden_states = attn("attn2", self.cross_attention_dim)(
                norm_hidden, encoder_hidden_states,
                ip_hidden_states=ip_hidden_states, ip_scale=ip_scale,
            ) + hidden_states

        # 3. feed-forward: whole LN->GEGLU->proj->+res sub-block as one kernel.
        hidden_states = _ln_ff(
            hidden_states, "norm3", "ff", self.dim, residual=True,
            dtype=self.dtype, param_dtype=self.param_dtype)
        return hidden_states


class TemporalBasicTransformerBlock(nn.Module):
    """Per-pixel temporal transformer over the frame axis.

    Parity target: diffusers ``TemporalBasicTransformerBlock``
    (`model/adapter_spatial_temporal.py:119-130`, SVD/I2VGen temporal attention).
    Input is (batch*frames, seq, dim); internally reshaped to (batch*seq, frames, dim)
    so attention runs over <=16 frame tokens.
    """

    dim: int
    time_mix_inner_dim: int
    num_attention_heads: int
    attention_head_dim: int
    cross_attention_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _fused_kernel_call(
        self, hidden_states, num_frames, encoder_hidden_states, mode
    ) -> jnp.ndarray:
        """Whole-block Pallas path (ops/fused_temporal.py): consumes the native
        (b*f, s, c) layout — the two (b*f,s,c)<->(b*s,f,c) HBM transposes and
        every intermediate round trip disappear. Creates the exact same param
        tree as the XLA path (including the dead norm2/to_q/to_k of single-key
        cross-attention) so checkpoints convert unchanged."""
        from ..ops import fused_temporal as ft

        tmid = self.time_mix_inner_dim
        batch_frames, seq_length, channels = hidden_states.shape
        batch_size = batch_frames // num_frames
        dtype = self.dtype
        has_cross = self.cross_attention_dim is not None

        p = {}
        p["lnin_s"], p["lnin_b"] = _LNParams(
            name="norm_in", param_dtype=self.param_dtype)(channels)
        kg, bg, k2, b2 = _FFParams(
            tmid, name="ff_in", param_dtype=self.param_dtype)(channels)
        p["ffin_wg"], p["ffin_bg"] = kg.astype(dtype), bg.astype(dtype)
        p["ffin_w2"], p["ffin_b2"] = k2.astype(dtype), b2.astype(dtype)

        inner = self.num_attention_heads * self.attention_head_dim
        p["ln1_s"], p["ln1_b"] = _LNParams(
            name="norm1", param_dtype=self.param_dtype)(tmid)
        wq, wk, wv, wo, bo = _AttnParams(
            tmid, inner, tmid, name="attn1", param_dtype=self.param_dtype)()
        p["wq"], p["wk"], p["wv"] = (w.astype(dtype) for w in (wq, wk, wv))
        p["wo"], p["bo"] = wo.astype(dtype), bo.astype(dtype)

        cross_bias = None
        if has_cross:
            # single-key cross-attention == to_out(to_v(ctx)) broadcast over
            # frames; norm2/to_q/to_k params exist but are dead (the XLA path
            # DCEs the identical computation).
            _LNParams(name="norm2", param_dtype=self.param_dtype)(tmid)
            _, _, wv2, wo2, bo2 = _AttnParams(
                tmid, inner, self.cross_attention_dim, name="attn2",
                param_dtype=self.param_dtype)()
            ctx = encoder_hidden_states[:, 0].astype(dtype)  # (b*s, d)
            v = ctx @ wv2.astype(dtype)
            bias_rows = v @ wo2.astype(dtype) + bo2.astype(dtype)
            cross_bias = bias_rows.reshape(batch_size, seq_length, tmid)

        p["ln3_s"], p["ln3_b"] = _LNParams(
            name="norm3", param_dtype=self.param_dtype)(tmid)
        kg, bg, k2, b2 = _FFParams(
            tmid, name="ff", param_dtype=self.param_dtype)(tmid)
        p["ff_wg"], p["ff_bg"] = kg.astype(dtype), bg.astype(dtype)
        p["ff_w2"], p["ff_b2"] = k2.astype(dtype), b2.astype(dtype)

        approx = dtype == jnp.bfloat16 and os.environ.get(
            "CTRL_ADAPTER_EXACT_GELU") != "1"
        heads_hd = (self.num_attention_heads, self.attention_head_dim)
        x4 = hidden_states.reshape(batch_size, num_frames, seq_length, channels)
        if mode == "full":
            cfg_tuple = (("ffin", "attn", "ff"), True, has_cross,
                         *heads_hd, 1e-5, approx)
            out = ft.temporal_block(x4, cross_bias, p, cfg_tuple, None)
        else:
            # hybrid: attention sub-block as the kernel; GEGLU FFs stay XLA but
            # on the transpose-free (b, f, s, c) layout (rowwise ops).
            base = dict(is_res=True, has_cross=False, heads=heads_hd[0],
                        head_dim=heads_hd[1], eps=1e-5, approximate=approx)
            cur = ft._xla_temporal_block(
                x4, None, p, dict(base, parts=("ffin",)))
            cfg_attn = (("attn",), True, has_cross, *heads_hd, 1e-5, approx)
            cur = ft.temporal_block(cur, cross_bias, p, cfg_attn, None)
            out = ft._xla_temporal_block(
                cur, None, p, dict(base, parts=("ff",)))
        return out.reshape(batch_frames, seq_length, channels)

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        num_frames: int,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        is_res = self.dim == self.time_mix_inner_dim
        batch_frames, seq_length, channels = hidden_states.shape
        batch_size = batch_frames // num_frames

        from ..ops import fused_temporal as ft

        inner = self.num_attention_heads * self.attention_head_dim
        ctx = encoder_hidden_states
        ctx_ok = (self.cross_attention_dim is None and ctx is None) or (
            self.cross_attention_dim is not None
            and ctx is not None
            and ctx.ndim == 3
            and ctx.shape[1] == 1
            and ctx.shape[0] == batch_size * seq_length
        )
        mode = ft.dispatch_mode(
            batch_size, num_frames, seq_length, self.time_mix_inner_dim,
            inner, 4 * self.time_mix_inner_dim, self.dtype)
        if (
            is_res
            and channels == self.dim == self.time_mix_inner_dim
            and ctx_ok
            and mode is not None
        ):
            return self._fused_kernel_call(hidden_states, num_frames, ctx, mode)

        # (b*f, s, c) -> (b*s, f, c): frames become the attention sequence.
        hidden_states = hidden_states.reshape(batch_size, num_frames, seq_length, channels)
        hidden_states = hidden_states.transpose(0, 2, 1, 3)
        hidden_states = hidden_states.reshape(batch_size * seq_length, num_frames, channels)

        hidden_states = _ln_ff(
            hidden_states, "norm_in", "ff_in", self.time_mix_inner_dim,
            residual=is_res, dtype=self.dtype, param_dtype=self.param_dtype)

        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=1e-5, name=name, dtype=self.dtype, param_dtype=self.param_dtype
        )
        norm_hidden = ln("norm1")(hidden_states)
        hidden_states = Attention(
            query_dim=self.time_mix_inner_dim,
            heads=self.num_attention_heads,
            dim_head=self.attention_head_dim,
            name="attn1",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(norm_hidden) + hidden_states

        if self.cross_attention_dim is not None:
            norm_hidden = ln("norm2")(hidden_states)
            hidden_states = Attention(
                query_dim=self.time_mix_inner_dim,
                heads=self.num_attention_heads,
                dim_head=self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                name="attn2",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(norm_hidden, encoder_hidden_states) + hidden_states

        hidden_states = _ln_ff(
            hidden_states, "norm3", "ff", self.time_mix_inner_dim,
            residual=is_res, dtype=self.dtype, param_dtype=self.param_dtype)

        # (b*s, f, c) -> (b*f, s, c)
        hidden_states = hidden_states.reshape(batch_size, seq_length, num_frames, channels)
        hidden_states = hidden_states.transpose(0, 2, 1, 3)
        hidden_states = hidden_states.reshape(batch_frames, seq_length, channels)
        return hidden_states
