"""bf16 production-numerics coverage (VERDICT r1 weak #8).

The golden-parity suite pins fp32/highest; production (bench, inference) runs
bf16 compute, which flips dtype-dependent dispatch branches (tanh-gelu in GEGLU,
bf16 logits in the tiny-seq attention path). These tests run the SAME modules in
both dtypes and bound the divergence, so a bf16-only dispatch bug (wrong branch,
dtype-poisoned accumulator, fp16-range overflow) surfaces on the CPU suite.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctrl_adapter_tpu.nn.attention import BasicTransformerBlock
from ctrl_adapter_tpu.models.controlnet import ControlNetConfig, ControlNetModel
from .utils import eager_apply, fake_init

# bf16 has ~3 decimal digits; a few layers of accumulation -> percent-level drift
BF16_ATOL = 5e-2


def _cast(tree, dtype):
    return jax.tree.map(lambda x: x.astype(dtype), tree)


def test_transformer_block_bf16_close_to_fp32():
    """Runs the bf16 branch of GEGLU (tanh gelu) + bf16 attention; output must
    stay within bf16 quantization distance of the fp32 path."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 32)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((2, 7, 24)).astype(np.float32))

    block32 = BasicTransformerBlock(dim=32, num_attention_heads=4,
                                    attention_head_dim=8, cross_attention_dim=24)
    params = fake_init(block32, x, encoder_hidden_states=ctx)
    out32 = eager_apply(block32, params, x, encoder_hidden_states=ctx)

    block16 = BasicTransformerBlock(dim=32, num_attention_heads=4,
                                    attention_head_dim=8, cross_attention_dim=24,
                                    dtype=jnp.bfloat16)
    out16 = eager_apply(block16, params, x.astype(jnp.bfloat16),
                        encoder_hidden_states=ctx.astype(jnp.bfloat16))
    a32 = np.asarray(out32, np.float32)
    a16 = np.asarray(out16.astype(jnp.float32))
    assert np.isfinite(a16).all()
    scale = max(1.0, np.abs(a32).max())
    assert np.abs(a32 - a16).max() / scale < BF16_ATOL


def test_controlnet_tower_bf16_close_to_fp32():
    cfg = ControlNetConfig(
        block_out_channels=(32, 64, 96, 96), num_attention_heads=(4, 4, 4, 4),
        cross_attention_dim=24, conditioning_embedding_out_channels=(8, 8, 16, 16))
    rng = np.random.default_rng(1)
    sample = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    t = jnp.asarray([77.0])
    ehs = jnp.asarray(rng.standard_normal((1, 7, 24)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))

    m32 = ControlNetModel(config=cfg)
    params = fake_init(m32, sample, t, ehs, cond)
    downs32, mid32 = eager_apply(m32, params, sample, t, ehs, cond)

    m16 = ControlNetModel(config=cfg, dtype=jnp.bfloat16)
    downs16, mid16 = eager_apply(
        m16, _cast(params, jnp.bfloat16), sample.astype(jnp.bfloat16), t,
        ehs.astype(jnp.bfloat16), cond.astype(jnp.bfloat16))

    for a, b in zip(list(downs32) + [mid32], list(downs16) + [mid16]):
        a = np.asarray(a, np.float32)
        b = np.asarray(b.astype(jnp.float32))
        assert np.isfinite(b).all()
        scale = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() / scale < BF16_ATOL


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_tiny_seq_and_single_key_attention_paths(dtype):
    """The einsum tiny-seq path and the single-key shortcut must agree with the
    XLA reference in both production dtypes."""
    from ctrl_adapter_tpu.ops.flash_attention import dot_product_attention

    rng = np.random.default_rng(2)
    # tiny-seq: frames axis (seq 14 <= 32)
    q = jnp.asarray(rng.standard_normal((4, 14, 2, 16)).astype(np.float32), dtype)
    out = jax.jit(dot_product_attention)(q, q, q)
    ref = jax.jit(jax.nn.dot_product_attention)(
        q.astype(jnp.float32), q.astype(jnp.float32), q.astype(jnp.float32))
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(out.astype(jnp.float32)),
                               np.asarray(ref), atol=tol, rtol=tol)

    # single-key: softmax over one logit is 1 -> output == V broadcast
    k1 = jnp.asarray(rng.standard_normal((4, 1, 2, 16)).astype(np.float32), dtype)
    out1 = jax.jit(dot_product_attention)(q, k1, k1)
    want = jnp.broadcast_to(k1, q.shape[:2] + k1.shape[2:])
    np.testing.assert_allclose(np.asarray(out1.astype(jnp.float32)),
                               np.asarray(want.astype(jnp.float32)), atol=0)
