"""Fused GroupNorm(+SiLU) Pallas kernel: parity vs flax.linen.GroupNorm math
(forward, interpret mode on CPU) and gradient correctness of the custom VJP."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_adapter_tpu.ops.group_norm import _xla_group_norm_silu, group_norm_silu


def _flax_reference(x, scale, bias, groups, eps, silu):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32)
    y = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 320), 32), ((2, 4, 4, 256), 32)])
@pytest.mark.parametrize("silu", [False, True])
def test_pallas_matches_flax(shape, groups, silu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32) * 0.5 + 1.0
    bias = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32) * 0.1

    got = group_norm_silu(x, scale, bias, groups, 1e-6, silu, use_pallas=True)
    want = _flax_reference(x, scale, bias, groups, 1e-6, silu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_xla_fallback_matches_flax_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 64)), jnp.bfloat16)
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)
    got = group_norm_silu(x, scale, bias, 32, 1e-5, True, use_pallas=False)
    want = _flax_reference(x, scale, bias, 32, 1e-5, True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )


def test_custom_vjp_matches_flax_grads():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 64)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(64), jnp.float32) * 0.3 + 1.0
    bias = jnp.asarray(rng.standard_normal(64), jnp.float32) * 0.1

    def loss_fused(x, s, b):
        return jnp.sum(group_norm_silu(x, s, b, 32, 1e-6, True, use_pallas=True) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(_flax_reference(x, s, b, 32, 1e-6, True) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_temporal_5d_stats_per_sample():
    """(b, f, h, w, c) GroupNorm must reduce over (f, h, w, group) per sample —
    matching torch GroupNorm on (b, c, f, h, w)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 4, 64)), jnp.float32)
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)
    got = group_norm_silu(x, scale, bias, 32, 1e-6, False, use_pallas=True)
    want = _flax_reference(x, scale, bias, 32, 1e-6, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
