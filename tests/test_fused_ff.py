"""Fused GEGLU kernel parity: the Pallas path (interpret mode on CPU) must match
the XLA reference for both gelu forms, grads must flow, and the GEGLU module's
param tree must keep the nn.Dense-compatible proj/kernel+bias layout."""

import numpy as np

import jax
import jax.numpy as jnp

from ctrl_adapter_tpu.nn.attention import GEGLU
from ctrl_adapter_tpu.ops.fused_ff import geglu


def _data(m=512, c=64, d=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((m, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((c, 2 * d)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(2 * d) * 0.1, jnp.float32)
    return x, k, b


def test_pallas_matches_xla_reference():
    x, k, b = _data()
    for approx in (False, True):
        want = geglu(x, k, b, approx, None, use_pallas=False)
        got = geglu(x, k, b, approx, None, use_pallas=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_geglu_grads_flow():
    x, k, b = _data(m=256)
    loss = lambda xx, kk, bb: jnp.sum(geglu(xx, kk, bb, True, None, True) ** 2)
    gx, gk, gb = jax.grad(loss, argnums=(0, 1, 2))(x, k, b)
    ref = jax.grad(lambda xx, kk, bb: jnp.sum(
        geglu(xx, kk, bb, True, None, False) ** 2), argnums=(0, 1, 2))(x, k, b)
    for g, r in zip((gx, gk, gb), ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_geglu_module_param_layout_unchanged():
    mod = GEGLU(dim_out=16)
    params = mod.init(jax.random.PRNGKey(0), jnp.ones((4, 8)))
    leaf = params["params"]["proj"]
    assert leaf["kernel"].shape == (8, 32) and leaf["bias"].shape == (32,)
    out = mod.apply(params, jnp.ones((4, 8)))
    assert out.shape == (4, 16)


def test_ineligible_shapes_fall_back():
    # odd row count -> not divisible by the tile, must still be correct
    x, k, b = _data(m=130)
    want = geglu(x, k, b, False, None, use_pallas=False)
    got = geglu(x, k, b, False, None)  # auto: ineligible -> xla
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
