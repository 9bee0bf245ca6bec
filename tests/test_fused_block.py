"""Fused LN->GEGLU-FF->+res sub-block kernel: interpret-mode parity vs the XLA
reference, gradient flow through the custom VJP, and dispatch eligibility."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctrl_adapter_tpu.ops.fused_block import (
    _tiles,
    _xla_ln_ff_residual,
    ln_ff_residual,
)


def _inputs(m, c, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    inner = 4 * c
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))  # noqa: E731
    return (mk(m, c).astype(dtype) * 0.5, mk(c), mk(c) * 0.1,
            (mk(c, 2 * inner) * 0.05).astype(dtype),
            (mk(2 * inner) * 0.1).astype(dtype),
            (mk(inner, c) * 0.05).astype(dtype), (mk(c) * 0.1).astype(dtype))


@pytest.mark.parametrize("m,c", [(512, 320), (256, 128)])
@pytest.mark.parametrize("residual", [True, False])
def test_kernel_matches_reference(m, c, residual):
    x, lns, lnb, wg, bg, w2, b2 = _inputs(m, c)
    got = ln_ff_residual(x, lns, lnb, wg, bg, w2, b2, 1e-5, False, residual,
                         None, True)  # force pallas (interpret off-TPU)
    want = _xla_ln_ff_residual(x, lns, lnb, wg, bg, w2, b2, 1e-5, False,
                               residual, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_non_square_output_dim():
    """ff_in case: output width != input width (no residual)."""
    m, c, cout = 256, 128, 96
    rng = np.random.default_rng(1)
    inner = 4 * c
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))  # noqa: E731
    x, lns, lnb = mk(m, c) * 0.5, mk(c), mk(c) * 0.1
    wg, bg = mk(c, 2 * inner) * 0.05, mk(2 * inner) * 0.1
    w2, b2 = mk(inner, cout) * 0.05, mk(cout) * 0.1
    got = ln_ff_residual(x, lns, lnb, wg, bg, w2, b2, 1e-5, False, False,
                         None, True)
    want = _xla_ln_ff_residual(x, lns, lnb, wg, bg, w2, b2, 1e-5, False,
                               False, None)
    assert got.shape == (m, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_grads_flow_through_custom_vjp():
    x, lns, lnb, wg, bg, w2, b2 = _inputs(64, 128, seed=2)

    def loss(params):
        out = ln_ff_residual(x, params["s"], params["b"], params["wg"],
                             params["bg"], params["w2"], params["b2"])
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)({"s": lns, "b": lnb, "wg": wg, "bg": bg,
                            "w2": w2, "b2": b2})
    total = sum(float(jnp.abs(g).sum()) for g in grads.values())
    assert np.isfinite(total) and total > 0


def test_tiling_covers_all_unet_widths():
    for c in (320, 640, 1280):
        tiles = _tiles(4096, c, 4 * c, 2)
        assert tiles is not None, c
        tm, tn = tiles
        assert 4096 % tm == 0 and (4 * c) % tn == 0
