"""Fused whole-temporal-transformer-block kernel: XLA-mirror parity vs the
flax module, interpret-mode kernel parity vs the mirror, VJP gradient flow,
and split-planning across the production widths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctrl_adapter_tpu.nn.attention import TemporalBasicTransformerBlock
from ctrl_adapter_tpu.ops import fused_temporal as ft


def _module_and_params(b, f, s, c, nh, hd, cross_dim, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *sh: jnp.asarray(  # noqa: E731
        rng.standard_normal(sh).astype(np.float32))
    block = TemporalBasicTransformerBlock(
        dim=c, time_mix_inner_dim=c, num_attention_heads=nh,
        attention_head_dim=hd, cross_attention_dim=cross_dim)
    x = mk(b * f, s, c) * 0.5
    ctx = mk(b * s, 1, cross_dim) * 0.5 if cross_dim else None
    variables = block.init(jax.random.PRNGKey(seed), x, f,
                           encoder_hidden_states=ctx)
    # non-trivial weights (init gives zeros for biases / identity-ish scales)
    variables = jax.tree.map(
        lambda a: a + 0.03 * jnp.asarray(
            np.random.default_rng(1).standard_normal(a.shape).astype(np.float32)),
        variables)
    return block, variables, x, ctx


def _extract(params, cross_dim):
    """Flatten the module param tree into the op's weight dict."""
    p = {}
    p["lnin_s"], p["lnin_b"] = params["norm_in"]["scale"], params["norm_in"]["bias"]
    p["ffin_wg"] = params["ff_in"]["net_0"]["proj"]["kernel"]
    p["ffin_bg"] = params["ff_in"]["net_0"]["proj"]["bias"]
    p["ffin_w2"] = params["ff_in"]["net_2"]["kernel"]
    p["ffin_b2"] = params["ff_in"]["net_2"]["bias"]
    p["ln1_s"], p["ln1_b"] = params["norm1"]["scale"], params["norm1"]["bias"]
    p["wq"] = params["attn1"]["to_q"]["kernel"]
    p["wk"] = params["attn1"]["to_k"]["kernel"]
    p["wv"] = params["attn1"]["to_v"]["kernel"]
    p["wo"] = params["attn1"]["to_out_0"]["kernel"]
    p["bo"] = params["attn1"]["to_out_0"]["bias"]
    p["ln3_s"], p["ln3_b"] = params["norm3"]["scale"], params["norm3"]["bias"]
    p["ff_wg"] = params["ff"]["net_0"]["proj"]["kernel"]
    p["ff_bg"] = params["ff"]["net_0"]["proj"]["bias"]
    p["ff_w2"] = params["ff"]["net_2"]["kernel"]
    p["ff_b2"] = params["ff"]["net_2"]["bias"]
    extras = {}
    if cross_dim:
        extras["wv2"] = params["attn2"]["to_v"]["kernel"]
        extras["wo2"] = params["attn2"]["to_out_0"]["kernel"]
        extras["bo2"] = params["attn2"]["to_out_0"]["bias"]
    return p, extras


def _cross_bias(ctx, extras, b, s, c):
    if ctx is None:
        return None
    rows = ctx[:, 0] @ extras["wv2"] @ extras["wo2"] + extras["bo2"]
    return rows.reshape(b, s, c)


@pytest.mark.parametrize("cross_dim", [None, 96])
def test_mirror_matches_module(cross_dim):
    b, f, s, c, nh, hd = 2, 6, 32, 128, 2, 64
    block, variables, x, ctx = _module_and_params(b, f, s, c, nh, hd, cross_dim)
    want = block.apply(variables, x, f, encoder_hidden_states=ctx)
    p, extras = _extract(variables["params"], cross_dim)
    cfg = dict(parts=("ffin", "attn", "ff"), is_res=True,
               has_cross=cross_dim is not None, heads=nh, head_dim=hd,
               eps=1e-5, approximate=False)
    x4 = x.reshape(b, f, s, c)
    got = ft._xla_temporal_block(x4, _cross_bias(ctx, extras, b, s, c), p, cfg)
    np.testing.assert_allclose(
        np.asarray(got.reshape(b * f, s, c)), np.asarray(want),
        rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("cross_dim", [None, 96])
@pytest.mark.parametrize("nh,hd", [(2, 64), (5, 16)])
def test_kernel_matches_mirror_interpret(cross_dim, nh, hd):
    """Pallas kernel (interpret mode off-TPU) vs the XLA mirror — also covers
    the attention inner dim != block width case (5*16=80 != 128)."""
    b, f, s, c = 2, 6, 32, 128
    block, variables, x, ctx = _module_and_params(b, f, s, c, nh, hd, cross_dim,
                                                  seed=3)
    p, extras = _extract(variables["params"], cross_dim)
    cfg_tuple = (("ffin", "attn", "ff"), True, cross_dim is not None,
                 nh, hd, 1e-5, False)
    x4 = x.reshape(b, f, s, c)
    cb = _cross_bias(ctx, extras, b, s, c)
    got = ft.temporal_block(x4, cb, p, cfg_tuple, True)
    want = ft.temporal_block(x4, cb, p, cfg_tuple, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_module_dispatch_unchanged_params(monkeypatch):
    """The kernel path creates the *identical* param tree (names + shapes) as
    the XLA path, so checkpoints convert unchanged."""
    b, f, s, c, nh, hd = 1, 4, 16, 64, 1, 64
    block, variables, x, ctx = _module_and_params(b, f, s, c, nh, hd, 96)
    monkeypatch.setattr(ft, "dispatch_mode", lambda *a, **k: "full")
    kernel_vars = block.init(jax.random.PRNGKey(0), x, f,
                             encoder_hidden_states=ctx)
    want = jax.tree.map(jnp.shape, variables)
    got = jax.tree.map(jnp.shape, kernel_vars)
    assert want == got
    # and the two paths agree numerically (kernel falls back to the mirror
    # off-TPU, which test_mirror_matches_module pins to the real module)
    a = block.apply(variables, x, f, encoder_hidden_states=ctx)
    monkeypatch.undo()
    b_ = block.apply(variables, x, f, encoder_hidden_states=ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4,
                               atol=2e-4)


def test_grads_flow_through_custom_vjp():
    b, f, s, c, nh, hd = 1, 4, 16, 64, 1, 64
    _, variables, x, ctx = _module_and_params(b, f, s, c, nh, hd, None, seed=5)
    p, _ = _extract(variables["params"], None)
    cfg_tuple = (("ffin", "attn", "ff"), True, False, nh, hd, 1e-5, False)

    def loss(pp, xx):
        out = ft.temporal_block(xx.reshape(b, f, s, c), None, pp, cfg_tuple, None)
        return jnp.sum(out ** 2)

    gp, gx = jax.grad(loss, argnums=(0, 1))(p, x)
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(gp))
    assert np.isfinite(total) and total > 0
    assert np.isfinite(float(jnp.abs(gx).sum()))


def test_plan_covers_production_widths():
    """The planner must fit: UNet 320 (one call), adapter 512 (split), UNet
    640 (split); UNet 1280 at 64^2 may or may not fit but must not crash."""
    parts = ("ffin", "attn", "ff")
    # (c, ia, s) — iff = 4c
    plan320 = ft._plan(parts, 320, 320, 1280, 4096, 14, 2)
    assert plan320 is not None
    groups, ts = plan320
    assert len(groups) == 1 and 4096 % ts == 0
    plan512 = ft._plan(parts, 512, 320, 2048, 4096, 14, 2)
    assert plan512 is not None
    assert len(plan512[0]) >= 2  # split into multiple calls
    ft._plan(parts, 640, 640, 2560, 1024, 14, 2)
    ft._plan(parts, 1280, 1280, 5120, 64, 14, 2)


def test_eligibility_off_tpu():
    assert ft.dispatch_mode(2, 14, 4096, 320, 320, 1280, jnp.bfloat16) is None


def test_hybrid_path_matches_module(monkeypatch):
    """Hybrid mode (attention kernel + XLA FFs on the (b,f,s,c) layout) must
    agree with the XLA module path."""
    b, f, s, c, nh, hd = 2, 6, 32, 128, 2, 64
    block, variables, x, ctx = _module_and_params(b, f, s, c, nh, hd, 96,
                                                  seed=7)
    want = block.apply(variables, x, f, encoder_hidden_states=ctx)
    monkeypatch.setattr(ft, "dispatch_mode", lambda *a, **k: "hybrid")
    got = block.apply(variables, x, f, encoder_hidden_states=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
