"""Shape/behavior tests for the Ctrl-Adapter core (adapter blocks + container + router).

Mirrors the reference's `model/ctrl_adapter.py:229-264` __main__ smoke checks (per-
location dims/channels) and adds what the reference lacks: assertions on location maps,
zero-filled unadapted slots, router masking, and SDXL 2x upsampling.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ctrl_adapter_tpu.models.adapter import (
    AdapterSpatioTemporal,
    ControlNetAdapter,
    get_down_block_channels,
    get_down_block_ids,
)
from ctrl_adapter_tpu.models.router import ControlNetRouter, fuse_expert_residuals
from .utils import eager_apply, fake_init

# I2VGen-XL/SVD ControlNet residual channels at the 12 down-block slots
# (SURVEY §2.1; reference `model/ctrl_adapter.py:236-241`).
RESIDUAL_CHANNELS = [320, 320, 320, 320, 640, 640, 640, 1280, 1280, 1280, 1280, 1280]
# tiny spatial dims standing in for 64/32/16/8
RESIDUAL_DIMS = [8, 8, 8, 8, 4, 4, 4, 2, 2, 2, 2, 2]


def test_location_maps_match_reference():
    assert get_down_block_ids(("A", "B", "C", "D"), 3) == list(range(12))
    assert get_down_block_ids(("A", "B", "C"), 3) == list(range(9))
    assert get_down_block_ids(("A", "D"), 2) == [0, 2, 9, 11]
    assert get_down_block_ids(("B",), 1) == [5]
    assert get_down_block_channels(("A", "B", "C", "D"), 3) == RESIDUAL_CHANNELS
    assert get_down_block_channels(("A", "B", "C"), 3) == RESIDUAL_CHANNELS[:9]
    assert get_down_block_channels(("B", "C"), 2) == [320, 640, 640, 1280]


def _tiny_residuals(num_frames=2, batch=1):
    rng = np.random.default_rng(0)
    downs = [
        jnp.asarray(rng.normal(size=(batch * num_frames, d, d, c)).astype(np.float32))
        for d, c in zip(RESIDUAL_DIMS, RESIDUAL_CHANNELS)
    ]
    mid = jnp.asarray(rng.normal(size=(batch * num_frames, 2, 2, 1280)).astype(np.float32))
    return downs, mid


@pytest.mark.parametrize("temporal", [False, True])
def test_adapter_block_shapes(temporal):
    num_frames, b, c, d = 2, 1, 128, 8
    block = AdapterSpatioTemporal(
        in_channels=c,
        out_channels=c,
        num_layers=1,
        cross_attention_dim=64,
        add_spatial_resnet=True,
        add_temporal_resnet=temporal,
        add_spatial_transformer=True,
        add_temporal_transformer=temporal,
    )
    x = jnp.ones((b * num_frames, d, d, c))
    t = jnp.asarray([5.0])
    ehs = jnp.ones((1, 3, 64))
    params = fake_init(block, x, num_frames, t, ehs)
    out = eager_apply(block, params, x, num_frames, t, ehs)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_adapter_block_inner_dim_is_512():
    """Bug-compatible: transformer runs at 8*64=512 regardless of in_channels."""
    block = AdapterSpatioTemporal(
        in_channels=1280, out_channels=1280, num_layers=1, cross_attention_dim=64,
        add_temporal_resnet=False, add_temporal_transformer=False,
    )
    x = jnp.ones((2, 2, 2, 1280))
    params = jax.eval_shape(
        lambda: block.init(jax.random.PRNGKey(0), x, 2, jnp.asarray([3.0]), jnp.ones((1, 3, 64)))
    )
    proj_in_kernel = params["params"]["proj_in"]["kernel"]
    assert proj_in_kernel.shape == (1280, 512)
    # attention inner dim = heads(1280/64=20) * 64 = 1280
    attn_q = params["params"]["spatial_attentions_0"]["attn1"]["to_q"]["kernel"]
    assert attn_q.shape == (512, 1280)


def test_sdxl_upsampling_scale():
    block = AdapterSpatioTemporal(
        in_channels=320, out_channels=320, num_layers=2, cross_attention_dim=64,
        add_temporal_resnet=False, add_temporal_transformer=False, up_sampling_scale=2.0,
    )
    x = jnp.ones((2, 8, 8, 320))
    out = jax.eval_shape(
        lambda: block.init_with_output(
            jax.random.PRNGKey(0), x, 1, jnp.asarray([3.0]), jnp.ones((1, 3, 64))
        )[0]
    )
    assert out.shape == (2, 16, 16, 320)  # only layer 0 upsamples


def test_container_zero_fills_unadapted_slots():
    downs, mid = _tiny_residuals()
    adapter = ControlNetAdapter(
        backbone_model_name="i2vgenxl",
        num_blocks=1,
        num_adapters_per_location=1,
        cross_attention_dim=64,
        adapter_locations=("A", "D", "M"),
        add_temporal_resnet=False,
        add_temporal_transformer=False,
    )
    t = jnp.asarray([7.0])
    ehs = jnp.ones((1, 3, 64))
    params = fake_init(adapter, downs, mid, 2, t, ehs)
    adapted, adapted_mid = eager_apply(adapter, params, downs, mid, 2, t, ehs)
    assert len(adapted) == 12
    active = get_down_block_ids(("A", "D"), 1)  # [2, 11]
    for i, a in enumerate(adapted):
        assert a.shape == downs[i].shape
        if i not in active:
            assert np.all(np.asarray(a) == 0.0), f"slot {i} should be zeros"
        else:
            assert np.any(np.asarray(a) != 0.0)
    assert adapted_mid.shape == mid.shape


def test_router_masking_and_normalization():
    router = ControlNetRouter(num_experts=4, router_type="simple_weights", num_routers=12)
    params = fake_init(router, seed=1, scale=1.0)
    mask = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    down_w, mid_w = eager_apply(router, params, sparse_mask=mask)
    assert down_w.shape == (12, 4)
    assert mid_w.shape == (4,)
    np.testing.assert_allclose(np.asarray(down_w.sum(-1)), 1.0, rtol=1e-5)
    assert np.all(np.asarray(down_w[:, 1]) < 1e-20)
    assert np.all(np.asarray(down_w[:, 3]) < 1e-20)
    np.testing.assert_allclose(np.asarray(mid_w[::2].sum()), 1.0, rtol=1e-5)

    router_eq = ControlNetRouter(num_experts=3, router_type="equal_weights")
    params_eq = router_eq.init(jax.random.PRNGKey(0))
    down_w, mid_w = eager_apply(router_eq, params_eq)
    np.testing.assert_allclose(np.asarray(down_w), 1.0 / 3.0, rtol=1e-6)


def test_fuse_expert_residuals_matches_loop():
    rng = np.random.default_rng(3)
    E, K = 3, 4
    downs = [[jnp.asarray(rng.normal(size=(2, 2, 2, 8)).astype(np.float32)) for _ in range(K)] for _ in range(E)]
    mids = [jnp.asarray(rng.normal(size=(2, 2, 2, 8)).astype(np.float32)) for _ in range(E)]
    dw = jnp.asarray(rng.random(size=(K, E)).astype(np.float32))
    mw = jnp.asarray(rng.random(size=(E,)).astype(np.float32))
    fused_down, fused_mid = fuse_expert_residuals(downs, mids, dw, mw)
    for k in range(K):
        ref = sum(np.asarray(downs[e][k]) * float(dw[k, e]) for e in range(E))
        np.testing.assert_allclose(np.asarray(fused_down[k]), ref, rtol=1e-5, atol=1e-6)
    ref_mid = sum(np.asarray(mids[e]) * float(mw[e]) for e in range(E))
    np.testing.assert_allclose(np.asarray(fused_mid), ref_mid, rtol=1e-5, atol=1e-6)


def test_conditional_router_types():
    """Extension beyond the reference: timestep/embedding-conditioned routers (the
    reference wires these in `train.py:566-597` but never implements them)."""
    for rt, dim in [("timestep_weights", 16), ("embedding_weights", 24),
                    ("timestep_embedding_weights", 40)]:
        router = ControlNetRouter(num_experts=3, router_type=rt, num_routers=12)
        rin = jnp.asarray(np.random.default_rng(0).normal(size=(dim,)).astype(np.float32))
        params = fake_init(router, rin, seed=2, scale=0.5)
        down_w, mid_w = eager_apply(router, params, rin)
        assert down_w.shape == (12, 3) and mid_w.shape == (3,)
        np.testing.assert_allclose(np.asarray(down_w.sum(-1)), 1.0, rtol=1e-5)
        # different inputs give different weights (input-conditional, unlike simple)
        down_w2, _ = eager_apply(router, params, rin * -2.0 + 1.0)
        assert not np.allclose(np.asarray(down_w), np.asarray(down_w2))
        # batched (B, D) input is accepted
        down_w3, _ = eager_apply(router, params, jnp.stack([rin, rin]))
        np.testing.assert_allclose(np.asarray(down_w3), np.asarray(down_w), rtol=1e-5)
        # masking still applies on top
        down_wm, _ = eager_apply(router, params, rin,
                                 sparse_mask=jnp.asarray([1.0, 0.0, 1.0]))
        assert np.all(np.asarray(down_wm[:, 1]) < 1e-20)


def test_conditional_router_requires_input():
    router = ControlNetRouter(num_experts=2, router_type="timestep_weights")
    with pytest.raises(ValueError):
        router.init(jax.random.PRNGKey(0))
