"""ControlNet tower tests: residual contract, zero-init heads, skip flags."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ctrl_adapter_tpu.models.controlnet import (
    ControlNetConditioningEmbedding,
    ControlNetConfig,
    ControlNetModel,
)
from .utils import eager_apply, fake_init

TINY = ControlNetConfig(
    block_out_channels=(32, 64, 96, 96),
    num_attention_heads=(4, 4, 4, 4),
    cross_attention_dim=24,
    conditioning_embedding_out_channels=(8, 8, 16, 16),
    layers_per_block=2,
)


@pytest.fixture(scope="module")
def tiny_controlnet():
    model = ControlNetModel(config=TINY)
    sample = jnp.ones((2, 8, 8, 4))
    cond = jnp.ones((2, 64, 64, 3))
    ehs = jnp.ones((2, 7, 24))
    t = jnp.asarray([10.0, 10.0])
    params = fake_init(model, sample, t, ehs, cond)
    return model, params, (sample, t, ehs, cond)


def test_residual_shape_contract(tiny_controlnet):
    model, params, (sample, t, ehs, cond) = tiny_controlnet
    downs, mid = eager_apply(model, params, sample, t, ehs, cond)
    # 12 residuals: conv_in + 2 per block + downsample per non-final block
    assert len(downs) == 12
    assert [d.shape[-1] for d in downs] == [32, 32, 32, 32, 64, 64, 64, 96, 96, 96, 96, 96]
    assert [d.shape[1] for d in downs] == [8, 8, 8, 4, 4, 4, 2, 2, 2, 1, 1, 1]
    assert mid.shape == (2, 1, 1, 96)
    for d in downs:
        assert np.isfinite(np.asarray(d)).all()


def test_zero_conv_initialization():
    """Projection heads and the cond-embedding output conv start at exact zero
    (reference `controlnet/controlnet.py:362-408,884-887`)."""
    emb = ControlNetConditioningEmbedding(conditioning_embedding_channels=16,
                                          block_out_channels=(8, 8, 16, 16))
    x = jnp.ones((1, 16, 16, 3))
    params = jax.jit(lambda: emb.init(jax.random.PRNGKey(0), x))()
    assert np.all(np.asarray(params["params"]["conv_out"]["kernel"]) == 0.0)
    out = eager_apply(emb, params, x)
    assert np.all(np.asarray(out) == 0.0)


def test_skip_conv_in_ignores_latents(tiny_controlnet):
    """With skip_conv_in the tower must be invariant to the latent input
    (latents skipping, reference `controlnet/controlnet.py:795-814`)."""
    model, params, (sample, t, ehs, cond) = tiny_controlnet
    out1 = eager_apply(model, params, sample, t, ehs, cond, skip_conv_in=True)
    out2 = eager_apply(model, params, sample * 100.0 + 3.0, t, ehs, cond, skip_conv_in=True)
    for a, b in zip(out1[0], out2[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    np.testing.assert_allclose(np.asarray(out1[1]), np.asarray(out2[1]), atol=0)
    # sanity: without the flag, latents do matter
    out3 = eager_apply(model, params, sample * 100.0 + 3.0, t, ehs, cond)
    assert np.abs(np.asarray(out3[0][0]) - np.asarray(out1[0][0])).max() > 0


def test_conditioning_scale_scales_outputs(tiny_controlnet):
    model, params, (sample, t, ehs, cond) = tiny_controlnet
    downs1, mid1 = eager_apply(model, params, sample, t, ehs, cond, conditioning_scale=1.0)
    downs2, mid2 = eager_apply(model, params, sample, t, ehs, cond, conditioning_scale=0.5)
    for a, b in zip(downs1, downs2):
        np.testing.assert_allclose(np.asarray(a) * 0.5, np.asarray(b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mid1) * 0.5, np.asarray(mid2), rtol=1e-5, atol=1e-6)


def test_skip_time_emb_zeroes_time_path(tiny_controlnet):
    model, params, (sample, t, ehs, cond) = tiny_controlnet
    out1 = eager_apply(model, params, sample, t, ehs, cond, skip_time_emb=True)
    out2 = eager_apply(model, params, sample, jnp.asarray([500.0, 500.0]), ehs, cond,
                       skip_time_emb=True)
    for a, b in zip(out1[0], out2[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_guess_mode_logspace_ramp(tiny_controlnet):
    """guess_mode scales residual k by 10**linspace(-1,0,13)[k] (reference
    `controlnet/controlnet.py:860-865`): early residuals shrink 10x, mid x1."""
    model, params, (sample, t, ehs, cond) = tiny_controlnet
    downs, mid = eager_apply(model, params, sample, t, ehs, cond)
    downs_g, mid_g = eager_apply(model, params, sample, t, ehs, cond, guess_mode=True)
    scales = 10.0 ** np.linspace(-1.0, 0.0, 13)
    for k, (a, g) in enumerate(zip(downs, downs_g)):
        np.testing.assert_allclose(
            np.asarray(a) * scales[k], np.asarray(g), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mid) * scales[-1], np.asarray(mid_g),
                               rtol=1e-5, atol=1e-6)
