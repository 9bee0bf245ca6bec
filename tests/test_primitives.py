"""Numerical parity of TPU primitives vs torch-CPU oracles.

The reference stack is torch; torch (CPU) is available in this image, so we use
``torch.nn.functional`` as the golden oracle for the primitive ops our modules are
built from: nearest resize, adaptive average pooling, GroupNorm semantics, scaled
dot-product attention, and conv weight-layout conversion.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

import flax.linen as nn

from ctrl_adapter_tpu.ops.resize import adaptive_avg_pool2d, nearest_resize
from ctrl_adapter_tpu.convert.torch_to_jax import convert_state_dict


def to_nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.transpose(x_nchw, (0, 2, 3, 1))


def to_nchw(x_nhwc: np.ndarray) -> np.ndarray:
    return np.transpose(x_nhwc, (0, 3, 1, 2))


@pytest.mark.parametrize("in_hw,out_hw", [((8, 8), (16, 16)), ((7, 5), (14, 10)), ((9, 9), (13, 17))])
def test_nearest_resize_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, *in_hw)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=out_hw, mode="nearest").numpy()
    got = to_nchw(np.asarray(nearest_resize(jnp.asarray(to_nhwc(x)), out_hw)))
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


@pytest.mark.parametrize("in_hw,out_hw", [((128, 128), (64, 64)), ((64, 64), (64, 64)), ((10, 6), (4, 4))])
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, *in_hw)).astype(np.float32)
    ref = F.adaptive_avg_pool2d(torch.from_numpy(x), out_hw).numpy()
    got = to_nchw(np.asarray(adaptive_avg_pool2d(jnp.asarray(to_nhwc(x)), out_hw)))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("channels,groups", [(320, 32), (64, 32), (8, 4)])
def test_flax_groupnorm_matches_torch(channels, groups):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, channels, 6, 6)).astype(np.float32)
    weight = rng.normal(size=(channels,)).astype(np.float32)
    bias = rng.normal(size=(channels,)).astype(np.float32)
    eps = 1e-6

    ref = F.group_norm(
        torch.from_numpy(x), groups, torch.from_numpy(weight), torch.from_numpy(bias), eps
    ).numpy()

    gn = nn.GroupNorm(num_groups=groups, epsilon=eps)
    params = {"params": {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)}}
    got = to_nchw(np.asarray(gn.apply(params, jnp.asarray(to_nhwc(x)))))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_sdpa_matches_torch():
    rng = np.random.default_rng(3)
    b, t, heads, hd = 2, 17, 4, 32
    s = 23
    q = rng.normal(size=(b, t, heads, hd)).astype(np.float32)
    k = rng.normal(size=(b, s, heads, hd)).astype(np.float32)
    v = rng.normal(size=(b, s, heads, hd)).astype(np.float32)

    ref = F.scaled_dot_product_attention(
        torch.from_numpy(q).permute(0, 2, 1, 3),
        torch.from_numpy(k).permute(0, 2, 1, 3),
        torch.from_numpy(v).permute(0, 2, 1, 3),
    ).permute(0, 2, 1, 3).numpy()

    got = np.asarray(jax.nn.dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_conv2d_weight_conversion():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 8, 9, 9)).astype(np.float32)
    tconv = torch.nn.Conv2d(8, 16, 3, padding=1)
    ref = tconv(torch.from_numpy(x)).detach().numpy()

    sd = {k: v.detach().numpy() for k, v in tconv.state_dict().items()}
    params = convert_state_dict(sd)
    conv = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)))
    got = to_nchw(np.asarray(conv.apply({"params": params}, jnp.asarray(to_nhwc(x)))))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_conv3d_weight_conversion():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 8, 5, 4, 4)).astype(np.float32)  # (n, c, f, h, w)
    tconv = torch.nn.Conv3d(8, 16, (3, 1, 1), padding=(1, 0, 0))
    ref = tconv(torch.from_numpy(x)).detach().numpy()

    sd = {k: v.detach().numpy() for k, v in tconv.state_dict().items()}
    params = convert_state_dict(sd)
    conv = nn.Conv(16, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)))
    x_ndhwc = np.transpose(x, (0, 2, 3, 4, 1))
    got = np.asarray(conv.apply({"params": params}, jnp.asarray(x_ndhwc)))
    got = np.transpose(got, (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_linear_weight_conversion():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(3, 12)).astype(np.float32)
    tlin = torch.nn.Linear(12, 7)
    ref = tlin(torch.from_numpy(x)).detach().numpy()
    params = convert_state_dict({k: v.detach().numpy() for k, v in tlin.state_dict().items()})
    got = np.asarray(nn.Dense(7).apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_timestep_embedding_formula():
    """Sinusoid matches the documented diffusers formula (flip_sin_to_cos, shift=0)."""
    from ctrl_adapter_tpu.nn.embeddings import get_timestep_embedding

    t = np.array([0.0, 1.0, 17.0, 999.0], dtype=np.float32)
    dim = 320
    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half, dtype=np.float32) / half
    freqs = np.exp(exponent)
    arg = t[:, None] * freqs[None, :]
    ref = np.concatenate([np.cos(arg), np.sin(arg)], axis=-1)  # flipped

    got = np.asarray(
        get_timestep_embedding(jnp.asarray(t), dim, flip_sin_to_cos=True, downscale_freq_shift=0.0)
    )
    # fp32 exp/cos vs the fp64 numpy reference: a ~1e-7 relative frequency rounding is
    # amplified by t=999 into ~2e-3 phase error — inherent fp32, same as torch.
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=5e-3)


def test_attention_small_seq_and_single_key_shortcuts():
    """The attention fast paths must be exact: tiny-seq input passes through
    unchanged semantics, and single-key cross-attention equals V broadcast
    (softmax of one logit = 1)."""
    import numpy as np
    import jax.numpy as jnp
    import jax

    from ctrl_adapter_tpu.ops.flash_attention import dot_product_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((32, 14, 2, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((32, 14, 2, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((32, 14, 2, 8)), jnp.float32)
    want = jax.nn.dot_product_attention(q, k, v)
    got = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    k1 = jnp.asarray(rng.standard_normal((32, 1, 2, 8)), jnp.float32)
    v1 = jnp.asarray(rng.standard_normal((32, 1, 2, 8)), jnp.float32)
    want1 = jax.nn.dot_product_attention(q, k1, v1)
    got1 = dot_product_attention(q, k1, v1)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), atol=1e-6)


def test_antialiased_resize_matches_torch_reference():
    """Matches the SVD preprocessing resize (`utils/utils_svd.py:137-180`):
    gaussian prefilter (reflect pad) + bicubic align_corners=True."""
    import torch
    import torch.nn.functional as TF

    from ctrl_adapter_tpu.ops.resize import antialiased_resize

    rng = np.random.default_rng(7)
    img = rng.uniform(-1, 1, (2, 64, 48, 3)).astype(np.float32)
    size = (24, 20)

    # torch oracle implementing the same published recipe (skimage sigma rule,
    # two-pass separable gaussian with reflect padding, bicubic align-corners)
    t = torch.from_numpy(img.transpose(0, 3, 1, 2))
    h, w = t.shape[-2:]
    factors = (h / size[0], w / size[1])
    sigmas = (max((factors[0] - 1) / 2, 0.001), max((factors[1] - 1) / 2, 0.001))
    ks = [int(max(4 * s, 3)) for s in sigmas]
    ks = [k + 1 if k % 2 == 0 else k for k in ks]

    def g1d(n, sigma):
        xs = torch.arange(n, dtype=torch.float32) - n // 2
        g = torch.exp(-xs**2 / (2 * sigma**2))
        return g / g.sum()

    kx = g1d(ks[1], sigmas[1])
    ky = g1d(ks[0], sigmas[0])
    c = t.shape[1]
    tx = TF.pad(t, (ks[1] // 2, ks[1] // 2, 0, 0), mode="reflect")
    tx = TF.conv2d(tx, kx.view(1, 1, 1, -1).expand(c, 1, 1, -1), groups=c)
    ty = TF.pad(tx, (0, 0, ks[0] // 2, ks[0] // 2), mode="reflect")
    ty = TF.conv2d(ty, ky.view(1, 1, -1, 1).expand(c, 1, -1, 1), groups=c)
    want = TF.interpolate(ty, size=size, mode="bicubic", align_corners=True)

    got = antialiased_resize(jnp.asarray(img), size)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want.numpy(), rtol=2e-4, atol=2e-4)
