"""Scheduler correctness: DDIM timestep grid + reconstruction, EDM/Karras tables."""

import numpy as np
import jax.numpy as jnp

from ctrl_adapter_tpu.schedulers.ddim import DDIMConfig, DDIMScheduler
from ctrl_adapter_tpu.schedulers.euler_discrete import (
    SVD_EULER_CONFIG,
    EulerDiscreteConfig,
    EulerDiscreteScheduler,
    karras_sigmas,
    sample_training_sigmas_timesteps,
)


def test_ddim_timestep_grid_matches_reference():
    # SD leading spacing, 50 steps, offset 1 -> [981, 961, ..., 1]
    sched = DDIMScheduler(DDIMConfig())
    state = sched.set_timesteps(50)
    ts = np.asarray(state.timesteps)
    assert ts[0] == 981 and ts[-1] == 1
    assert np.all(np.diff(ts) == -20)


def test_ddim_perfect_model_recovers_x0():
    """If the model predicts the exact noise, 50 DDIM steps reconstruct x0.

    With set_alpha_to_one=True the final target is alpha=1 -> exact recovery. (With the
    SD default set_alpha_to_one=False the terminal state keeps sqrt(1-acp[0])~0.029 of
    noise by design.)"""
    sched = DDIMScheduler(DDIMConfig(set_alpha_to_one=True))
    state = sched.set_timesteps(50)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))

    t0 = state.timesteps[0]
    sample = sched.add_noise(x0, eps, t0[None])

    for i in range(50):
        t = state.timesteps[i]
        acp = state.alphas_cumprod[t]
        # exact epsilon for the current sample given fixed x0
        eps_t = (sample - acp**0.5 * x0) / (1 - acp) ** 0.5
        sample = DDIMScheduler.step(state, eps_t, jnp.asarray(i), sample)

    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), rtol=1e-3, atol=1e-3)


def test_ddim_v_prediction_consistency():
    sched = DDIMScheduler(DDIMConfig(prediction_type="v_prediction"))
    state = sched.set_timesteps(25)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
    t = state.timesteps[3]
    xt = sched.add_noise(x0, eps, t[None])
    v = sched.get_velocity(x0, eps, t[None])
    # step with the exact v from (x0, eps): pred_x0 inside step must equal x0
    acp = state.alphas_cumprod[t]
    pred_x0 = acp**0.5 * xt - (1 - acp) ** 0.5 * v
    np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0), rtol=1e-4, atol=1e-5)


def test_karras_table_endpoints():
    s = karras_sigmas(1000)
    assert abs(s[0] - 700.0) < 1e-3
    assert abs(s[-1] - 0.002) < 1e-6
    assert np.all(np.diff(s) < 0)


def test_euler_epsilon_sdxl_variant():
    """SDXL stock scheduler: beta-derived sigmas, leading spacing, epsilon step."""
    sched = EulerDiscreteScheduler(EulerDiscreteConfig())
    state = sched.set_timesteps(50)
    ts = np.asarray(state.timesteps)
    assert ts[0] == 981 and ts[-1] == 1
    sigmas = np.asarray(state.sigmas)
    assert sigmas[-1] == 0.0 and np.all(np.diff(sigmas) < 0)
    # perfect-epsilon reconstruction
    rng = np.random.default_rng(5)
    x0 = np.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
    eps = np.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
    sample = jnp.asarray(x0 + float(state.sigmas[0]) * eps)
    for i in range(50):
        sigma = float(state.sigmas[i])
        eps_t = (np.asarray(sample) - x0) / sigma
        sample = EulerDiscreteScheduler.step(state, jnp.asarray(eps_t), jnp.asarray(i), sample)
    np.testing.assert_allclose(np.asarray(sample), x0, rtol=1e-3, atol=1e-3)


def test_euler_edm_perfect_model_recovers_x0():
    sched = EulerDiscreteScheduler(SVD_EULER_CONFIG)
    state = sched.set_timesteps(25)
    rng = np.random.default_rng(2)
    x0 = np.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
    eps = np.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
    sample = jnp.asarray(x0 + float(state.sigmas[0]) * eps)

    for i in range(25):
        sigma = float(state.sigmas[i])
        # exact v such that c_out*v + c_skip*x_t = x0
        c_out = -sigma / (sigma**2 + 1.0) ** 0.5
        c_skip = 1.0 / (sigma**2 + 1.0)
        v = (jnp.asarray(x0) - c_skip * sample) / c_out
        sample = EulerDiscreteScheduler.step(state, v, jnp.asarray(i), sample)

    np.testing.assert_allclose(np.asarray(sample), x0, rtol=1e-3, atol=1e-3)


def test_training_sigma_sampler_alignment():
    """u in (0, 1]: controlnet timestep = round(u*1000) stays in ControlNet's domain
    (`train.py:1204-1209`)."""
    table = jnp.asarray(karras_sigmas(1000))
    u, sig = sample_training_sigmas_timesteps(jnp.asarray([0.0, 0.5, 0.999]), table, 25)
    u = np.asarray(u)
    assert np.all(u > 0) and np.all(u <= 1.0)
    ts = np.round(u * 1000)
    assert np.all(ts >= 1) and np.all(ts <= 1000)
    # sigma index matches u's position in the table
    assert abs(float(sig[0]) - 700.0) < 1e-3
