"""Sampling schedulers vs numpy mirrors of the diffusers algorithms.

diffusers itself is not importable in this environment, so the oracles
are verbatim numpy transcriptions of the published update rules the
reference relies on (DDIMScheduler.step with eta=0 /
PNDMScheduler.step_plms with skip_prk_steps=True — the counter/ets
state machine — / DDPMScheduler ancestral step), including SD's
scheduler_config quirks: leading timestep spacing, steps_offset=1,
set_alpha_to_one=False (final alpha = alphas_cumprod[0]).
Reference call sites: gsgen3d/gsgen guidance/stable_diffusion.py:90-107
(scheduler selection), stable_diffusion_vsd.py:540-676 (sample paths).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsgen_tpu.guidance.diffusion import scaled_linear_schedule
from gsgen_tpu.guidance.samplers import (SamplerConfig, ancestral_sample,
                                         ddim_sample, leading_timesteps,
                                         pndm_sample, sample)

T = 1000
SCHED = scaled_linear_schedule(T)
AC = np.asarray(SCHED.alphas_cumprod, np.float64)
SHAPE = (2, 4, 4, 3)


def eps_model(x, t):
    """Deterministic nonlinear eps predictor, identical in jax/numpy."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    tt = xp.asarray(t, xp.float32)
    return 0.3 * x * xp.cos(tt / 97.0) + 0.1 * xp.sin(tt / 31.0)


def np_timesteps(num_steps, offset=1):
    ratio = T // num_steps
    return (np.arange(num_steps) * ratio)[::-1] + offset


def np_ddim(x, num_steps):
    ratio = T // num_steps
    for t in np_timesteps(num_steps):
        prev_t = t - ratio
        eps = np.asarray(eps_model(x, t))
        ac_t = AC[t]
        ac_prev = AC[prev_t] if prev_t >= 0 else AC[0]
        x0 = (x - np.sqrt(1 - ac_t) * eps) / np.sqrt(ac_t)
        x = np.sqrt(ac_prev) * x0 + np.sqrt(1 - ac_prev) * eps
    return x


def np_prev_sample(x, t, prev_t, eps):
    ac_t = AC[t]
    ac_prev = AC[prev_t] if prev_t >= 0 else AC[0]
    num = (ac_prev - ac_t) * eps
    den = np.sqrt(ac_t) * (np.sqrt((1 - ac_prev) * ac_t)
                           + np.sqrt((1 - ac_t) * ac_prev))
    return np.sqrt(ac_prev / ac_t) * x - num / den


def np_plms(x, num_steps):
    """Verbatim transcription of PNDMScheduler.step_plms's counter/ets
    state machine over plms_timesteps = [t0, t1, t1, t2, ...] (the
    second timestep duplicated), skip_prk_steps=True."""
    ratio = T // num_steps
    base = list(np_timesteps(num_steps))
    plms_ts = [base[0], base[1]] + base[1:] if num_steps > 1 else base
    ets, counter, cur_sample = [], 0, None
    for timestep in plms_ts:
        model_output = np.asarray(eps_model(x, timestep))
        if counter != 1:
            prev_timestep = timestep - ratio
            ets.append(model_output)
        else:
            prev_timestep = timestep
            timestep = timestep + ratio
        if len(ets) == 1 and counter == 0:
            mo = model_output
            cur_sample = x
        elif len(ets) == 1 and counter == 1:
            mo = (model_output + ets[-1]) / 2
            x = cur_sample
            cur_sample = None
        elif len(ets) == 2:
            mo = (3 * ets[-1] - ets[-2]) / 2
        elif len(ets) == 3:
            mo = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
        else:
            mo = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3]
                  - 9 * ets[-4]) / 24
        x = np_prev_sample(x, timestep, prev_timestep, mo)
        counter += 1
    return x


def np_ancestral(x, num_steps, key):
    ratio = T // num_steps
    keys = jax.random.split(key, num_steps)
    for i, t in enumerate(np_timesteps(num_steps)):
        prev_t = t - ratio
        eps = np.asarray(eps_model(x, t))
        ac_t = AC[t]
        ac_prev = AC[max(prev_t, 0)]
        alpha_t = ac_t / ac_prev
        x0 = np.clip((x - np.sqrt(1 - ac_t) * eps) / np.sqrt(ac_t),
                     -10.0, 10.0)
        coef0 = np.sqrt(ac_prev) * (1 - alpha_t) / (1 - ac_t)
        coefx = np.sqrt(alpha_t) * (1 - ac_prev) / (1 - ac_t)
        mean = coef0 * x0 + coefx * x
        var = (1 - alpha_t) * (1 - ac_prev) / (1 - ac_t)
        z = np.asarray(jax.random.normal(keys[i], x.shape))
        x = (mean + np.sqrt(max(var, 1e-20)) * z) if prev_t >= 0 else x0
    return x


def _x0():
    return np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), SHAPE), np.float64)


def test_leading_timesteps_match_diffusers():
    for n in (10, 25, 50):
        np.testing.assert_array_equal(
            np.asarray(leading_timesteps(T, n, 1)), np_timesteps(n, 1))


@pytest.mark.parametrize("num_steps", [10, 25])
def test_ddim_matches_oracle(num_steps):
    x = _x0()
    ref = np_ddim(x.copy(), num_steps)
    got = np.asarray(ddim_sample(eps_model, SCHED,
                                 jnp.asarray(x, jnp.float32), num_steps))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("num_steps", [5, 10, 25])
def test_pndm_matches_oracle(num_steps):
    x = _x0()
    ref = np_plms(x.copy(), num_steps)
    got = np.asarray(pndm_sample(eps_model, SCHED,
                                 jnp.asarray(x, jnp.float32), num_steps))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_ancestral_matches_oracle():
    x = _x0()
    key = jax.random.PRNGKey(11)
    ref = np_ancestral(x.copy(), 10, key)
    got = np.asarray(ancestral_sample(eps_model, SCHED,
                                      jnp.asarray(x, jnp.float32), 10, key))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_ddim_recovers_x0_for_true_eps():
    """With the exact constant eps that formed x_T, every DDIM x0
    prediction is exact, so the trajectory ends at x0 (up to the
    final-alpha residual)."""
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, SHAPE)
    eps_true = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    # noise at the sampler's FIRST timestep (leading spacing + offset),
    # so the premise "x was noised at the t the sampler assumes" holds
    t0 = int(leading_timesteps(T, 50, 1)[0])
    t_hi = jnp.full((SHAPE[0],), t0, jnp.int32)
    x_T = SCHED.add_noise(x0, eps_true, t_hi)
    out = ddim_sample(lambda x, t: eps_true, SCHED, x_T, 50)
    # final state = sqrt(ac0) x0 + sqrt(1-ac0) eps, ac0 ~ 0.99915
    resid = out - (jnp.sqrt(AC[0]) * x0 + jnp.sqrt(1 - AC[0]) * eps_true)
    assert float(jnp.max(jnp.abs(resid))) < 1e-4


def test_dispatch_and_jit():
    x = jnp.asarray(_x0(), jnp.float32)
    for typ in ("ddim", "pndm", "ancestral"):
        cfg = SamplerConfig(type=typ, num_steps=6)
        fn = jax.jit(lambda x, k: sample(cfg, eps_model, SCHED, x, key=k))
        out = fn(x, jax.random.PRNGKey(0))
        assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))
