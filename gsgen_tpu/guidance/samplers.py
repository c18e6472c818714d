"""Sampling schedulers: DDIM, PNDM (PLMS) and DDPM-ancestral loops.

The reference selects the guidance's sampling scheduler per config
(gsgen3d/gsgen guidance/stable_diffusion.py:90-107 builds DDIMScheduler
or PNDMScheduler from conf/guidance/sd_pndm.yaml) and samples with it
in the visualization paths (stable_diffusion_vsd.py:540-676 sample /
sample_lora).  diffusers is not importable here, so these implement the
same published update rules as pure-JAX loops over an ``eps_fn``
callback; tests/test_samplers.py pins them against a numpy mirror of
the diffusers algorithms (leading-spaced timesteps with SD's
steps_offset=1, DDIM eta=0 update, PLMS with skip_prk_steps=True and
the Adams-Bashforth 4th-order eps combination, DDPM ancestral noise).

Everything is jit-compatible: ``eps_fn(x [B,h,w,c], t scalar int32) ->
eps [B,h,w,c]`` runs under ``lax.fori_loop`` with static num_steps.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .diffusion import NoiseSchedule


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """guidance.scheduler block (conf/guidance/sd_pndm.yaml shape)."""

    type: str = "ddim"            # ddim | pndm | ancestral
    num_steps: int = 25
    eta: float = 0.0              # DDIM stochasticity (0 = deterministic)
    steps_offset: int = 1         # diffusers SD schedulers' offset


def leading_timesteps(T: int, num_steps: int, steps_offset: int = 1
                      ) -> jnp.ndarray:
    """diffusers 'leading' spacing: arange(n)*(T//n) descending, plus
    the SD steps_offset (DDIMScheduler.set_timesteps semantics)."""
    ratio = T // num_steps
    ts = (jnp.arange(num_steps, dtype=jnp.int32) * ratio)[::-1]
    return jnp.clip(ts + steps_offset, 0, T - 1)


def ddim_sample(eps_fn: Callable, schedule: NoiseSchedule, x: jax.Array,
                num_steps: int, key: Optional[jax.Array] = None,
                eta: float = 0.0, steps_offset: int = 1) -> jax.Array:
    """DDIM (Song et al. 2020 eq. 12; diffusers DDIMScheduler.step).

    x_prev = sqrt(ac_prev) x0 + sqrt(1-ac_prev-s²) eps + s z,
    x0 = (x - sqrt(1-ac_t) eps)/sqrt(ac_t),
    s = eta * sqrt((1-ac_prev)/(1-ac_t)) * sqrt(1-ac_t/ac_prev).
    """
    T = schedule.num_train_timesteps
    ratio = T // num_steps
    ts = leading_timesteps(T, num_steps, steps_offset)
    ac_all = schedule.alphas_cumprod
    keys = (jax.random.split(key, num_steps) if key is not None
            else jnp.zeros((num_steps, 2), jnp.uint32))

    def body(i, x):
        t = ts[i]
        prev_t = t - ratio
        eps = eps_fn(x, t)
        ac_t = ac_all[t]
        # prev_t < 0 -> final_alpha_cumprod = ac[0]: SD's DDIM/PNDM
        # configs set set_alpha_to_one=False (diffusers scheduler_config)
        ac_prev = ac_all[jnp.maximum(prev_t, 0)]
        x0 = (x - jnp.sqrt(1.0 - ac_t) * eps) / jnp.sqrt(ac_t)
        var = ((1.0 - ac_prev) / (1.0 - ac_t)) * (1.0 - ac_t / ac_prev)
        sigma = eta * jnp.sqrt(var)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - ac_prev - sigma ** 2, 0.0)) * eps
        x_prev = jnp.sqrt(ac_prev) * x0 + dir_xt
        if eta > 0.0:
            x_prev = x_prev + sigma * jax.random.normal(keys[i], x.shape)
        return x_prev

    return jax.lax.fori_loop(0, num_steps, body, x)


def _pndm_prev_sample(x, eps, ac_t, ac_prev):
    """PNDM transfer formula (Liu et al. 2022 eq. 11; diffusers
    PNDMScheduler._get_prev_sample)."""
    num = (ac_prev - ac_t) * eps
    den = jnp.sqrt(ac_t) * (jnp.sqrt((1.0 - ac_prev) * ac_t)
                            + jnp.sqrt((1.0 - ac_t) * ac_prev))
    return jnp.sqrt(ac_prev / ac_t) * x - num / den


def pndm_sample(eps_fn: Callable, schedule: NoiseSchedule, x: jax.Array,
                num_steps: int, steps_offset: int = 1) -> jax.Array:
    """PLMS (PNDM with skip_prk_steps=True — the SD pipeline default).

    Warmup (first step) runs the 2nd-order midpoint startup: a half
    update with eps(t), then eps re-evaluated at t-ratio//... — the
    diffusers skip-prk variant replaces the RK startup with
      e' = (eps(x,t) + eps(x_prev_half, prev_t)) / 2
    applied from the ORIGINAL x; later steps use the 4th-order
    Adams-Bashforth combination of the eps history
      e' = (55 e0 - 59 e1 + 37 e2 - 9 e3) / 24.
    """
    T = schedule.num_train_timesteps
    ratio = T // num_steps
    ts = leading_timesteps(T, num_steps, steps_offset)
    ac_all = schedule.alphas_cumprod

    def ac_of(t):
        return ac_all[jnp.maximum(t, 0)]

    def step_with(x, t, prev_t, e):
        ac_t = ac_of(t)
        ac_prev = ac_of(prev_t)     # prev_t<0 -> ac[0] (set_alpha_to_one=False)
        return _pndm_prev_sample(x, e, ac_t, ac_prev)

    # history: e0 newest .. e3 oldest, count of filled entries
    def body(i, carry):
        x, hist, n = carry
        t = ts[i]
        prev_t = t - ratio
        eps = eps_fn(x, t)

        def warmup(_):
            # 2nd-order startup (PNDMScheduler.step_plms branch for
            # len(ets) < 1 with skip_prk_steps: midpoint correction)
            x_half = step_with(x, t, prev_t, eps)
            eps2 = eps_fn(x_half, jnp.maximum(prev_t, 0))
            return (eps + eps2) / 2.0

        def adams(_):
            e0, e1, e2, e3 = hist[0], hist[1], hist[2], hist[3]
            return jnp.where(
                n >= 3,
                (55.0 * eps - 59.0 * e0 + 37.0 * e1 - 9.0 * e2) / 24.0,
                jnp.where(
                    n == 2,
                    (23.0 * eps - 16.0 * e0 + 5.0 * e1) / 12.0,
                    (3.0 * eps - e0) / 2.0))

        e_prime = jax.lax.cond(n == 0, warmup, adams, None)
        x_new = step_with(x, t, prev_t, e_prime)
        hist = jnp.roll(hist, 1, axis=0).at[0].set(eps)
        return (x_new, hist, jnp.minimum(n + 1, 4))

    hist0 = jnp.zeros((4,) + x.shape, x.dtype)
    x, _, _ = jax.lax.fori_loop(0, num_steps, body,
                                (x, hist0, jnp.int32(0)))
    return x


def ancestral_sample(eps_fn: Callable, schedule: NoiseSchedule,
                     x: jax.Array, num_steps: int, key: jax.Array,
                     steps_offset: int = 1) -> jax.Array:
    """DDPM ancestral sampling (Ho et al. 2020 alg. 2) on the leading-
    spaced timestep subset; posterior variance beta_t*(1-ac_prev)/(1-ac_t)."""
    T = schedule.num_train_timesteps
    ratio = T // num_steps
    ts = leading_timesteps(T, num_steps, steps_offset)
    ac_all = schedule.alphas_cumprod
    keys = jax.random.split(key, num_steps)

    def body(i, x):
        t = ts[i]
        prev_t = t - ratio
        eps = eps_fn(x, t)
        ac_t = ac_all[t]
        ac_prev = ac_all[jnp.maximum(prev_t, 0)]
        alpha_t = ac_t / ac_prev
        x0 = (x - jnp.sqrt(1.0 - ac_t) * eps) / jnp.sqrt(ac_t)
        x0 = jnp.clip(x0, -10.0, 10.0)
        # posterior mean in terms of x0 and x (DDPM eq. 7)
        coef0 = jnp.sqrt(ac_prev) * (1.0 - alpha_t) / (1.0 - ac_t)
        coefx = jnp.sqrt(alpha_t) * (1.0 - ac_prev) / (1.0 - ac_t)
        mean = coef0 * x0 + coefx * x
        var = (1.0 - alpha_t) * (1.0 - ac_prev) / (1.0 - ac_t)
        z = jax.random.normal(keys[i], x.shape)
        return jnp.where(prev_t >= 0,
                         mean + jnp.sqrt(jnp.maximum(var, 1e-20)) * z,
                         x0)

    return jax.lax.fori_loop(0, num_steps, body, x)


def resolve_scheduler(sched_d: Optional[dict],
                      default_schedule: Optional[NoiseSchedule] = None):
    """guidance.scheduler config block -> (NoiseSchedule, SamplerConfig).

    Mirrors the reference's per-config scheduler selection
    (stable_diffusion.py:90-107): the block carries both the TRAINING
    schedule's beta parameters (beta_start/end/schedule,
    num_train_timesteps — conf/guidance/sd_pndm.yaml) and the sampling
    loop's type.  Missing keys fall back to SD's scaled_linear defaults.
    """
    from .diffusion import scaled_linear_schedule
    d = dict(sched_d or {})
    typ = d.get("type", "ddim")
    if any(k in d for k in ("beta_start", "beta_end", "num_train_timesteps",
                            "beta_schedule")) or default_schedule is None:
        assert d.get("beta_schedule", "scaled_linear") == "scaled_linear", \
            "only the SD scaled_linear beta schedule is wired"
        schedule = scaled_linear_schedule(
            int(d.get("num_train_timesteps", 1000)),
            float(d.get("beta_start", 0.00085)),
            float(d.get("beta_end", 0.012)))
    else:
        schedule = default_schedule
    scfg = SamplerConfig(type=typ,
                         num_steps=int(d.get("num_steps", 25)),
                         eta=float(d.get("eta", 0.0)),
                         steps_offset=int(d.get("steps_offset", 1)))
    return schedule, scfg


def cfg_sample(cfg: SamplerConfig, schedule: NoiseSchedule, shape,
               key: jax.Array, guidance_scale: float,
               cond_uncond_eps: Callable) -> jax.Array:
    """CFG sampling from pure noise: ``cond_uncond_eps(lat2, t2)``
    returns the [2B] cond/uncond eps stack (cond first), combined as
    e_u + s(e_c - e_u) each step (the reference sample() loops,
    stable_diffusion_vsd.py:540-676)."""
    k_init, k_samp = jax.random.split(key)
    x = jax.random.normal(k_init, shape)
    B = shape[0]

    def eps_fn_cfg(x, t):
        lat2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * B,), t, jnp.int32)
        eps2 = cond_uncond_eps(lat2, t2)
        if eps2.shape[-1] == 2 * x.shape[-1]:     # variance-split nets
            eps2 = eps2[..., :x.shape[-1]]
        e_c, e_u = eps2[:B], eps2[B:]
        return e_u + guidance_scale * (e_c - e_u)

    return sample(cfg, eps_fn_cfg, schedule, x, key=k_samp)


def sample(cfg: SamplerConfig, eps_fn: Callable, schedule: NoiseSchedule,
           x: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
    """Dispatch on cfg.type (the guidance.scheduler config block)."""
    if cfg.type == "ddim":
        return ddim_sample(eps_fn, schedule, x, cfg.num_steps, key=key,
                           eta=cfg.eta, steps_offset=cfg.steps_offset)
    if cfg.type in ("pndm", "plms"):
        return pndm_sample(eps_fn, schedule, x, cfg.num_steps,
                           steps_offset=cfg.steps_offset)
    if cfg.type in ("ancestral", "ddpm"):
        assert key is not None, "ancestral sampling needs a PRNG key"
        return ancestral_sample(eps_fn, schedule, x, cfg.num_steps, key,
                                steps_offset=cfg.steps_offset)
    raise NotImplementedError(f"scheduler type {cfg.type}")
