"""In-process Point-E text->point-cloud diffusion sampler.

TPU-native redesign of the reference's vendored sampling stack
(point_e/diffusion/gaussian_diffusion.py, k_diffusion.py:116-280,
sampler.py:1-263 in gsgen3d/gsgen's /root/reference): two diffusion
stages (1024-point CLIP-textvec-conditioned base + 3072-point
unconditional upsampler), Karras sigma schedule, Heun (Algorithm 2)
sampler with stochastic churn, classifier-free guidance mixed on the
x0 prediction, channel scale/bias normalization.

Design deltas from the torch original (idiomatic JAX, not a port):

* every per-step scalar — karras sigmas, churn inflation
  ``sqrt(sigma_hat^2 - sigma^2)``, the sigma -> discrete-timestep
  lookup (``GaussianToKarrasDenoiser.sigma_to_t`` does a scipy
  interp1d per step at runtime; here the schedule is static so the
  whole table is one host-side ``np.interp``), and the x0-prediction
  coefficients ``sqrt(1/acp[t])`` / ``sqrt(1/acp[t]-1)`` — is
  precomputed on the host and fed to ``lax.scan`` as stacked xs;
* the sampling loop is ONE jitted ``lax.scan`` over Heun steps (two
  batched transformer evals per step) plus a closed-form Euler
  epilogue: no data-dependent Python control flow, static shapes;
* CFG runs as a doubled batch through the same eval (cond embedding
  stacked with zeros), exactly the reference's ``guided_denoiser``
  (k_diffusion.py:170-178): per-branch clip to [-1,1] THEN mix.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..guidance.point_e import (POINT_E_CHANNEL_BIASES,
                                POINT_E_CHANNEL_SCALES)

# ---------------------------------------------------------------------------
# Noise schedules (gaussian_diffusion.py:16-73) — host-side float64
# ---------------------------------------------------------------------------


def linear_betas(T: int) -> np.ndarray:
    scale = 1000.0 / T
    return np.linspace(scale * 0.0001, scale * 0.02, T, dtype=np.float64)


def cosine_betas(T: int, max_beta: float = 0.999) -> np.ndarray:
    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    betas = [min(1 - alpha_bar((i + 1) / T) / alpha_bar(i / T), max_beta)
             for i in range(T)]
    return np.array(betas, dtype=np.float64)


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Discrete-time diffusion constants (gaussian_diffusion.py:150-214)."""

    alphas_cumprod: np.ndarray          # [T] float64

    @classmethod
    def named(cls, name: str, T: int = 1024) -> "NoiseSchedule":
        betas = {"cosine": cosine_betas, "linear": linear_betas}[name](T)
        return cls(alphas_cumprod=np.cumprod(1.0 - betas))

    @property
    def num_timesteps(self) -> int:
        return self.alphas_cumprod.shape[0]

    def sigma_to_t(self, sigma: np.ndarray) -> np.ndarray:
        """VE sigma -> discrete timestep index, truncating like the
        reference's ``th.long`` cast (k_diffusion.py:90-104)."""
        acp = self.alphas_cumprod
        target = 1.0 / (np.asarray(sigma, np.float64) ** 2 + 1.0)
        # acp is decreasing; np.interp needs increasing xp
        tt = np.interp(target, acp[::-1], np.arange(len(acp))[::-1],
                       left=len(acp) - 1, right=0.0)
        tt = np.where(target > acp[0], 0.0, tt)
        tt = np.where(target <= acp[-1], len(acp) - 1, tt)
        return tt.astype(np.int64)

    def x0_coeffs(self, t: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(sqrt_recip_acp[t], sqrt_recipm1_acp[t]) — eps -> x0
        (gaussian_diffusion.py:373-379)."""
        acp = self.alphas_cumprod[t]
        return np.sqrt(1.0 / acp), np.sqrt(1.0 / acp - 1.0)


def karras_sigmas(n: int, sigma_min: float, sigma_max: float,
                  rho: float = 7.0) -> np.ndarray:
    """Karras et al. 2022 schedule + terminal 0 (k_diffusion.py:193-200)."""
    ramp = np.linspace(0.0, 1.0, n)
    lo, hi = sigma_min ** (1 / rho), sigma_max ** (1 / rho)
    sig = (hi + ramp * (lo - hi)) ** rho
    return np.concatenate([sig, [0.0]])


# ---------------------------------------------------------------------------
# Per-step constants for the jitted Heun scan
# ---------------------------------------------------------------------------


def _denoise_consts(sched: NoiseSchedule, sigmas: np.ndarray):
    """(t, c_in, sqrt_recip, sqrt_recipm1) arrays for eval points."""
    t = sched.sigma_to_t(sigmas)
    c_in = 1.0 / np.sqrt(sigmas ** 2 + 1.0)
    sr, srm1 = sched.x0_coeffs(t)
    return (t.astype(np.float32), c_in.astype(np.float32),
            sr.astype(np.float32), srm1.astype(np.float32))


def heun_step_constants(sched: NoiseSchedule, sigmas: np.ndarray,
                        s_churn: float):
    """Stack every per-step scalar of k_diffusion.py:239-280 (sample_heun)
    into arrays indexed by step: all of it is static given the schedule."""
    n = len(sigmas) - 1                       # steps (last entry is 0)
    sig = sigmas[:-1]
    sig_next = sigmas[1:]
    gamma = min(s_churn / n, math.sqrt(2.0) - 1.0) if s_churn > 0 else 0.0
    sigma_hat = sig * (gamma + 1.0)
    noise_scale = (np.sqrt(np.maximum(sigma_hat ** 2 - sig ** 2, 0.0))
                   if gamma > 0 else np.zeros_like(sig))
    tA, c_inA, srA, srm1A = _denoise_consts(sched, sigma_hat)
    # second (Heun-correction) eval at sigma_next; last step has none —
    # guard the 0 with 1 (the epilogue never uses it)
    safe_next = np.where(sig_next > 0, sig_next, 1.0)
    tB, c_inB, srB, srm1B = _denoise_consts(sched, safe_next)
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    return {
        "sigma_hat": f32(sigma_hat), "sigma_next": f32(sig_next),
        "noise_scale": f32(noise_scale),
        "tA": f32(tA), "c_inA": f32(c_inA), "srA": f32(srA),
        "srm1A": f32(srm1A),
        "tB": f32(tB), "c_inB": f32(c_inB), "srB": f32(srB),
        "srm1B": f32(srm1B),
    }


# ---------------------------------------------------------------------------
# Stage sampler
# ---------------------------------------------------------------------------


def make_stage_sampler(apply_fn: Callable, steps: int, sigma_min: float,
                       sigma_max: float, s_churn: float,
                       guidance_scale: float, schedule: str = "cosine",
                       num_timesteps: int = 1024, channels: int = 6):
    """Build a jitted ``sample(params, x_T, cond, low_res, key)`` for one
    diffusion stage.

    ``apply_fn(params, x, t, cond=, low_res=)`` is the eps model
    ([B, 2C, N] output, first C = eps; learned variance ignored — the
    karras path only consumes pred_xstart, k_diffusion.py:99-108).
    ``x_T`` must already be scaled by sigma_max.
    """
    sched = NoiseSchedule.named(schedule, num_timesteps)
    sigmas = karras_sigmas(steps, sigma_min, sigma_max)
    consts = heun_step_constants(sched, sigmas, s_churn)
    use_cfg = guidance_scale not in (0.0, 1.0)
    C = channels

    def denoised_fn(params, x, t, c_in, sr, srm1, cond, low_res):
        """GaussianToKarrasDenoiser.denoise + clip + CFG mix."""
        if use_cfg:
            xin = jnp.concatenate([x, x], axis=0) * c_in
        else:
            xin = x * c_in
        B = xin.shape[0]
        tt = jnp.full((B,), t, jnp.float32)
        lr = low_res
        if lr is not None and use_cfg:
            lr = jnp.concatenate([lr, lr], axis=0)
        eps = apply_fn(params, xin, tt, cond=cond, low_res=lr)[:, :C]
        x0 = jnp.clip(sr * xin - srm1 * eps, -1.0, 1.0)
        if use_cfg:
            cond_x0, uncond_x0 = jnp.split(x0, 2, axis=0)
            x0 = uncond_x0 + guidance_scale * (cond_x0 - uncond_x0)
        return x0

    def sample(params, x_T, cond, low_res, key):
        # cond: [2B, F] (cond rows then zero rows) under CFG, else [B, F]
        # or None; low_res: [B, C, N_lo] or None
        def body(carry, xs):
            x, key = carry
            key, k = jax.random.split(key)
            x = x + jax.random.normal(k, x.shape) * xs["noise_scale"]
            den = denoised_fn(params, x, xs["tA"], xs["c_inA"], xs["srA"],
                              xs["srm1A"], cond, low_res)
            d = (x - den) / xs["sigma_hat"]
            dt = xs["sigma_next"] - xs["sigma_hat"]
            x2 = x + d * dt
            den2 = denoised_fn(params, x2, xs["tB"], xs["c_inB"], xs["srB"],
                               xs["srm1B"], cond, low_res)
            d2 = (x2 - den2) / xs["sigma_next"]
            x = x + (d + d2) * 0.5 * dt
            return (x, key), None

        head = {k: v[:-1] for k, v in consts.items()}
        (x, key), _ = jax.lax.scan(body, (x_T, key), head)
        # Euler epilogue (sigma_next == 0): x_new = x + (x-den)/sh * (0-sh)
        # = den — the final sample IS the last clipped x0 prediction
        last = {k: v[-1] for k, v in consts.items()}
        key, k = jax.random.split(key)
        x = x + jax.random.normal(k, x.shape) * last["noise_scale"]
        x = denoised_fn(params, x, last["tA"], last["c_inA"], last["srA"],
                        last["srm1A"], cond, low_res)
        return x

    return jax.jit(sample), float(sigmas[0])


# ---------------------------------------------------------------------------
# Two-stage orchestration (sampler.py:96-170 semantics)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PointESamplerConfig:
    """Defaults = utils/point_e_helper.py:32-40 + sampler.py:36-40."""

    num_points: int = 4096
    base_points: int = 1024
    guidance_scale: float = 3.0          # base stage; upsampler unguided
    karras_steps: Tuple[int, int] = (64, 64)
    sigma_min: Tuple[float, float] = (1e-3, 1e-3)
    sigma_max: Tuple[float, float] = (120.0, 160.0)
    s_churn: Tuple[float, float] = (3.0, 0.0)
    schedules: Tuple[str, str] = ("cosine", "linear")
    num_timesteps: int = 1024
    # image pipeline (utils/point_e_helper.py:85-92): BOTH stages take
    # the CLIP grid and BOTH run CFG 3.0 (the text pipeline leaves the
    # upsampler unconditional/unguided)
    up_guidance_scale: float = 0.0
    up_cond: bool = False


class PointESampler:
    """Two-stage text -> colored-point-cloud sampler.

    ``base_model`` is a :class:`~gsgen_tpu.guidance.point_e.PointEModel`
    (textvec transformer); ``upsampler`` a
    :class:`~gsgen_tpu.guidance.point_e.PointEUpsamplerModel` or None
    (base stage only).  Works weight-free with the tiny presets for
    tests; load real checkpoints via each model's ``load_weights``.
    """

    def __init__(self, base_model, upsampler=None,
                 cfg: PointESamplerConfig = PointESamplerConfig()):
        self.cfg = cfg
        self.base = base_model
        self.up = upsampler
        n_base = min(cfg.base_points, base_model.cfg.n_ctx)
        self._base_n = base_model.cfg.n_ctx
        del n_base
        self._sample_base, self._smax0 = make_stage_sampler(
            lambda p, x, t, cond=None, low_res=None:
                base_model.apply(p, x, t, cond=cond),
            cfg.karras_steps[0], cfg.sigma_min[0], cfg.sigma_max[0],
            cfg.s_churn[0], cfg.guidance_scale, cfg.schedules[0],
            cfg.num_timesteps, base_model.cfg.input_channels)
        if upsampler is not None:
            self._sample_up, self._smax1 = make_stage_sampler(
                # sampler cond convention is [B, L, D] grid tokens; the
                # upsampler module mirrors the torch reference's
                # channels-first [B, D, L] (transformer.py:493)
                lambda p, x, t, cond=None, low_res=None:
                    upsampler.apply(p, x, t, low_res=low_res,
                                    embeddings=(jnp.swapaxes(cond, 1, 2)
                                                if cfg.up_cond else None)),
                cfg.karras_steps[1], cfg.sigma_min[1], cfg.sigma_max[1],
                cfg.s_churn[1], cfg.up_guidance_scale, cfg.schedules[1],
                cfg.num_timesteps, upsampler.cfg.input_channels)

    def sample(self, key: jax.Array, textvec: Optional[jax.Array],
               batch_size: int = 1) -> jax.Array:
        """-> [B, C, N] UNSCALED model output (xyz + RGB in [0,255])."""
        C = self.base.cfg.input_channels
        N0 = self.base.cfg.n_ctx
        k0, k1, k2, k3 = jax.random.split(key, 4)

        if textvec is None:
            textvec = jnp.zeros((batch_size, self.base.cfg.clip_feature_dim))
        if textvec.ndim == 1:
            textvec = jnp.broadcast_to(textvec[None],
                                       (batch_size, textvec.shape[0]))
        if textvec.ndim == 2 and textvec.shape[0] != batch_size:
            # a [L, D] CLIP grid for one image: add the batch dim
            textvec = jnp.broadcast_to(
                textvec[None], (batch_size,) + textvec.shape)
        # CFG doubling: [cond; zeros] (sampler.py:133-135) — works for
        # [B, F] text vectors and [B, L, D] image grids alike
        cond2 = jnp.concatenate([textvec, jnp.zeros_like(textvec)], axis=0)

        x_T = jax.random.normal(k0, (batch_size, C, N0)) * self._smax0
        base_scaled = self._sample_base(self.base.params, x_T, cond2,
                                        None, k1)
        base = _unscale(base_scaled)
        if self.up is None:
            return base

        N1 = self.up.cfg.n_ctx
        x_T = jax.random.normal(k2, (batch_size, C, N1)) * self._smax1
        up_cond = cond2 if self.cfg.up_cond else None
        up_scaled = self._sample_up(self.up.params, x_T, up_cond, base, k3)
        up = _unscale(up_scaled)
        # final cloud = [low_res | upsampled] (sampler.py:164-168)
        return jnp.concatenate([base, up], axis=-1)

    def sample_to_cloud(self, key, textvec, batch_size: int = 1
                        ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (xyz [N, 3], rgb [N, 3] in [0, 1]) for the first batch item
        (PointCloudSampler.output_to_point_clouds semantics)."""
        out = np.asarray(self.sample(key, textvec, batch_size)[0])
        xyz = out[:3].T.astype(np.float32)
        rgb = np.clip(np.round(out[3:6]), 0.0, 255.0).T / 255.0
        return xyz, rgb.astype(np.float32)


def _unscale(x: jax.Array) -> jax.Array:
    """Model space -> raw space (gaussian_diffusion.py:971-980)."""
    s = jnp.asarray(POINT_E_CHANNEL_SCALES)[: x.shape[1]]
    b = jnp.asarray(POINT_E_CHANNEL_BIASES)[: x.shape[1]]
    return (x - b[None, :, None]) / s[None, :, None]
