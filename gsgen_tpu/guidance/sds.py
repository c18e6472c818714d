"""Score Distillation Sampling guidance (+ perp-neg), backbone-agnostic.

Port of the reference SDS core (guidance/stable_diffusion.py:160-346 in
gsgen3d/gsgen) as a pure-JAX function over a pluggable
:mod:`gsgen_tpu.guidance.diffusion` backbone:

* encode rendered rgb to latents (VAE or identity),
* ``t ~ U[min_t, max_t]`` with the bounds arriving as host-evaluated
  ``C()`` schedule scalars (max_step_percent annealing,
  conf/base.yaml:106-113),
* classifier-free guidance at scale 100, optionally with Perp-Neg
  negative-direction removal (:178-210),
* ``w(t)`` in {sds: 1-ᾱ, uniform, fantasia3d: ᾱ^0.5 (1-ᾱ)} (:236-247),
* reparameterized loss ``0.5 ||latents - sg(latents - w(ε̂-ε))||² / B``
  (:303-304) with nan_to_num + optional grad clip.

The UNet forward is wrapped in stop_gradient (the reference runs it
under no_grad, :218-228).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..prompt.processors import PromptEmbedding
from .diffusion import MockUNet, NoiseSchedule, scaled_linear_schedule


def perpendicular_component(x, y):
    """Component of x orthogonal to y, batched over leading dim
    (utils/ops.py:21-30)."""
    dims = tuple(range(1, x.ndim))
    num = jnp.sum(x * y, axis=dims)
    den = jnp.maximum(jnp.sum(y * y, axis=dims), 1e-6)
    shape = (-1,) + (1,) * (x.ndim - 1)
    return x - (num / den).reshape(shape) * y


@dataclasses.dataclass
class SDSConfig:
    """conf/base.yaml:95-113 + conf/guidance/*.yaml defaults."""

    guidance_scale: float = 100.0
    weighting_strategy: str = "sds"          # sds | uniform | fantasia3d
    use_view_dependent_prompt: bool = True
    use_perp_negative: bool = False
    min_step_percent: float = 0.02
    max_step_percent: object = (0.98, 0.5, 2001)   # C() spec
    grad_clip: Optional[float] = None
    rgb_as_latents: bool = False
    backbone_latent_size: int = 64   # MockUNet size knob (tests/bench)
    # sampling scheduler for the visualization/sample paths (reference
    # selects DDIM vs PNDM per config, stable_diffusion.py:90-107 +
    # conf/guidance/sd_pndm.yaml): {type: ddim|pndm|ancestral, ...}
    scheduler: Optional[dict] = None


class SDSGuidance:
    """StableDiffusionGuidance equivalent; ``loss`` is jit-pure."""

    def __init__(self, cfg: SDSConfig, backbone=None,
                 schedule: Optional[NoiseSchedule] = None):
        self.cfg = cfg
        self.backbone = backbone or MockUNet(
            latent_size=cfg.backbone_latent_size)
        if schedule is None and cfg.scheduler:
            # guidance.scheduler carries the training betas too
            # (conf/guidance/sd_pndm.yaml); reference rebuilds the
            # scheduler from them (stable_diffusion.py:90-107)
            from .samplers import resolve_scheduler
            schedule, _ = resolve_scheduler(cfg.scheduler)
        self.schedule = schedule or scaled_linear_schedule()
        self.params = self.backbone.params
        self.frozen_params = self.backbone.params
        self.trainable_params = {}

    def sample(self, params, embedding: PromptEmbedding, elevation,
               azimuth, camera_distance, key, num_steps: int = 25):
        """text2img from the frozen score network with the configured
        scheduler (the reference samples through the pipeline's
        DDIM/PNDM per conf/guidance/*.yaml; used by the trainer's
        guidance-eval hook)."""
        import dataclasses as _dc
        from .samplers import cfg_sample, resolve_scheduler
        if isinstance(params, dict) and "frozen" in params:
            params = params["frozen"]
        bb = self.backbone
        emb = embedding.get_text_embedding(
            elevation, azimuth, camera_distance,
            self.cfg.use_view_dependent_prompt)
        B = elevation.shape[0]
        shape = (B, bb.latent_size, bb.latent_size, bb.latent_channels)
        schedule, scfg = resolve_scheduler(self.cfg.scheduler, self.schedule)
        scfg = _dc.replace(scfg, num_steps=num_steps)
        x = cfg_sample(scfg, schedule, shape, key, self.cfg.guidance_scale,
                       lambda lat2, t2: bb.predict_noise(
                           params, lat2, t2, emb))
        if hasattr(bb, "decode_latents"):
            return bb.decode_latents(params, x)
        return jnp.clip(x[..., :3] * 0.5 + 0.5, 0.0, 1.0)

    def sched_scalars(self, step: int, max_steps: int) -> Dict[str, float]:
        """Host-side t-range annealing (set_min_max_steps, :122-128)."""
        from ..utils.schedule import C
        T = self.schedule.num_train_timesteps
        return {
            "min_t": int(C(self.cfg.min_step_percent, step, max_steps) * T),
            "max_t": int(C(self.cfg.max_step_percent, step, max_steps) * T),
        }

    def loss(self, params, rgb, embedding: PromptEmbedding, elevation,
             azimuth, camera_distance, key, sched, **_) -> Dict[str, jax.Array]:
        if isinstance(params, dict) and "frozen" in params:
            params = params["frozen"]
        cfg = self.cfg
        bb = self.backbone
        B = rgb.shape[0]
        k_t, k_noise = jax.random.split(key)

        if cfg.rgb_as_latents:
            # pixel-space guidance (DeepFloyd style): latents ARE the
            # (resized) image, channel-padded to the backbone width
            latents = jax.image.resize(
                rgb, (B, bb.latent_size, bb.latent_size, rgb.shape[-1]),
                "bilinear")
            if latents.shape[-1] < bb.latent_channels:
                pad = jnp.zeros(latents.shape[:3]
                                + (bb.latent_channels - latents.shape[-1],))
                latents = jnp.concatenate([latents, pad], axis=-1)
        else:
            imgs = jax.image.resize(
                rgb, (B, bb.image_size, bb.image_size, 3), "bilinear")
            latents = bb.encode_images(params, imgs)

        t = jax.random.randint(k_t, (B,), sched["min_t"], sched["max_t"] + 1)
        noise = jax.random.normal(k_noise, latents.shape)
        latents_noisy = self.schedule.add_noise(latents, noise, t)

        C_lat = latents.shape[-1]

        def split_variance(eps):
            # IF-style nets predict (eps, variance) stacked on channels
            # (reference deep_floyd.py:147,174-181: split(3, dim=1) per
            # CFG chunk before combining — channel-slicing the raw
            # output first is identical); variance only steers ancestral
            # sampling, never the SDS gradient.
            if eps.shape[-1] == 2 * C_lat:
                return eps[..., :C_lat]
            return eps

        def no_grad_eps(latents_noisy):
            ln = jax.lax.stop_gradient(latents_noisy)
            if cfg.use_perp_negative:
                emb, neg_w = embedding.get_text_embeddings_perp_neg(
                    elevation, azimuth, camera_distance)
                lat4 = jnp.concatenate([ln] * 4, axis=0)
                t4 = jnp.concatenate([t] * 4, axis=0)
                eps = split_variance(bb.predict_noise(params, lat4, t4, emb))
                eps_text = eps[:B]
                eps_uncond = eps[B:2 * B]
                eps_neg = eps[2 * B:]
                e_pos = eps_text - eps_uncond
                accum = jnp.zeros_like(e_pos)
                for i in range(2):
                    e_i = eps_neg[i::2] - eps_uncond
                    accum = accum + neg_w[:, i].reshape(-1, 1, 1, 1) * \
                        perpendicular_component(e_i, e_pos)
                return eps_uncond + cfg.guidance_scale * (e_pos + accum)
            emb = embedding.get_text_embedding(
                elevation, azimuth, camera_distance,
                cfg.use_view_dependent_prompt)
            lat2 = jnp.concatenate([ln] * 2, axis=0)
            t2 = jnp.concatenate([t] * 2, axis=0)
            eps = split_variance(bb.predict_noise(params, lat2, t2, emb))
            eps_text, eps_uncond = eps[:B], eps[B:]
            # reference combines as text + s*(text - uncond)  (:231-234)
            return eps_text + cfg.guidance_scale * (eps_text - eps_uncond)

        noise_pred = jax.lax.stop_gradient(no_grad_eps(latents_noisy))

        ac = self.schedule.alphas_cumprod[t].reshape(-1, 1, 1, 1)
        if cfg.weighting_strategy == "sds":
            w = 1.0 - ac
        elif cfg.weighting_strategy == "uniform":
            w = 1.0
        elif cfg.weighting_strategy == "fantasia3d":
            w = ac ** 0.5 * (1.0 - ac)
        else:
            raise ValueError(cfg.weighting_strategy)

        grad = w * (noise_pred - noise)
        grad = jnp.nan_to_num(grad)
        if cfg.grad_clip is not None:
            grad = jnp.clip(grad, -cfg.grad_clip, cfg.grad_clip)

        target = jax.lax.stop_gradient(latents - grad)
        loss_sds = 0.5 * jnp.sum((latents - target) ** 2) / B
        return {"loss_sds": loss_sds,
                "grad_norm": jnp.linalg.norm(grad.reshape(-1))}
