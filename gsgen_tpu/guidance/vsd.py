"""Variational Score Distillation (ProlificDreamer) guidance.

Port of guidance/stable_diffusion_vsd.py:52-676 in gsgen3d/gsgen over
the pluggable backbone:

* two eps-predictions per step: the frozen pretrained model at CFG
  scale ``guidance_scale`` (7.5) and a LoRA-adapted copy at CFG 1
  conditioned on the camera (:388-460),
* grad = w(t) (ε_pretrain_cfg − ε_lora) applied via the reparam trick,
* the LoRA branch trains with the standard denoising loss on renders
  (``train_lora``, :462-500) with 10% camera-condition dropout
  (lora_cfg_training),
* camera conditioning = flattened c2w through a learned embedding (the
  reference uses TimestepEmbedding(16, 1280), :145-148).

LoRA here is an additive low-rank adapter over the backbone's noise
prediction; for a real SD UNet backbone the adapters attach to the
attention projections exactly like diffusers' LoRAAttnProcessor
(:151-179) — the interface (frozen, train) is already threaded through
the trainer.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..prompt.processors import PromptEmbedding
from .diffusion import MockUNet, NoiseSchedule, scaled_linear_schedule


@dataclasses.dataclass
class VSDConfig:
    """conf/guidance/vsd.yaml defaults."""

    guidance_scale: float = 7.5
    lora_cfg_training: bool = True
    lora_cfg_drop_prob: float = 0.1
    use_view_dependent_prompt: bool = True
    min_step_percent: float = 0.02
    max_step_percent: object = 0.98
    weighting_strategy: str = "sds"
    camera_condition_dim: int = 12      # flattened [3, 4] c2w
    backbone_latent_size: int = 64   # MockUNet size knob (tests/bench)
    lora_rank: int = 8
    grad_clip: Optional[float] = None


class VSDGuidance:
    """StableDiffusionVSDGuidance equivalent.  ``loss`` returns
    ``loss_vsd`` (drives the scene) + ``loss_lora`` (drives the LoRA
    params, which the Trainer optimizes via the ``train`` pytree)."""

    trainable = True

    def __init__(self, cfg: VSDConfig, backbone=None,
                 schedule: Optional[NoiseSchedule] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg
        self.backbone = backbone or MockUNet(
            latent_size=cfg.backbone_latent_size)
        self.schedule = schedule or scaled_linear_schedule()
        self.frozen_params = self.backbone.params
        self.params = self.backbone.params
        key = key if key is not None else jax.random.PRNGKey(42)
        k1, k2, k3 = jax.random.split(key, 3)
        c = self.backbone.latent_channels
        r = cfg.lora_rank
        hid = 32
        # additive conditioned low-rank adapter: eps_lora = eps_base +
        # up( act( down(latents) + cam_proj(cond) + t_proj ) )
        self.trainable_params = {
            "down": jax.random.normal(k1, (c, r)) * 0.05,
            "up": jnp.zeros((r, c)),
            "cam": jax.random.normal(k2, (cfg.camera_condition_dim, r)) * 0.05,
            "cam_b": jnp.zeros((r,)),
        }

    def sched_scalars(self, step: int, max_steps: int) -> Dict[str, float]:
        from ..utils.schedule import C
        T = self.schedule.num_train_timesteps
        return {
            "min_t": int(C(self.cfg.min_step_percent, step, max_steps) * T),
            "max_t": int(C(self.cfg.max_step_percent, step, max_steps) * T),
        }

    def _eps_lora(self, frozen, train, latents_noisy, t, text, cam_cond):
        """Backbone eps + camera-conditioned low-rank correction."""
        base = self.backbone.predict_noise(frozen, latents_noisy, t, text)
        h = latents_noisy @ train["down"]                     # [N,h,w,r]
        cam = cam_cond @ train["cam"] + train["cam_b"]        # [N,r]
        h = jax.nn.gelu(h + cam[:, None, None, :])
        return base + h @ train["up"]

    def loss(self, params, rgb, embedding: PromptEmbedding, elevation,
             azimuth, camera_distance, key, sched, c2ws=None, **_
             ) -> Dict[str, jax.Array]:
        frozen, train = params["frozen"], params["train"]
        cfg = self.cfg
        bb = self.backbone
        B = rgb.shape[0]
        k_t, k_noise, k_lt, k_ln, k_drop = jax.random.split(key, 5)
        cam_cond = c2ws.reshape(B, -1)

        imgs = jax.image.resize(rgb, (B, bb.image_size, bb.image_size, 3),
                                "bilinear")
        latents = bb.encode_images(frozen, imgs)
        emb2 = embedding.get_text_embedding(
            elevation, azimuth, camera_distance,
            cfg.use_view_dependent_prompt)

        # --- VSD gradient (no grad through either network, :388-460) ---
        t = jax.random.randint(k_t, (B,), sched["min_t"], sched["max_t"] + 1)
        noise = jax.random.normal(k_noise, latents.shape)
        latents_noisy = self.schedule.add_noise(latents, noise, t)
        ln = jax.lax.stop_gradient(latents_noisy)
        lat2 = jnp.concatenate([ln] * 2, axis=0)
        t2 = jnp.concatenate([t] * 2, axis=0)

        eps_pre = bb.predict_noise(frozen, lat2, t2, emb2)
        ep_text, ep_uncond = eps_pre[:B], eps_pre[B:]
        eps_pretrain = ep_uncond + cfg.guidance_scale * (ep_text - ep_uncond)

        cam2 = jnp.concatenate([cam_cond, jnp.zeros_like(cam_cond)], axis=0)
        eps_l = self._eps_lora(frozen, train, lat2, t2, emb2, cam2)
        el_text, el_uncond = eps_l[:B], eps_l[B:]
        eps_lora = el_uncond + 1.0 * (el_text - el_uncond)

        ac = self.schedule.alphas_cumprod[t].reshape(-1, 1, 1, 1)
        w = (1.0 - ac) if cfg.weighting_strategy == "sds" else 1.0
        grad = w * jax.lax.stop_gradient(eps_pretrain - eps_lora)
        grad = jnp.nan_to_num(grad)
        if cfg.grad_clip is not None:
            grad = jnp.clip(grad, -cfg.grad_clip, cfg.grad_clip)
        target = jax.lax.stop_gradient(latents - grad)
        loss_vsd = 0.5 * jnp.sum((latents - target) ** 2) / B

        # --- LoRA denoising loss (train_lora, :462-500) ---
        latents_sg = jax.lax.stop_gradient(latents)
        t_l = jax.random.randint(k_lt, (B,), 0,
                                 self.schedule.num_train_timesteps)
        noise_l = jax.random.normal(k_ln, latents_sg.shape)
        noisy_l = self.schedule.add_noise(latents_sg, noise_l, t_l)
        cam_l = cam_cond
        if cfg.lora_cfg_training:
            drop = jax.random.bernoulli(k_drop, cfg.lora_cfg_drop_prob,
                                        (B, 1))
            cam_l = jnp.where(drop, 0.0, cam_l)
        emb_cond = emb2[:B]
        eps_hat = self._eps_lora(frozen, train, noisy_l, t_l, emb_cond, cam_l)
        loss_lora = jnp.mean((eps_hat - noise_l) ** 2)

        return {"loss_vsd": loss_vsd, "loss_lora": loss_lora,
                "grad_norm": jnp.linalg.norm(grad.reshape(-1))}
