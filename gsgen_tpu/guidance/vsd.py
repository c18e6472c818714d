"""Variational Score Distillation (ProlificDreamer) guidance.

Port of guidance/stable_diffusion_vsd.py:52-676 in gsgen3d/gsgen over
the pluggable backbone:

* two eps-predictions per step: the frozen pretrained model at CFG
  scale ``guidance_scale`` (view-dependent prompts, LoRA scale 0,
  class embedding disabled — the reference's single_model path,
  :446-480) and the LoRA-adapted copy at ``guidance_scale_lora``
  conditioned on the camera (:485-530),
* grad = w(t) (ε_pretrain_cfg − ε_lora) applied via the reparam trick,
* the LoRA branch trains with the standard denoising loss on renders
  (``train_lora``, :537-581) using view-INDEPENDENT conditional text,
  t ~ U[0, T), and 10% whole-batch camera-condition dropout,
* camera conditioning: the [3,4] c2w padded with [0,0,0,1] and
  flattened to [B,16], fed through the UNet's class embedding — a
  TimestepEmbedding(16, 1280) exactly like the reference attaches to
  ``unet_lora.class_embedding`` (:145-148),
* LoRA adapters on every attention projection (q/k/v/out down+up,
  diffusers LoRAAttnProcessor, :151-179) — these live inside the flax
  UNet parameter tree (see unet2d.Attention) and the trainable subtree
  is extracted here and optimized by the Trainer's ``gp`` pytree,
* ``sample`` / ``sample_lora`` visualization (:300-395) via a jitted
  DDIM loop (the reference uses DPMSolver++ 25 steps; DDIM at the same
  step count is the documented delta).

For the MockUNet test backbone (no attention layers) a small additive
conditioned low-rank adapter stands in so the identical trainer code
path (frozen/train split, lr_guidance, loss_lora) is exercised.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..prompt.processors import PromptEmbedding
from .diffusion import MockUNet, NoiseSchedule, scaled_linear_schedule


def _pad_c2w16(c2ws: jax.Array) -> jax.Array:
    """[B,3,4] camera-to-world -> flattened homogeneous [B,16]
    (reference forward():629-633 pads the last row)."""
    B = c2ws.shape[0]
    last = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (B, 1))
    return jnp.concatenate([c2ws.reshape(B, -1), last], axis=-1)


@dataclasses.dataclass
class VSDConfig:
    """conf/guidance/vsd.yaml defaults."""

    guidance_scale: float = 7.5
    guidance_scale_lora: float = 1.0
    lora_cfg_training: bool = True
    lora_cfg_drop_prob: float = 0.1
    lora_n_timestamp_samples: int = 1
    use_view_dependent_prompt: bool = True
    min_step_percent: float = 0.02
    max_step_percent: object = 0.98
    weighting_strategy: str = "sds"
    camera_condition_dim: int = 16      # flattened homogeneous c2w
    backbone_latent_size: int = 64   # MockUNet size knob (tests/bench)
    lora_rank: int = 4
    lr_lora: float = 1e-4
    grad_clip: Optional[float] = None
    # sampling scheduler for sample/sample_lora (reference uses the
    # pipeline's DDIM; {type: ddim|pndm|ancestral, num_steps, ...})
    scheduler: Optional[dict] = None


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
        # faithful path: real UNet with LoRA attention adapters + camera
        # class embedding inside its parameter tree
        bb_cfg = getattr(self.backbone, "cfg", None)
        self.faithful = (getattr(self.backbone, "unet", None) is not None
                         and getattr(bb_cfg, "lora_rank", 0) > 0)
        if self.faithful:
            from flax.traverse_util import flatten_dict
            flat = flatten_dict(self.backbone.params["unet"])
            self.trainable_params = {
                "/".join(k): v for k, v in flat.items()
                if any(("lora" in p) or (p == "class_embedding")
                       for p in k)}
            if not self.trainable_params:
                raise ValueError("VSD backbone has lora_rank>0 but no "
                                 "LoRA/class_embedding params were found")
        else:
            key = key if key is not None else jax.random.PRNGKey(42)
            k1, k2 = jax.random.split(key)
            c = self.backbone.latent_channels
            r = cfg.lora_rank
            # additive conditioned low-rank adapter: eps_lora = eps_base
            # + up( act( down(latents) + cam_proj(cond) ) )
            self.trainable_params = {
                "down": jax.random.normal(k1, (c, r)) * 0.05,
                "up": jnp.zeros((r, c)),
                "cam": jax.random.normal(
                    k2, (cfg.camera_condition_dim, r)) * 0.05,
                "cam_b": jnp.zeros((r,)),
            }

    def sched_scalars(self, step: int, max_steps: int) -> Dict[str, float]:
        from ..utils.schedule import C
        T = self.schedule.num_train_timesteps
        return {
            "min_t": int(C(self.cfg.min_step_percent, step, max_steps) * T),
            "max_t": int(C(self.cfg.max_step_percent, step, max_steps) * T),
            "lr_guidance": float(C(self.cfg.lr_lora, step, max_steps)),
        }

    # ---- eps predictions ----

    def _merged_unet(self, frozen, train):
        """Overlay the trainable LoRA/class-embedding leaves onto the
        frozen UNet tree (functional analog of unet_lora sharing the
        pretrained weights, reference :84-179)."""
        from flax.traverse_util import flatten_dict, unflatten_dict
        flat = dict(flatten_dict(frozen["unet"]))
        for k, v in train.items():
            flat[tuple(k.split("/"))] = v
        return unflatten_dict(flat)

    def _eps_pretrain(self, frozen, lat, t, text):
        """Frozen model: LoRA scale 0, class embedding off
        (disable_unet_class_embedding + scale 0.0, :446-480)."""
        if self.faithful:
            return self.backbone.unet.apply(frozen["unet"], lat, t, text,
                                            class_labels=None,
                                            lora_scale=0.0)
        return self.backbone.predict_noise(frozen, lat, t, text)

    def _eps_lora(self, frozen, train, lat, t, text, cam_cond):
        """LoRA model: adapters at scale 1 + camera class labels."""
        if self.faithful:
            merged = self._merged_unet(frozen, train)
            return self.backbone.unet.apply(merged, lat, t, text,
                                            class_labels=cam_cond,
                                            lora_scale=1.0)
        base = self.backbone.predict_noise(frozen, lat, t, text)
        h = lat @ train["down"]                               # [N,h,w,r]
        cam = cam_cond @ train["cam"] + train["cam_b"]        # [N,r]
        h = jax.nn.gelu(h + cam[:, None, None, :])
        return base + h @ train["up"]

    def _camera_condition(self, c2ws: jax.Array) -> jax.Array:
        if self.cfg.camera_condition_dim == 16:
            return _pad_c2w16(c2ws)
        return c2ws.reshape(c2ws.shape[0], -1)

    # ---- training loss ----

    def loss(self, params, rgb, embedding: PromptEmbedding, elevation,
             azimuth, camera_distance, key, sched, c2ws=None, **_
             ) -> Dict[str, jax.Array]:
        frozen, train = params["frozen"], params["train"]
        cfg = self.cfg
        bb = self.backbone
        B = rgb.shape[0]
        k_t, k_noise, k_lt, k_ln, k_drop = jax.random.split(key, 5)
        cam_cond = self._camera_condition(c2ws)

        imgs = jax.image.resize(rgb, (B, bb.image_size, bb.image_size, 3),
                                "bilinear")
        latents = bb.encode_images(frozen, imgs)
        emb_vd = embedding.get_text_embedding(
            elevation, azimuth, camera_distance,
            cfg.use_view_dependent_prompt)
        # view-INDEPENDENT embedding for the LoRA branch (:485-487)
        emb_vi = embedding.get_text_embedding(
            elevation, azimuth, camera_distance, False)
        emb_vi_cond = emb_vi[:B]

        # --- VSD gradient (no grad through either network, :449-534) ---
        t = jax.random.randint(k_t, (B,), sched["min_t"], sched["max_t"] + 1)
        noise = jax.random.normal(k_noise, latents.shape)
        latents_noisy = self.schedule.add_noise(latents, noise, t)
        ln = jax.lax.stop_gradient(latents_noisy)
        lat2 = jnp.concatenate([ln] * 2, axis=0)
        t2 = jnp.concatenate([t] * 2, axis=0)

        eps_pre = self._eps_pretrain(frozen, lat2, t2, emb_vd)
        ep_text, ep_uncond = eps_pre[:B], eps_pre[B:]
        eps_pretrain = ep_uncond + cfg.guidance_scale * (ep_text - ep_uncond)

        cam2 = jnp.concatenate([cam_cond, jnp.zeros_like(cam_cond)], axis=0)
        emb_lora = jnp.concatenate([emb_vi_cond] * 2, axis=0)
        eps_l = jax.lax.stop_gradient(
            self._eps_lora(frozen, train, lat2, t2, emb_lora, cam2))
        el_cam, el_uncond = eps_l[:B], eps_l[B:]
        eps_lora = el_uncond + cfg.guidance_scale_lora * (el_cam - el_uncond)

        ac = self.schedule.alphas_cumprod[t].reshape(-1, 1, 1, 1)
        w = (1.0 - ac) if cfg.weighting_strategy == "sds" else 1.0
        grad = w * jax.lax.stop_gradient(eps_pretrain - eps_lora)
        grad = jnp.nan_to_num(grad)
        if cfg.grad_clip is not None:
            grad = jnp.clip(grad, -cfg.grad_clip, cfg.grad_clip)
        target = jax.lax.stop_gradient(latents - grad)
        loss_vsd = 0.5 * jnp.sum((latents - target) ** 2) / B

        # --- LoRA denoising loss (train_lora, :537-581) ---
        latents_sg = jax.lax.stop_gradient(latents)
        S = cfg.lora_n_timestamp_samples
        if S > 1:
            latents_sg = jnp.tile(latents_sg, (S, 1, 1, 1))
        t_l = jax.random.randint(k_lt, (B * S,), 0,
                                 self.schedule.num_train_timesteps)
        noise_l = jax.random.normal(k_ln, latents_sg.shape)
        noisy_l = self.schedule.add_noise(latents_sg, noise_l, t_l)
        cam_l = jnp.tile(cam_cond, (S, 1))
        if cfg.lora_cfg_training:
            # whole-batch dropout (reference uses random.random() < 0.1)
            drop = jax.random.bernoulli(k_drop, cfg.lora_cfg_drop_prob)
            cam_l = jnp.where(drop, 0.0, cam_l)
        emb_cond = jnp.tile(emb_vi_cond, (S, 1, 1))
        eps_hat = self._eps_lora(frozen, train, noisy_l, t_l, emb_cond,
                                 cam_l)
        loss_lora = jnp.mean((eps_hat - noise_l) ** 2)

        return {"loss_vsd": loss_vsd, "loss_lora": loss_lora,
                "grad_norm": jnp.linalg.norm(grad.reshape(-1))}

    # ---- visualization sampling (reference _sample/sample/sample_lora,
    # :236-395) ----

    def _ddim_sample(self, frozen, train, text2, key, guidance_scale,
                     num_steps, cam2=None, lora: bool = False):
        """CFG sampling from pure noise via the configured scheduler
        (guidance/samplers.py — DDIM by default like the reference's
        pipeline sampling, stable_diffusion_vsd.py:540-676); text2/cam2
        are the CFG-expanded [2B] conditionings (cond first)."""
        from .samplers import cfg_sample, resolve_scheduler
        bb = self.backbone
        B = text2.shape[0] // 2
        shape = (B, bb.latent_size, bb.latent_size, bb.latent_channels)
        schedule, scfg = resolve_scheduler(self.cfg.scheduler,
                                           self.schedule)
        scfg = dataclasses.replace(scfg, num_steps=num_steps)

        def cond_uncond_eps(lat2, t2):
            if lora:
                return self._eps_lora(frozen, train, lat2, t2, text2, cam2)
            return self._eps_pretrain(frozen, lat2, t2, text2)

        x = cfg_sample(scfg, schedule, shape, key, guidance_scale,
                       cond_uncond_eps)
        return bb.decode_latents(frozen, x)

    def sample(self, params, embedding: PromptEmbedding, elevation,
               azimuth, camera_distance, key, num_steps: int = 25):
        """Images from the frozen model at ``guidance_scale``
        (reference sample(), :300-330)."""
        frozen = params["frozen"] if "frozen" in params else params
        emb_vd = embedding.get_text_embedding(
            elevation, azimuth, camera_distance,
            self.cfg.use_view_dependent_prompt)
        return self._ddim_sample(frozen, None, emb_vd, key,
                                 self.cfg.guidance_scale, num_steps)

    def sample_lora(self, params, embedding: PromptEmbedding, elevation,
                    azimuth, camera_distance, c2ws, key,
                    num_steps: int = 25):
        """Images from the LoRA model conditioned on the camera
        (reference sample_lora(), :332-395)."""
        frozen, train = params["frozen"], params["train"]
        B = elevation.shape[0]
        emb_vi = embedding.get_text_embedding(
            elevation, azimuth, camera_distance, False)
        emb2 = jnp.concatenate([emb_vi[:B]] * 2, axis=0)
        cam = self._camera_condition(c2ws)
        cam2 = jnp.concatenate([cam, jnp.zeros_like(cam)], axis=0)
        return self._ddim_sample(frozen, train, emb2, key,
                                 self.cfg.guidance_scale_lora, num_steps,
                                 cam2=cam2, lora=True)
