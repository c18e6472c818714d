"""Diffusion super-resolution upsampler (DeepFloyd IF-II equivalent).

The reference upsamples 64² renders with diffusers'
``IFSuperResolutionPipeline`` (IF-II-L) before the upsample fine-tune
(reference guidance/deep_floyd.py:353-389, trainer.py:736-857).  This
is that pipeline rebuilt TPU-native:

* the super-res UNet consumes ``concat([x_t, noise-augmented low-res
  conditioning image])`` on channels (6 in), predicts (eps, variance)
  (6 out), and is conditioned on the augmentation ``noise_level``
  through a timestep-style class embedding — the structure of
  diffusers' IF-II config (class_embed_type="timestep");
* the conditioning image is bilinear-upscaled to the target reso and
  noised to ``noise_level`` (IFSuperResolutionPipeline.__call__'s
  ``self.image_noising_scheduler.add_noise``);
* sampling is CFG DDIM over the full resolution, eps channels only.

Real IF-II-L weights load through the same diffusers rename table as
the SD UNet (:mod:`convert`) when provisioned locally; the tiny preset
keeps the loop testable without weights.  Block-family delta vs the
real IF-II (ResnetDownsample blocks) is documented in
:data:`unet2d.IF_PIXEL`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .diffusion import NoiseSchedule, scaled_linear_schedule
from .unet2d import UNetConfig, UNet2DConditionModel

# IF-II-style preset: 3-channel hires + 3-channel conditioning in,
# (eps, variance) out, T5 text conditioning, noise-level aug embedding.
IF2_PIXEL = UNetConfig(in_channels=6, out_channels=6,
                       block_out_channels=(64, 128, 256, 256),
                       layers_per_block=2,
                       cross_attention_dim=256,
                       attention_head_dim=(8, 8, 8, 8),
                       cross_attn_levels=(False, True, True, True),
                       encoder_hid_dim=4096,
                       class_embed_type="timestep")
TINY_SR = UNetConfig(in_channels=6, out_channels=6,
                     block_out_channels=(32, 64), layers_per_block=1,
                     cross_attention_dim=1024,
                     attention_head_dim=(2, 2),
                     cross_attn_levels=(True, True),
                     class_embed_type="timestep")


@dataclasses.dataclass
class UpsamplerConfig:
    reso: int = 256
    num_steps: int = 50
    guidance_scale: float = 4.0
    noise_level: int = 250      # IFSuperResolutionPipeline default


class DiffusionUpsampler:
    """IF-II-style super-resolution: 64² renders -> ``reso``² images."""

    def __init__(self, cfg: UpsamplerConfig = UpsamplerConfig(),
                 unet_cfg: UNetConfig = TINY_SR,
                 schedule: Optional[NoiseSchedule] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg
        self.unet_cfg = unet_cfg
        self.unet = UNet2DConditionModel(unet_cfg)
        self.schedule = schedule or scaled_linear_schedule()
        key = key if key is not None else jax.random.PRNGKey(0)
        r = cfg.reso
        x = jnp.zeros((1, r, r, unet_cfg.in_channels))
        ctx_dim = unet_cfg.encoder_hid_dim or unet_cfg.cross_attention_dim
        self.params = self.unet.init(key, x, jnp.zeros((1,)),
                                     jnp.zeros((1, 4, ctx_dim)),
                                     class_labels=jnp.zeros((1,), jnp.int32))

    def load_weights(self, path: str):
        """Fill from local diffusers IF-II safetensors (zero egress:
        assets are provisioned, never downloaded)."""
        from .convert import load_safetensors, torch_state_to_flax
        self.params = torch_state_to_flax(load_safetensors(path),
                                          self.params)
        return self

    def upsample_images(self, params, rgb, text2, key):
        """[B,h,w,3] in [0,1] + CFG-expanded text [2B,L,D] -> [B,R,R,3]
        in [0,1] (reference upsample_images, deep_floyd.py:353-385)."""
        cfg = self.cfg
        B, R = rgb.shape[0], cfg.reso
        k_aug, k_x = jax.random.split(key)
        cond = jax.image.resize(rgb, (B, R, R, 3), "bilinear") * 2.0 - 1.0
        lvl = jnp.full((B,), cfg.noise_level, jnp.int32)
        cond = self.schedule.add_noise(
            cond, jax.random.normal(k_aug, cond.shape), lvl)

        x = jax.random.normal(k_x, (B, R, R, 3))
        T = self.schedule.num_train_timesteps
        ts = jnp.round(jnp.linspace(T - 1, 0, cfg.num_steps)
                       ).astype(jnp.int32)
        ac_all = self.schedule.alphas_cumprod
        cond2 = jnp.concatenate([cond] * 2, axis=0)
        lvl2 = jnp.concatenate([lvl] * 2, axis=0)

        def body(i, x):
            t = ts[i]
            x2 = jnp.concatenate([x] * 2, axis=0)
            inp = jnp.concatenate([x2, cond2], axis=-1)
            t2 = jnp.full((2 * B,), t, jnp.int32)
            out = self.unet.apply(params, inp, t2, text2,
                                  class_labels=lvl2)
            eps2 = out[..., :3]                      # variance split
            e_c, e_u = eps2[:B], eps2[B:]
            eps = e_u + cfg.guidance_scale * (e_c - e_u)
            ac_t = ac_all[t]
            ac_prev = jnp.where(
                i + 1 < cfg.num_steps,
                ac_all[ts[jnp.minimum(i + 1, cfg.num_steps - 1)]], 1.0)
            x0 = (x - jnp.sqrt(1.0 - ac_t) * eps) / jnp.sqrt(ac_t)
            x0 = jnp.clip(x0, -1.0, 1.0)
            return jnp.sqrt(ac_prev) * x0 + jnp.sqrt(1.0 - ac_prev) * eps

        x = jax.lax.fori_loop(0, cfg.num_steps, body, x)
        return jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)

    def make_upsample_fn(self, embedding, elevation, azimuth,
                         camera_distance, use_view_dependent: bool = True):
        """Bind prompt conditioning -> ``upsample_fn(rgb, key)`` for
        :func:`gsgen_tpu.training.upsample.tune_with_upsample`."""
        def fn(rgb, key):
            B = rgb.shape[0]
            text2 = embedding.get_text_embedding(
                elevation[:B], azimuth[:B], camera_distance[:B],
                use_view_dependent)
            return self.upsample_images(self.params, rgb, text2, key)
        return fn
