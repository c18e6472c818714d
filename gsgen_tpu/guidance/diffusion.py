"""Pluggable diffusion backbones + noise schedules for guidance.

The reference drives HF ``diffusers`` pipelines (StableDiffusionPipeline
fp16, guidance/stable_diffusion.py:49-120 in gsgen3d/gsgen).  diffusers
is not available here and checkpoints cannot be downloaded (zero
egress), so guidance is built against this small interface instead:

  DiffusionBackbone:
    .latent_size / .latent_channels / .image_size
    .encode_images(params, imgs [B,H,W,3]) -> latents [B,h,w,c]
    .predict_noise(params, latents_noisy [B,h,w,c], t [B], text [N,L,D])
        -> eps [N,h,w,c]   (N = latents batch, already CFG-expanded)
    .params — frozen weight pytree

``MockUNet`` is a tiny conditioned convnet (random frozen weights) used
for tests/benchmarks — it exercises the identical SDS/CFG/perp-neg
code path.  A flax SD UNet loading local safetensors plugs in through
the same interface once weights are provisioned (see load_sd_backbone).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class NoiseSchedule(NamedTuple):
    """DDPM/DDIM alphas (diffusers DDIMScheduler equivalents)."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    num_train_timesteps: int

    def add_noise(self, x0, noise, t):
        """sqrt(ac)x0 + sqrt(1-ac)noise (scheduler.add_noise)."""
        ac = self.alphas_cumprod[t]
        shape = (x0.shape[0],) + (1,) * (x0.ndim - 1)
        return (jnp.sqrt(ac).reshape(shape) * x0
                + jnp.sqrt(1.0 - ac).reshape(shape) * noise)


def cosine_schedule(num_train_timesteps: int = 1024,
                    max_beta: float = 0.999) -> NoiseSchedule:
    """Nichol-Dhariwal cosine schedule (point_e
    gaussian_diffusion.get_named_beta_schedule "cosine")."""
    t = np.arange(num_train_timesteps + 1) / num_train_timesteps
    abar = np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
    betas = np.minimum(1.0 - abar[1:] / abar[:-1], max_beta)
    alphas = 1.0 - betas
    return NoiseSchedule(betas=jnp.asarray(betas, jnp.float32),
                         alphas_cumprod=jnp.asarray(
                             np.cumprod(alphas), jnp.float32),
                         num_train_timesteps=num_train_timesteps)


def scaled_linear_schedule(num_train_timesteps: int = 1000,
                           beta_start: float = 0.00085,
                           beta_end: float = 0.012) -> NoiseSchedule:
    """Stable Diffusion's ``scaled_linear`` beta schedule."""
    betas = jnp.linspace(beta_start ** 0.5, beta_end ** 0.5,
                         num_train_timesteps) ** 2
    alphas = 1.0 - betas
    return NoiseSchedule(betas=betas, alphas_cumprod=jnp.cumprod(alphas),
                         num_train_timesteps=num_train_timesteps)


class MockUNet:
    """Tiny text-conditioned eps-predictor with frozen random weights.

    latents are a bilinear downsample of rgb (identity "VAE"), so SDS
    gradients flow back to pixels exactly like the rgb_as_latents path
    of the reference (guidance/stable_diffusion.py:276-279).
    """

    def __init__(self, key=None, latent_size: int = 64, channels: int = 4,
                 text_dim: int = 1024, hidden: int = 32):
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        s = 0.1
        self.latent_size = latent_size
        self.latent_channels = channels
        self.image_size = latent_size * 8
        self.params = {
            "w_in": jax.random.normal(k1, (3, 3, channels + 1, hidden)) * s,
            "w_txt": jax.random.normal(k2, (text_dim, hidden)) * s,
            "w_mid": jax.random.normal(k3, (3, 3, hidden, hidden)) * s,
            "w_out": jax.random.normal(k4, (3, 3, hidden, channels)) * s,
        }

    def encode_images(self, params, imgs):
        """[B, H, W, 3] -> [B, h, w, c]: bilinear resize + channel lift."""
        B = imgs.shape[0]
        h = self.latent_size
        x = jax.image.resize(imgs, (B, h, h, 3), "bilinear")
        pad = jnp.zeros((B, h, h, self.latent_channels - 3))
        return jnp.concatenate([x, pad], axis=-1) * 2.0 - 1.0

    def predict_noise(self, params, latents_noisy, t, text):
        tt = (t.astype(jnp.float32) / 1000.0)
        tmap = jnp.broadcast_to(
            tt[:, None, None, None],
            latents_noisy.shape[:3] + (1,))
        x = jnp.concatenate([latents_noisy, tmap], axis=-1)
        conv = lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ctx = jnp.mean(text, axis=1) @ params["w_txt"]        # [N, hidden]
        h = jax.nn.gelu(conv(x, params["w_in"]) + ctx[:, None, None, :])
        h = jax.nn.gelu(conv(h, params["w_mid"]))
        return conv(h, params["w_out"])


@dataclasses.dataclass
class SDWeightsNotAvailable(RuntimeError):
    path: str

    def __str__(self):
        return (
            f"Stable Diffusion weights not found at {self.path!r}. This "
            "environment has no network egress; provision safetensors "
            "locally and pass weights_path, or use MockUNet for "
            "development (same guidance code path).")


def load_sd_backbone(weights_path: Optional[str] = None, preset: str = "sd21",
                     latent_size: int = 64, **kw):
    """Load a real SD UNet+VAE from local diffusers safetensors.

    Interface-compatible with MockUNet; raises a clear error when the
    weights are absent (reference downloads from HF Hub,
    guidance/stable_diffusion.py:70-89 — impossible offline).
    """
    import os
    if not weights_path or not os.path.exists(weights_path):
        raise SDWeightsNotAvailable(str(weights_path))
    from .sd_unet import SD15, SD21, TINY, load_diffusers_weights
    cfg = {"tiny": TINY, "sd15": SD15, "sd21": SD21}[preset]
    return load_diffusers_weights(weights_path, cfg,
                                  latent_size=latent_size, **kw)
