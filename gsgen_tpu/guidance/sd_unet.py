"""Stable-Diffusion backbone: faithful flax UNet + VAE with a real
diffusers weight loader.

This is the real-weight path behind :mod:`gsgen_tpu.guidance.sds` /
:mod:`vsd` — the reference loads ``StableDiffusionPipeline`` from the
HF Hub (reference guidance/stable_diffusion.py:74-120); here the same
architecture lives in :mod:`unet2d` / :mod:`vae` (diffusers-exact
parameter layout) and ``load_diffusers_weights`` maps locally
provisioned safetensors through the mechanical rename in
:mod:`convert` — no network, no torch required.

Backbone interface (same as MockUNet):
  .latent_size / .latent_channels / .image_size, .params
  .encode_images(params, imgs) / .predict_noise(params, x_t, t, text,
      class_labels=None, lora_scale=1.0)
  .decode_latents(params, latents)  (sample()/sample_lora visualisation)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from .convert import (load_safetensors, torch_state_to_flax)
from .unet2d import get_timestep_embedding


def timestep_embedding(t, dim, max_period=10000.0):
    """Back-compat alias (sinusoidal embedding, diffusers layout)."""
    return get_timestep_embedding(t, dim, flip_sin_to_cos=True,
                                  max_period=max_period)


from .unet2d import (IF_PIXEL, SD15, SD21, TINY, TINY_VSD, UNetConfig,
                     UNet2DConditionModel)
from .vae import SD_VAE, TINY_VAE, AutoencoderKL, VAEConfig

__all__ = ["SDUNetBackbone", "UNetConfig", "TINY", "TINY_VSD", "SD21",
           "SD15", "IF_PIXEL", "load_diffusers_weights"]


class SDUNetBackbone:
    """UNet (+VAE) pair behind the guidance stack.

    ``vae_cfg=None`` gives the pixel-space variant (DeepFloyd style:
    latents are the image itself)."""

    def __init__(self, cfg: UNetConfig = TINY, latent_size: int = 64,
                 key: Optional[jax.Array] = None, use_vae: bool = True,
                 vae_cfg: Optional[VAEConfig] = None,
                 compute_dtype: Optional[str] = None):
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        self.cfg = cfg
        # compute_dtype="bfloat16" runs UNet/VAE forwards in bf16 (the
        # reference pipeline runs fp16, stable_diffusion.py:76): params
        # stay fp32 masters (LoRA/optimizer fidelity) and are cast at
        # use — XLA folds the converts into the matmul/conv operand
        # loads.  SDS never differentiates through the UNet, so reduced
        # precision only touches the frozen score evaluation.
        self.compute_dtype = (jnp.dtype(compute_dtype)
                              if compute_dtype else None)
        self.latent_size = latent_size
        self.latent_channels = cfg.in_channels
        self.unet = UNet2DConditionModel(cfg)
        if use_vae:
            self.vae_cfg = vae_cfg or (
                SD_VAE if cfg in (SD21, SD15) else TINY_VAE)
            down = 2 ** (len(self.vae_cfg.block_out_channels) - 1)
            self.image_size = latent_size * down
            self.vae = AutoencoderKL(self.vae_cfg)
        else:
            self.vae_cfg = None
            self.image_size = latent_size
            self.vae = None

        x = jnp.zeros((1, latent_size, latent_size, cfg.in_channels))
        ctx_dim = cfg.encoder_hid_dim or cfg.cross_attention_dim
        ctx = jnp.zeros((1, 4, ctx_dim))
        if cfg.class_embed_type == "timestep":
            cls = jnp.zeros((1,), jnp.int32)
        elif cfg.class_embed_proj_dim:
            cls = jnp.zeros((1, cfg.class_embed_proj_dim))
        else:
            cls = None
        # init under ONE jit: eager flax init compiles every param
        # initializer as its own pjit (~400 compiles, ~35 s on CPU even
        # for the tiny preset); a single jitted init is one cacheable
        # executable
        params = {"unet": jax.jit(self.unet.init)(
            k1, x, jnp.zeros((1,)), ctx, class_labels=cls)}
        if self.vae is not None:
            # full autoencode touches encoder+decoder+both quant convs;
            # param shapes are resolution-independent, so init on a
            # small dummy regardless of image_size
            down = 2 ** (len(self.vae_cfg.block_out_channels) - 1)
            dummy = max(4 * down, 16)
            params["vae"] = jax.jit(self.vae.init)(
                k2, jnp.zeros((1, dummy, dummy, 3)))
        self.params = params

    def encode_images(self, params, imgs, key=None):
        """[B,H,W,3] in [0,1] -> scaled latents (encode_images,
        reference stable_diffusion.py:170-178)."""
        if self.vae is None:
            B = imgs.shape[0]
            x = jax.image.resize(
                imgs, (B, self.latent_size, self.latent_size, 3), "bilinear")
            if self.latent_channels > 3:
                pad = jnp.zeros(x.shape[:3]
                                + (self.latent_channels - 3,))
                x = jnp.concatenate([x, pad], -1)
            return x * 2.0 - 1.0
        dt = self.compute_dtype
        p = params["vae"]
        x = imgs * 2.0 - 1.0
        if dt is not None:
            cast = lambda v: (v.astype(dt)
                              if jnp.issubdtype(v.dtype, jnp.floating) else v)
            p = jax.tree_util.tree_map(cast, p)
            x = x.astype(dt)
        z = self.vae.apply(p, x, key, method=AutoencoderKL.encode)
        return z.astype(jnp.float32) if dt is not None else z

    def decode_latents(self, params, latents):
        """Scaled latents -> [B,H,W,3] in [0,1] (decode_latents,
        reference stable_diffusion_vsd.py:425-440)."""
        if self.vae is None:
            return jnp.clip(latents[..., :3] * 0.5 + 0.5, 0.0, 1.0)
        img = self.vae.apply(params["vae"], latents,
                             method=AutoencoderKL.decode)
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

    def predict_noise(self, params, latents_noisy, t, text,
                      class_labels=None, lora_scale: float = 1.0):
        dt = self.compute_dtype
        p = params["unet"]
        if dt is not None:
            cast = lambda x: (x.astype(dt)
                              if jnp.issubdtype(x.dtype, jnp.floating) else x)
            p = jax.tree_util.tree_map(cast, p)
            latents_noisy = cast(latents_noisy)
            text = cast(text)
            if class_labels is not None:
                class_labels = cast(class_labels)
        eps = self.unet.apply(p, latents_noisy, t, text,
                              class_labels=class_labels,
                              lora_scale=lora_scale)
        return eps.astype(jnp.float32) if dt is not None else eps


def load_diffusers_weights(path: str, cfg: UNetConfig = SD21,
                           latent_size: int = 64,
                           vae_cfg: Optional[VAEConfig] = None,
                           use_vae: bool = True,
                           key: Optional[jax.Array] = None,
                           compute_dtype: Optional[str] = None,
                           ) -> SDUNetBackbone:
    """Build a backbone and fill it from a local diffusers checkpoint.

    ``path`` is a diffusers model directory (subfolders ``unet/`` and
    ``vae/`` holding ``*.safetensors``) or a directory that itself
    contains the UNet safetensors.  LoRA / class-embedding parameters
    (absent from pretrained checkpoints by construction) keep their
    fresh initialization.

    Round-trip-tested against :func:`convert.flax_to_torch_state`
    (tests/test_convert.py): serialize -> reload is bit-exact.
    """
    unet_dir = os.path.join(path, "unet")
    state = load_safetensors(unet_dir if os.path.isdir(unet_dir) else path)
    bb = SDUNetBackbone(cfg, latent_size=latent_size, key=key,
                        use_vae=use_vae, vae_cfg=vae_cfg,
                        compute_dtype=compute_dtype)
    bb.params = dict(bb.params)
    bb.params["unet"] = torch_state_to_flax(state, bb.params["unet"])
    if use_vae:
        vae_dir = os.path.join(path, "vae")
        vstate = load_safetensors(vae_dir if os.path.isdir(vae_dir)
                                  else path)
        bb.params["vae"] = torch_state_to_flax(vstate, bb.params["vae"])
    return bb
