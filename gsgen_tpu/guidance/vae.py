"""Diffusers-faithful AutoencoderKL (SD VAE) in flax.

The reference encodes renders into latents through the SD VAE
(reference guidance/stable_diffusion.py:280-284 ``vae.encode``,
stable_diffusion_vsd.py:415-440 encode/decode).  This reimplements
diffusers' AutoencoderKL encoder+decoder with a parameter tree in 1:1
bijection with the PyTorch state_dict (see convert.py):

* Encoder: conv_in -> DownEncoderBlock2D x4 (resnets x2, temb-less;
  asymmetric-pad stride-2 downsample after the first 3) -> mid_block
  (resnet, single-head spatial attention, resnet) -> GroupNorm(1e-6) ->
  silu -> conv_out (2*latent ch), then ``quant_conv`` 1x1.
* Decoder: ``post_quant_conv`` -> conv_in -> mid_block -> UpDecoderBlock2D
  x4 (resnets x3, nearest-2x upsample in the first 3) -> GroupNorm ->
  silu -> conv_out.
* Sampling uses the diagonal Gaussian posterior; SDS uses
  ``sample()`` x ``scaling_factor`` (0.18215).

The VAE attention keys follow modern diffusers naming
(group_norm / to_q / to_k / to_v / to_out.0 — all WITH bias).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .norm import GroupNorm
from .unet2d import Downsample2D, Upsample2D, make_resnet


class VAEAttention(nn.Module):
    """Single-head spatial self-attention (diffusers Attention as used
    in UNetMidBlock2D for the VAE: heads=1, biased projections)."""

    channels: int

    def setup(self):
        self.group_norm = GroupNorm(num_groups=32, epsilon=1e-6)
        self.to_q = nn.Dense(self.channels)
        self.to_k = nn.Dense(self.channels)
        self.to_v = nn.Dense(self.channels)
        self.to_out_0 = nn.Dense(self.channels)

    def __call__(self, x):
        B, H, W, C = x.shape
        h = self.group_norm(x).reshape(B, H * W, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        attn = jnp.einsum("blc,bsc->bls", q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn.astype(jnp.float32) / math.sqrt(C), -1)
        out = jnp.einsum("bls,bsc->blc", attn.astype(v.dtype), v)
        return x + self.to_out_0(out).reshape(B, H, W, C)


class DownEncoderBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True

    def setup(self):
        self.resnets = [
            make_resnet(self.in_channels if i == 0 else self.out_channels,
                        self.out_channels, use_temb=False, eps=1e-6)
            for i in range(self.num_layers)]
        if self.add_downsample:
            self.downsamplers_0 = Downsample2D(self.out_channels,
                                               asym_pad=True)

    def __call__(self, x):
        for res in self.resnets:
            x = res(x, None)
        if self.add_downsample:
            x = self.downsamplers_0(x)
        return x


class UpDecoderBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True

    def setup(self):
        self.resnets = [
            make_resnet(self.in_channels if i == 0 else self.out_channels,
                        self.out_channels, use_temb=False, eps=1e-6)
            for i in range(self.num_layers)]
        if self.add_upsample:
            self.upsamplers_0 = Upsample2D(self.out_channels)

    def __call__(self, x):
        for res in self.resnets:
            x = res(x, None)
        if self.add_upsample:
            x = self.upsamplers_0(x)
        return x


class VAEMidBlock(nn.Module):
    """UNetMidBlock2D for the VAE: resnet, attention, resnet."""

    channels: int

    def setup(self):
        self.resnets = [make_resnet(self.channels, self.channels,
                                    use_temb=False, eps=1e-6),
                        make_resnet(self.channels, self.channels,
                                    use_temb=False, eps=1e-6)]
        self.attentions = [VAEAttention(self.channels)]

    def __call__(self, x):
        x = self.resnets[0](x, None)
        x = self.attentions[0](x)
        return self.resnets[1](x, None)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    scaling_factor: float = 0.18215


SD_VAE = VAEConfig()
TINY_VAE = VAEConfig(block_out_channels=(32, 64), layers_per_block=1)


class Encoder(nn.Module):
    cfg: VAEConfig

    def setup(self):
        c = self.cfg
        self.conv_in = nn.Conv(c.block_out_channels[0], (3, 3), padding=1)
        blocks = []
        out_ch = c.block_out_channels[0]
        for i, ch in enumerate(c.block_out_channels):
            in_ch = out_ch
            out_ch = ch
            last = i == len(c.block_out_channels) - 1
            blocks.append(DownEncoderBlock2D(
                in_ch, ch, c.layers_per_block, add_downsample=not last))
        self.down_blocks = blocks
        self.mid_block = VAEMidBlock(c.block_out_channels[-1])
        self.conv_norm_out = GroupNorm(num_groups=32, epsilon=1e-6)
        self.conv_out = nn.Conv(2 * c.latent_channels, (3, 3), padding=1)

    def __call__(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            h = blk(h)
        h = self.mid_block(h)
        h = nn.silu(self.conv_norm_out(h))
        return self.conv_out(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    def setup(self):
        c = self.cfg
        rev = list(reversed(c.block_out_channels))
        self.conv_in = nn.Conv(rev[0], (3, 3), padding=1)
        self.mid_block = VAEMidBlock(rev[0])
        blocks = []
        out_ch = rev[0]
        for i, ch in enumerate(rev):
            in_ch = out_ch
            out_ch = ch
            last = i == len(rev) - 1
            blocks.append(UpDecoderBlock2D(
                in_ch, ch, c.layers_per_block + 1, add_upsample=not last))
        self.up_blocks = blocks
        self.conv_norm_out = GroupNorm(num_groups=32, epsilon=1e-6)
        self.conv_out = nn.Conv(3, (3, 3), padding=1)

    def __call__(self, z):
        h = self.conv_in(z)
        h = self.mid_block(h)
        for blk in self.up_blocks:
            h = blk(h)
        h = nn.silu(self.conv_norm_out(h))
        return self.conv_out(h)


class AutoencoderKL(nn.Module):
    """Encoder + decoder + quant convs; NHWC, images in [-1, 1]."""

    cfg: VAEConfig = SD_VAE

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1))
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1))

    def moments(self, x):
        """[B,H,W,3] in [-1,1] -> (mean, logvar) each [B,h,w,latent]."""
        m = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(m, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, key=None):
        """Posterior sample (key given) or mode, scaled by 0.18215
        (reference encode_images, stable_diffusion.py:170-178)."""
        mean, logvar = self.moments(x)
        if key is not None:
            mean = mean + jnp.exp(0.5 * logvar) * \
                jax.random.normal(key, mean.shape)
        return mean * self.cfg.scaling_factor

    def decode(self, z):
        """Latents (scaled) -> image in [-1, 1]."""
        z = z / self.cfg.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key=None):
        return self.decode(self.encode(x, key))
