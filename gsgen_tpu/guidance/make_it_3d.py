"""Make-It-3D guidance: SDS + CLIP reference losses for image-to-3D.

Port of guidance/make_it_3d.py:25-260 in gsgen3d/gsgen over pluggable
encoders: novel views are pulled toward the reference image in CLIP
image-embedding space (get_normal_clip_loss) while the original view is
supervised photometrically (see training.sit3d).  CLIP weights are an
asset (zero egress); ``MockImageEncoder`` is a frozen random convnet
giving a real (if meaningless) similarity landscape so the full loss
path runs in tests.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .sds import SDSConfig, SDSGuidance


class MockImageEncoder:
    """Frozen random patch-embedding encoder -> [D] image features."""

    def __init__(self, key=None, dim: int = 128, patch: int = 8,
                 reso: int = 64):
        key = key if key is not None else jax.random.PRNGKey(11)
        self.reso = reso
        self.patch = patch
        n_patch = (reso // patch) ** 2
        self.params = {
            "w": jax.random.normal(key, (patch * patch * 3, dim)) * 0.05,
            "pool": jax.random.normal(jax.random.PRNGKey(12),
                                      (n_patch, 1)) * 0.1,
        }

    def encode(self, params, imgs):
        """[B, H, W, 3] -> [B, D] L2-normalized features."""
        B = imgs.shape[0]
        x = jax.image.resize(imgs, (B, self.reso, self.reso, 3), "bilinear")
        p = self.patch
        n = self.reso // p
        x = x.reshape(B, n, p, n, p, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, n * n, p * p * 3)
        feat = jax.nn.gelu(x @ params["w"])                 # [B, P, D]
        pooled = jnp.sum(feat * params["pool"][None], axis=1)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-8)


@dataclasses.dataclass
class MakeIt3DConfig(SDSConfig):
    clip_weight: float = 1.0


class MakeIt3DGuidance(SDSGuidance):
    """SDS + CLIP-reference loss (guidance/make_it_3d.py:25-260)."""

    def __init__(self, cfg: MakeIt3DConfig, backbone=None,
                 image_encoder=None, ref_image=None, ref_text_embed=None):
        """``image_encoder``: anything with ``.params`` and
        ``.encode(params, imgs) -> [B, D]`` — the real tower is
        :class:`gsgen_tpu.prompt.clip_vision.CLIPImageEncoder` over
        provisioned ViT-B/16 weights; the mock keeps tests hermetic.
        ``ref_text_embed``: optional L2-normalized CLIP text embedding
        of the prompt (the ``clip_text_loss`` term of
        make_it_3d.py:258-260)."""
        super().__init__(cfg, backbone)
        self.image_encoder = image_encoder or MockImageEncoder()
        self.ref_image = ref_image
        self.ref_text_embed = ref_text_embed

    def clip_ref_loss(self, rgb, is_original) -> jax.Array:
        """1 - cos(clip(render), clip(ref)) on NOVEL views, plus the
        text-alignment term when a prompt embedding was provided
        (get_normal_clip_loss, make_it_3d.py:244-260)."""
        enc = self.image_encoder
        f_r = enc.encode(enc.params, rgb)                   # [B, D]
        f_ref = enc.encode(enc.params, self.ref_image[None])[0]
        dissim = 1.0 - jnp.sum(f_r * f_ref[None, :], axis=-1)
        if self.ref_text_embed is not None:
            dissim = dissim + (
                1.0 - jnp.sum(f_r * self.ref_text_embed[None, :], axis=-1))
        novel = 1.0 - is_original
        return jnp.sum(dissim * novel) / jnp.maximum(
            jnp.sum(novel), 1e-6)

    def loss(self, params, rgb, embedding, elevation, azimuth,
             camera_distance, key, sched, batch_is_original=None, **kw
             ) -> Dict[str, jax.Array]:
        out = super().loss(params, rgb, embedding, elevation, azimuth,
                           camera_distance, key, sched, **kw)
        if self.ref_image is not None and batch_is_original is not None:
            out["loss_clip"] = self.cfg.clip_weight * self.clip_ref_loss(
                rgb, batch_is_original)
        return out
