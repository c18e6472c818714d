"""CLIP vision tower in flax, transformers-exact.

The reference's Make-It-3D guidance encodes rendered/reference images
with OpenAI CLIP (reference guidance/make_it_3d.py:29-57
``clip.load("ViT-B/16")`` + ``clip_encode_image``); Point-E's
image-conditioned model uses the ViT-L/14 image embedding (reference
point_e/models/pretrained_clip.py).  This is the vision transformer in
flax with a parameter tree in 1:1 bijection with the transformers
``CLIPVisionModelWithProjection`` PyTorch state_dict, loaded through
:mod:`gsgen_tpu.guidance.convert`.  Output parity is tested against a
randomly-initialized transformers oracle (tests/test_text_encoders.py).

Reuses the encoder blocks of :mod:`gsgen_tpu.prompt.clip` — text and
vision share the transformer trunk; vision differs only in the patch
embedding front-end, the absence of the causal mask, and CLS pooling.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..guidance.convert import torch_state_to_flax
from .clip import CLIPEncoder

# OpenAI CLIP normalization constants (clip/clip.py _transform)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 224
    patch_size: int = 16
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5


# openai/clip-vit-base-patch16 (the reference's Make-It-3D encoder)
VIT_B16 = CLIPVisionConfig()
# openai/clip-vit-large-patch14 (Point-E image conditioning)
VIT_L14 = CLIPVisionConfig(hidden_size=1024, intermediate_size=4096,
                           num_hidden_layers=24, num_attention_heads=16,
                           patch_size=14)
TINY_VISION = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                               num_hidden_layers=2, num_attention_heads=2,
                               image_size=32, patch_size=8)


class CLIPVisionEmbeddings(nn.Module):
    cfg: CLIPVisionConfig

    def setup(self):
        c = self.cfg
        n_patches = (c.image_size // c.patch_size) ** 2
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02),
            (c.hidden_size,))
        self.patch_embedding = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), use_bias=False,
            padding="VALID")
        self.position_embedding = nn.Embed(n_patches + 1, c.hidden_size)

    def __call__(self, pixels):
        """pixels [B, H, W, 3] (NHWC, already normalized) -> [B, 1+P, D]."""
        B = pixels.shape[0]
        patches = self.patch_embedding(pixels)          # [B, h, w, D]
        patches = patches.reshape(B, -1, self.cfg.hidden_size)
        cls = jnp.broadcast_to(self.class_embedding[None, None],
                               (B, 1, self.cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        pos = jnp.arange(x.shape[1])[None, :]
        return x + self.position_embedding(pos)


class CLIPVisionTransformer(nn.Module):
    cfg: CLIPVisionConfig

    def setup(self):
        eps = self.cfg.layer_norm_eps
        self.embeddings = CLIPVisionEmbeddings(self.cfg)
        # attribute name matches the (misspelled) transformers module
        # so the state_dict bijection stays mechanical
        self.pre_layrnorm = nn.LayerNorm(epsilon=eps)
        self.encoder = CLIPEncoder(self.cfg)
        self.post_layernorm = nn.LayerNorm(epsilon=eps)

    def __call__(self, pixels):
        x = self.pre_layrnorm(self.embeddings(pixels))
        x = self.encoder(x, jnp.zeros((1, 1, 1, 1), jnp.float32))
        return self.post_layernorm(x[:, 0])             # pooled CLS

    def grid_features(self, pixels):
        """All patch tokens WITHOUT the final layernorm — the Point-E
        image-grid conditioning (point_e pretrained_clip.py:177-214
        embed_images_grid runs the visual transformer and returns
        x[..., 1:] before ln_post).  -> [B, L, D]."""
        x = self.pre_layrnorm(self.embeddings(pixels))
        x = self.encoder(x, jnp.zeros((1, 1, 1, 1), jnp.float32))
        return x[:, 1:]


class CLIPVisionModelWithProjection(nn.Module):
    """Projected pooled image embedding (transformers
    CLIPVisionModelWithProjection; equals OpenAI clip.encode_image)."""

    cfg: CLIPVisionConfig
    projection_dim: int = 512

    def setup(self):
        self.vision_model = CLIPVisionTransformer(self.cfg)
        self.visual_projection = nn.Dense(self.projection_dim,
                                          use_bias=False)

    def __call__(self, pixels):
        return self.visual_projection(self.vision_model(pixels))

    def grid_features(self, pixels):
        return self.vision_model.grid_features(pixels)


def load_clip_vision(state_dict, cfg: CLIPVisionConfig,
                     projection_dim: int = 512,
                     key: Optional[jax.Array] = None):
    """(module, params) for CLIPVisionModelWithProjection from its
    transformers state_dict.  ``class_embedding`` DOES exist in vision
    checkpoints, so the default skip list is overridden."""
    import numpy as np
    module = CLIPVisionModelWithProjection(cfg, projection_dim)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    template = jax.eval_shape(
        lambda: module.init(key or jax.random.PRNGKey(0), dummy))
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    state = {k: np.asarray(v) for k, v in state_dict.items()
             if "position_ids" not in k}
    params = torch_state_to_flax(state, template, skip_substrings=("lora",))
    return module, params


class CLIPImageEncoder:
    """Adapter with the Make-It-3D ``encode(params, imgs)`` interface:
    resize [B, H, W, 3] in [0, 1] to the CLIP resolution, apply the CLIP
    normalization, run the tower, L2-normalize (the reference normalizes
    embeddings before the cosine losses, make_it_3d.py:47-56)."""

    def __init__(self, module: CLIPVisionModelWithProjection, params):
        self.module = module
        self.params = params
        self.reso = module.cfg.image_size

    @classmethod
    def from_state_dict(cls, state_dict, cfg: CLIPVisionConfig = VIT_B16,
                        projection_dim: int = 512):
        return cls(*load_clip_vision(state_dict, cfg, projection_dim))

    def encode(self, params, imgs):
        B = imgs.shape[0]
        x = jax.image.resize(imgs, (B, self.reso, self.reso, 3), "bilinear")
        mean = jnp.asarray(CLIP_IMAGE_MEAN)
        std = jnp.asarray(CLIP_IMAGE_STD)
        x = (x - mean) / std
        emb = self.module.apply(params, x)
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)

    def encode_grid(self, params, imgs):
        """[B, H, W, 3] in [0,1] -> [B, L, D] CLIP patch-grid tokens for
        Point-E image conditioning.  Resize is bicubic (the OpenAI CLIP
        preprocess uses BICUBIC; the reference feeds PIL images through
        it, pretrained_clip.py:216-217)."""
        B = imgs.shape[0]
        x = jax.image.resize(imgs, (B, self.reso, self.reso, 3), "cubic")
        mean = jnp.asarray(CLIP_IMAGE_MEAN)
        std = jnp.asarray(CLIP_IMAGE_STD)
        x = (x - mean) / std
        return self.module.apply(params, x, method="grid_features")
