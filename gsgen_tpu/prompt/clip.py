"""CLIP text encoder in flax, transformers-exact.

The reference encodes prompts with ``CLIPTextModel`` via transformers
(reference prompt/stable_diffusion_prompt.py:1-46).  This reimplements
the text tower in flax with a parameter tree in 1:1 bijection with the
transformers PyTorch state_dict (``text_model.*`` keys), loaded through
:mod:`gsgen_tpu.guidance.convert`.  Output parity with the torch
implementation is tested against a randomly-initialized
``transformers.CLIPTextModel`` oracle (tests/test_text_encoders.py).

SD 1.x uses openai/clip-vit-large-patch14 (768 wide, 12 layers,
quick_gelu); SD 2.x uses the OpenCLIP ViT-H text tower as shipped in
``stabilityai/stable-diffusion-2-1/text_encoder`` (1024 wide, 23
layers, gelu).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..guidance.convert import torch_state_to_flax


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 23
    num_attention_heads: int = 16
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"          # "quick_gelu" for SD 1.x
    layer_norm_eps: float = 1e-5


# stabilityai/stable-diffusion-2-1(-base)/text_encoder/config.json
SD21_TEXT = CLIPTextConfig()
# openai/clip-vit-large-patch14 (SD 1.x)
SD15_TEXT = CLIPTextConfig(hidden_size=768, intermediate_size=3072,
                           num_hidden_layers=12, num_attention_heads=12,
                           hidden_act="quick_gelu")
TINY_TEXT = CLIPTextConfig(vocab_size=128, hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=2,
                           max_position_embeddings=16)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig

    def setup(self):
        d = self.cfg.hidden_size
        self.q_proj = nn.Dense(d)
        self.k_proj = nn.Dense(d)
        self.v_proj = nn.Dense(d)
        self.out_proj = nn.Dense(d)

    def __call__(self, x, causal_mask):
        c = self.cfg
        B, L, D = x.shape
        H = c.num_attention_heads
        hd = D // H
        q = self.q_proj(x).reshape(B, L, H, hd) * (hd ** -0.5)
        k = self.k_proj(x).reshape(B, L, H, hd)
        v = self.v_proj(x).reshape(B, L, H, hd)
        attn = jnp.einsum("blhd,bshd->bhls", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn + causal_mask
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhls,bshd->blhd", attn.astype(v.dtype), v)
        return self.out_proj(out.reshape(B, L, D))


class CLIPMLP(nn.Module):
    cfg: CLIPTextConfig

    def setup(self):
        self.fc1 = nn.Dense(self.cfg.intermediate_size)
        self.fc2 = nn.Dense(self.cfg.hidden_size)

    def __call__(self, x):
        return self.fc2(_act(self.cfg.hidden_act)(self.fc1(x)))


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig

    def setup(self):
        eps = self.cfg.layer_norm_eps
        self.layer_norm1 = nn.LayerNorm(epsilon=eps)
        self.self_attn = CLIPAttention(self.cfg)
        self.layer_norm2 = nn.LayerNorm(epsilon=eps)
        self.mlp = CLIPMLP(self.cfg)

    def __call__(self, x, causal_mask):
        x = x + self.self_attn(self.layer_norm1(x), causal_mask)
        x = x + self.mlp(self.layer_norm2(x))
        return x


class CLIPTextEmbeddings(nn.Module):
    cfg: CLIPTextConfig

    def setup(self):
        self.token_embedding = nn.Embed(self.cfg.vocab_size,
                                        self.cfg.hidden_size)
        self.position_embedding = nn.Embed(self.cfg.max_position_embeddings,
                                           self.cfg.hidden_size)

    def __call__(self, ids):
        pos = jnp.arange(ids.shape[1])[None, :]
        return self.token_embedding(ids) + self.position_embedding(pos)


class CLIPTextTransformer(nn.Module):
    cfg: CLIPTextConfig

    def setup(self):
        self.embeddings = CLIPTextEmbeddings(self.cfg)
        self.encoder = CLIPEncoder(self.cfg)
        self.final_layer_norm = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps)

    def __call__(self, ids):
        x = self.embeddings(ids)
        L = ids.shape[1]
        mask = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
        x = self.encoder(x, mask[None, None])
        return self.final_layer_norm(x)


class CLIPEncoder(nn.Module):
    cfg: CLIPTextConfig

    def setup(self):
        self.layers = [CLIPEncoderLayer(self.cfg)
                       for _ in range(self.cfg.num_hidden_layers)]

    def __call__(self, x, mask):
        for layer in self.layers:
            x = layer(x, mask)
        return x


class CLIPTextModel(nn.Module):
    """last_hidden_state only — all that SD prompt encoding needs."""

    cfg: CLIPTextConfig

    def setup(self):
        self.text_model = CLIPTextTransformer(self.cfg)

    def __call__(self, ids):
        return self.text_model(ids)


class CLIPTextModelWithProjection(nn.Module):
    """Projected pooled embedding (transformers
    CLIPTextModelWithProjection) — the text-vec that conditions
    point-e's base40M-textvec model (reference
    point_e/models/pretrained_clip.py:113-121 embed_text)."""

    cfg: CLIPTextConfig
    projection_dim: int = 768

    def setup(self):
        self.text_model = CLIPTextTransformer(self.cfg)
        self.text_projection = nn.Dense(self.projection_dim, use_bias=False)

    def __call__(self, ids):
        h = self.text_model(ids)
        # pooled = hidden state at the EOT token (highest token id)
        pooled = h[jnp.arange(ids.shape[0]), jnp.argmax(ids, axis=-1)]
        return self.text_projection(pooled)


def load_clip_textvec(state_dict, cfg: CLIPTextConfig,
                      projection_dim: int = 768,
                      key: Optional[jax.Array] = None):
    """(module, params) for CLIPTextModelWithProjection from its
    transformers state_dict."""
    import numpy as np
    module = CLIPTextModelWithProjection(cfg, projection_dim)
    template = jax.eval_shape(
        lambda: module.init(key or jax.random.PRNGKey(0),
                            jnp.zeros((1, 4), jnp.int32)))
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    state = {k: np.asarray(v) for k, v in state_dict.items()
             if "position_ids" not in k}
    params = torch_state_to_flax(state, template)
    return module, params


def load_clip_text(state_dict, cfg: CLIPTextConfig,
                   key: Optional[jax.Array] = None):
    """Build (module, params) from a transformers CLIPTextModel
    state_dict (torch tensors or numpy)."""
    import numpy as np
    module = CLIPTextModel(cfg)
    template = jax.eval_shape(
        lambda: module.init(key or jax.random.PRNGKey(0),
                            jnp.zeros((1, 4), jnp.int32)))
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    state = {k: np.asarray(v) for k, v in state_dict.items()
             if "position_ids" not in k}
    params = torch_state_to_flax(state, template)
    return module, params
