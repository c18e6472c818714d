"""T5 encoder in flax, transformers-exact (DeepFloyd's text tower).

The reference encodes DeepFloyd prompts with an 8-bit
``T5EncoderModel`` (reference prompt/deep_floyd_prompt.py:18-94,
google/t5-v1_1-xxl).  This reimplements the encoder stack in flax with
parameters in 1:1 bijection with the transformers state_dict
(``shared.weight`` + ``encoder.*``), loaded through
:mod:`gsgen_tpu.guidance.convert`.  Output parity is tested against a
randomly-initialized ``transformers.T5EncoderModel`` oracle
(tests/test_text_encoders.py).

T5 v1.1 semantics implemented exactly: RMS layer norm (eps 1e-6, no
bias, no mean-centering), un-scaled attention logits, bucketed relative
position bias computed in block 0 and shared down the stack, and
gated-GELU feed-forward (wi_0 / wi_1, "gelu_new" tanh approximation).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..guidance.convert import torch_state_to_flax


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6


# google/t5-v1_1-xxl (DeepFloyd IF text encoder)
T5_XXL = T5Config()
TINY_T5 = T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                   num_layers=2, num_heads=4)


def gelu_new(x):
    return jax.nn.gelu(x, approximate=True)


class T5LayerNorm(nn.Module):
    """RMS norm: no mean subtraction, no bias (T5 style)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        return (scale * x).astype(scale.dtype)


def relative_position_bucket(relative_position, num_buckets=32,
                             max_distance=128):
    """transformers T5Attention._relative_position_bucket,
    bidirectional=True."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-20)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return ret + jnp.where(is_small, n, large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_relative_attention_bias: bool = False

    def setup(self):
        c = self.cfg
        inner = c.num_heads * c.d_kv
        self.q = nn.Dense(inner, use_bias=False)
        self.k = nn.Dense(inner, use_bias=False)
        self.v = nn.Dense(inner, use_bias=False)
        self.o = nn.Dense(c.d_model, use_bias=False)
        if self.has_relative_attention_bias:
            self.relative_attention_bias = nn.Embed(
                c.relative_attention_num_buckets, c.num_heads)

    def compute_bias(self, L):
        c = self.cfg
        ctx = jnp.arange(L)[:, None]
        mem = jnp.arange(L)[None, :]
        buckets = relative_position_bucket(
            mem - ctx, c.relative_attention_num_buckets,
            c.relative_attention_max_distance)
        bias = self.relative_attention_bias(buckets)      # [L, L, H]
        return jnp.transpose(bias, (2, 0, 1))[None]       # [1, H, L, L]

    def __call__(self, x, position_bias, mask=None):
        c = self.cfg
        B, L, _ = x.shape
        H, hd = c.num_heads, c.d_kv
        q = self.q(x).reshape(B, L, H, hd)
        k = self.k(x).reshape(B, L, H, hd)
        v = self.v(x).reshape(B, L, H, hd)
        # NOTE: no 1/sqrt(d) — T5 folds the scale into the weights
        attn = jnp.einsum("blhd,bshd->bhls", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn + position_bias
        if mask is not None:
            attn = attn + jnp.where(mask[:, None, None, :], 0.0,
                                    -1e9)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhls,bshd->blhd", attn.astype(v.dtype), v)
        return self.o(out.reshape(B, L, H * hd))


class T5SelfAttentionLayer(nn.Module):
    cfg: T5Config
    has_relative_attention_bias: bool = False

    def setup(self):
        self.SelfAttention = T5Attention(self.cfg,
                                         self.has_relative_attention_bias)
        self.layer_norm = T5LayerNorm(self.cfg.layer_norm_epsilon)

    def __call__(self, x, position_bias, mask=None):
        return x + self.SelfAttention(self.layer_norm(x), position_bias,
                                      mask)


class T5DenseGatedActDense(nn.Module):
    cfg: T5Config

    def setup(self):
        self.wi_0 = nn.Dense(self.cfg.d_ff, use_bias=False)
        self.wi_1 = nn.Dense(self.cfg.d_ff, use_bias=False)
        self.wo = nn.Dense(self.cfg.d_model, use_bias=False)

    def __call__(self, x):
        return self.wo(gelu_new(self.wi_0(x)) * self.wi_1(x))


class T5FFLayer(nn.Module):
    cfg: T5Config

    def setup(self):
        self.DenseReluDense = T5DenseGatedActDense(self.cfg)
        self.layer_norm = T5LayerNorm(self.cfg.layer_norm_epsilon)

    def __call__(self, x):
        return x + self.DenseReluDense(self.layer_norm(x))


class T5Block(nn.Module):
    cfg: T5Config
    has_relative_attention_bias: bool = False

    def setup(self):
        self.layer = [
            T5SelfAttentionLayer(self.cfg, self.has_relative_attention_bias),
            T5FFLayer(self.cfg)]

    def __call__(self, x, position_bias, mask=None):
        x = self.layer[0](x, position_bias, mask)
        return self.layer[1](x)


class T5Stack(nn.Module):
    cfg: T5Config

    def setup(self):
        self.block = [T5Block(self.cfg, has_relative_attention_bias=(i == 0))
                      for i in range(self.cfg.num_layers)]
        self.final_layer_norm = T5LayerNorm(self.cfg.layer_norm_epsilon)

    def __call__(self, x, mask=None):
        bias = self.block[0].layer[0].SelfAttention.compute_bias(x.shape[1])
        for blk in self.block:
            x = blk(x, bias, mask)
        return self.final_layer_norm(x)


class T5EncoderModel(nn.Module):
    """token ids [B, L] (+ attention mask) -> last_hidden_state."""

    cfg: T5Config

    def setup(self):
        self.shared = nn.Embed(self.cfg.vocab_size, self.cfg.d_model)
        self.encoder = T5Stack(self.cfg)

    def __call__(self, ids, attention_mask=None):
        x = self.shared(ids)
        return self.encoder(x, attention_mask)


def load_t5_encoder(state_dict, cfg: T5Config,
                    key: Optional[jax.Array] = None):
    """(module, params) from a transformers T5EncoderModel state_dict.

    Drops the tied ``encoder.embed_tokens.weight`` alias of
    ``shared.weight``."""
    import numpy as np
    module = T5EncoderModel(cfg)
    template = jax.eval_shape(
        lambda: module.init(key or jax.random.PRNGKey(0),
                            jnp.zeros((1, 4), jnp.int32)))
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    state = {k: np.asarray(v) for k, v in state_dict.items()
             if k != "encoder.embed_tokens.weight"}
    params = torch_state_to_flax(state, template)
    return module, params
