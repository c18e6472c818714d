"""BERT masked-LM in flax, transformers-exact (prompt debiasing).

The reference debiases view-dependent prompts with a BERT fill-mask
model (reference prompt/prompt_processors.py:387-447 — PMI between the
full prompt and word-dropped prompts over the view tokens).  This is
that model rebuilt in flax with a parameter tree in 1:1 bijection with
the transformers ``BertForMaskedLM`` state_dict, loaded through the
mechanical rename in :mod:`gsgen_tpu.guidance.convert` (the ``.self.``
attention scope is keyword-mangled to ``self_``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..guidance.convert import torch_state_to_flax


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12


BERT_BASE = BertConfig()
TINY_BERT = BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=64,
                       max_position_embeddings=32)


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    def setup(self):
        d = self.cfg.hidden_size
        self.query = nn.Dense(d)
        self.key = nn.Dense(d)
        self.value = nn.Dense(d)

    def __call__(self, x, mask_bias):
        c = self.cfg
        B, L, D = x.shape
        H = c.num_attention_heads
        hd = D // H
        q = self.query(x).reshape(B, L, H, hd)
        k = self.key(x).reshape(B, L, H, hd)
        v = self.value(x).reshape(B, L, H, hd)
        attn = jnp.einsum("blhd,bshd->bhls", q, k,
                          preferred_element_type=jnp.float32) / (hd ** 0.5)
        attn = jax.nn.softmax(attn + mask_bias, axis=-1)
        out = jnp.einsum("bhls,bshd->blhd", attn.astype(v.dtype), v)
        return out.reshape(B, L, D)


class BertAttention(nn.Module):
    cfg: BertConfig

    def setup(self):
        self.self_ = BertSelfAttention(self.cfg)
        self.output = BertSelfOutput(self.cfg)

    def __call__(self, x, mask_bias):
        return self.output(self.self_(x, mask_bias), x)


class BertSelfOutput(nn.Module):
    cfg: BertConfig

    def setup(self):
        self.dense = nn.Dense(self.cfg.hidden_size)
        self.LayerNorm = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps)

    def __call__(self, h, residual):
        return self.LayerNorm(self.dense(h) + residual)


class BertIntermediate(nn.Module):
    cfg: BertConfig

    def setup(self):
        self.dense = nn.Dense(self.cfg.intermediate_size)

    def __call__(self, x):
        return jax.nn.gelu(self.dense(x), approximate=False)


class BertLayer(nn.Module):
    cfg: BertConfig

    def setup(self):
        c = self.cfg
        self.attention = BertAttention(c)
        self.intermediate = BertIntermediate(c)
        self.output = BertSelfOutput(c)      # dense + post-LN residual

    def __call__(self, x, mask_bias):
        x = self.attention(x, mask_bias)
        return self.output(self.intermediate(x), x)


class BertModel(nn.Module):
    cfg: BertConfig

    def setup(self):
        self.embeddings = BertEmbeddings(self.cfg)
        self.encoder = BertEncoder(self.cfg)

    def __call__(self, ids, attention_mask):
        x = self.embeddings(ids)
        bias = jnp.where(attention_mask[:, None, None, :], 0.0, -1e9)
        return self.encoder(x, bias)


class BertEmbeddings(nn.Module):
    cfg: BertConfig

    def setup(self):
        c = self.cfg
        self.word_embeddings = nn.Embed(c.vocab_size, c.hidden_size)
        self.position_embeddings = nn.Embed(c.max_position_embeddings,
                                            c.hidden_size)
        self.token_type_embeddings = nn.Embed(c.type_vocab_size,
                                              c.hidden_size)
        self.LayerNorm = nn.LayerNorm(epsilon=c.layer_norm_eps)

    def __call__(self, ids):
        pos = jnp.arange(ids.shape[1])[None, :]
        x = (self.word_embeddings(ids) + self.position_embeddings(pos)
             + self.token_type_embeddings(jnp.zeros_like(ids)))
        return self.LayerNorm(x)


class BertEncoder(nn.Module):
    cfg: BertConfig

    def setup(self):
        self.layer = [BertLayer(self.cfg)
                      for _ in range(self.cfg.num_hidden_layers)]

    def __call__(self, x, bias):
        for lyr in self.layer:
            x = lyr(x, bias)
        return x


class BertMLMHead(nn.Module):
    """cls.predictions: transform (dense+gelu+LN) -> decoder."""

    cfg: BertConfig

    def setup(self):
        self.transform_dense = nn.Dense(self.cfg.hidden_size)
        self.transform_LayerNorm = nn.LayerNorm(
            epsilon=self.cfg.layer_norm_eps)
        self.decoder = nn.Dense(self.cfg.vocab_size)

    def __call__(self, x):
        h = jax.nn.gelu(self.transform_dense(x), approximate=False)
        return self.decoder(self.transform_LayerNorm(h))


class BertForMaskedLM(nn.Module):
    cfg: BertConfig

    def setup(self):
        self.bert = BertModel(self.cfg)
        self.cls_predictions = BertMLMHead(self.cfg)

    def __call__(self, ids, attention_mask):
        return self.cls_predictions(self.bert(ids, attention_mask))


def _fix_keys(state):
    """HF BertForMaskedLM keys -> this module's flax paths."""
    out = {}
    for k, v in state.items():
        if "position_ids" in k or k == "cls.predictions.bias":
            continue   # decoder.bias carries the same values
        if ".pooler." in k:
            continue   # unused by MLM
        k = k.replace(".attention.self.", ".attention.self_.")
        k = k.replace("cls.predictions.transform.dense",
                      "cls_predictions.transform_dense")
        k = k.replace("cls.predictions.transform.LayerNorm",
                      "cls_predictions.transform_LayerNorm")
        k = k.replace("cls.predictions.decoder",
                      "cls_predictions.decoder")
        out[k] = v
    return out


def load_bert_mlm(state_dict, cfg: BertConfig = BERT_BASE,
                  key: Optional[jax.Array] = None):
    """(module, params) from a transformers BertForMaskedLM state_dict.
    Handles tied decoder weights (older checkpoints omit
    ``cls.predictions.decoder.weight`` — fall back to the word
    embedding matrix)."""
    import numpy as np
    state = _fix_keys({k: np.asarray(v) for k, v in state_dict.items()})
    if "cls_predictions.decoder.weight" not in state:
        state["cls_predictions.decoder.weight"] = \
            state["bert.embeddings.word_embeddings.weight"]
    if "cls_predictions.decoder.bias" not in state:
        state["cls_predictions.decoder.bias"] = np.zeros(
            (cfg.vocab_size,), np.float32)
    module = BertForMaskedLM(cfg)
    template = jax.eval_shape(
        lambda: module.init(key or jax.random.PRNGKey(0),
                            jnp.zeros((1, 4), jnp.int32),
                            jnp.ones((1, 4), bool)))
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    params = torch_state_to_flax(state, template)
    return module, params
