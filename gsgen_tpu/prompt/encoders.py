"""Real text-encoder factories for the prompt processor.

The reference builds its embeddings with CLIPTextModel /
T5EncoderModel pipelines (reference prompt/stable_diffusion_prompt.py,
prompt/deep_floyd_prompt.py).  Zero-egress equivalents: point at a
locally-provisioned model directory in HF layout

    <dir>/tokenizer/...               (vocab.json+merges.txt / spiece.model)
    <dir>/text_encoder/*.safetensors  (+ config.json)

and get back an ``encode_fn(list[str]) -> np.ndarray [N, L, D]`` that
plugs into :class:`gsgen_tpu.prompt.processors.PromptProcessor`.
Fails on missing *files* only — architecture and loading are complete
(tests/test_text_encoders.py proves parity against torch oracles).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..guidance.convert import load_safetensors, strip_prefix


def _read_config(model_dir: str) -> dict:
    p = os.path.join(model_dir, "config.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _tokenizer(root: str, max_length: int):
    try:
        from transformers import AutoTokenizer
    except ImportError as e:          # pragma: no cover
        raise RuntimeError("transformers is required for real text "
                           "encoders (baked into this image)") from e
    tok_dir = os.path.join(root, "tokenizer")
    if not os.path.isdir(tok_dir):
        tok_dir = root
    tok = AutoTokenizer.from_pretrained(tok_dir, local_files_only=True)

    def tokenize(texts):
        out = tok(list(texts), padding="max_length", max_length=max_length,
                  truncation=True, return_tensors="np")
        return out["input_ids"].astype(np.int32), \
            out["attention_mask"].astype(bool)
    return tokenize


def build_clip_encode_fn(root: str, max_length: int = 77) -> Callable:
    """CLIP text pipeline from a local SD model dir (reference
    prompt/stable_diffusion_prompt.py:20-46)."""
    from .clip import CLIPTextConfig, load_clip_text
    enc_dir = os.path.join(root, "text_encoder")
    if not os.path.isdir(enc_dir):
        enc_dir = root
    hf = _read_config(enc_dir)
    cfg = CLIPTextConfig(
        vocab_size=hf.get("vocab_size", 49408),
        hidden_size=hf.get("hidden_size", 1024),
        intermediate_size=hf.get("intermediate_size", 4096),
        num_hidden_layers=hf.get("num_hidden_layers", 23),
        num_attention_heads=hf.get("num_attention_heads", 16),
        max_position_embeddings=hf.get("max_position_embeddings", 77),
        hidden_act=hf.get("hidden_act", "gelu"))
    state = load_safetensors(enc_dir)
    module, params = load_clip_text(state, cfg)
    tokenize = _tokenizer(root, min(max_length,
                                    cfg.max_position_embeddings))
    apply = jax.jit(lambda p, ids: module.apply(p, ids))

    def encode(texts):
        ids, _ = tokenize(texts)
        return np.asarray(apply(params, jnp.asarray(ids)))
    return encode


def build_t5_encode_fn(root: str, max_length: int = 77) -> Callable:
    """T5 pipeline for DeepFloyd (reference
    prompt/deep_floyd_prompt.py:18-94; IF uses max_length 77)."""
    from .t5 import T5Config, load_t5_encoder
    enc_dir = os.path.join(root, "text_encoder")
    if not os.path.isdir(enc_dir):
        enc_dir = root
    hf = _read_config(enc_dir)
    cfg = T5Config(
        vocab_size=hf.get("vocab_size", 32128),
        d_model=hf.get("d_model", 4096),
        d_kv=hf.get("d_kv", 64),
        d_ff=hf.get("d_ff", 10240),
        num_layers=hf.get("num_layers", 24),
        num_heads=hf.get("num_heads", 64))
    state = load_safetensors(enc_dir)
    module, params = load_t5_encoder(state, cfg)
    tokenize = _tokenizer(root, max_length)
    apply = jax.jit(lambda p, ids, m: module.apply(p, ids,
                                                   attention_mask=m))

    def encode(texts):
        ids, mask = tokenize(texts)
        out = np.asarray(apply(params, jnp.asarray(ids),
                               jnp.asarray(mask)))
        # zero out padded positions like the reference's IF encoder
        return out * mask[..., None]
    return encode


def build_clip_textvec_fn(root: str, max_length: int = 77) -> Callable:
    """Projected pooled CLIP embedding (point-e's text conditioning,
    reference point_e/models/pretrained_clip.py:113-121): texts ->
    [N, projection_dim]."""
    from .clip import CLIPTextConfig, load_clip_textvec
    enc_dir = os.path.join(root, "text_encoder")
    if not os.path.isdir(enc_dir):
        enc_dir = root
    hf = _read_config(enc_dir)
    cfg = CLIPTextConfig(
        vocab_size=hf.get("vocab_size", 49408),
        hidden_size=hf.get("hidden_size", 768),
        intermediate_size=hf.get("intermediate_size", 3072),
        num_hidden_layers=hf.get("num_hidden_layers", 12),
        num_attention_heads=hf.get("num_attention_heads", 12),
        max_position_embeddings=hf.get("max_position_embeddings", 77),
        hidden_act=hf.get("hidden_act", "quick_gelu"))
    state = load_safetensors(enc_dir)
    module, params = load_clip_textvec(
        state, cfg, projection_dim=hf.get("projection_dim", 768))
    tokenize = _tokenizer(root, min(max_length,
                                    cfg.max_position_embeddings))
    apply = jax.jit(lambda p, ids: module.apply(p, ids))

    def encode(texts):
        ids, _ = tokenize(texts)
        return np.asarray(apply(params, jnp.asarray(ids)))
    return encode


def build_encode_fn(model_id: str,
                    kind: Optional[str] = None) -> Optional[Callable]:
    """Resolve a prompt model_id to an encode_fn.

    ``"mock"``/empty -> None (mock embeddings); a directory -> CLIP or
    T5 pipeline (auto-detected from the text_encoder config)."""
    if not model_id or model_id == "mock":
        return None
    if not os.path.isdir(model_id):
        raise FileNotFoundError(
            f"prompt.model_id {model_id!r} is not a local model "
            "directory; this environment has no network egress")
    if kind is None:
        enc_dir = os.path.join(model_id, "text_encoder")
        hf = _read_config(enc_dir if os.path.isdir(enc_dir) else model_id)
        arch = (hf.get("architectures") or [""])[0].lower()
        kind = "t5" if "t5" in arch else "clip"
    return (build_t5_encode_fn if kind == "t5"
            else build_clip_encode_fn)(model_id)
