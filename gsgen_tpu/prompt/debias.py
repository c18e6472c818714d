"""Prompt debiasing via BERT fill-mask PMI.

Faithful port of reference prompt/prompt_processors.py:387-447
("Debiasing Scores and Prompts of 2D Diffusion for Robust Text-to-3D
Generation", arXiv:2303.15413): for each candidate word, compare the
view-direction distribution P(view | prompt) predicted at a [MASK]
slot with and without the word; words whose removal leaves the
distribution nearly unchanged (PMI < 0.95) for a view are dropped from
that view's prompt.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

VIEWS = ("side", "front", "back", "overhead")


def _build_pipeline(model_dir: str):
    from transformers import AutoTokenizer
    from ..guidance.convert import load_safetensors
    from .bert import BertConfig, load_bert_mlm
    tok = AutoTokenizer.from_pretrained(model_dir, local_files_only=True)
    import json
    cfg_path = os.path.join(model_dir, "config.json")
    hf = json.load(open(cfg_path)) if os.path.exists(cfg_path) else {}
    cfg = BertConfig(
        vocab_size=hf.get("vocab_size", 30522),
        hidden_size=hf.get("hidden_size", 768),
        num_hidden_layers=hf.get("num_hidden_layers", 12),
        num_attention_heads=hf.get("num_attention_heads", 12),
        intermediate_size=hf.get("intermediate_size", 3072),
        max_position_embeddings=hf.get("max_position_embeddings", 512))
    module, params = load_bert_mlm(load_safetensors(model_dir), cfg)
    apply = jax.jit(lambda ids, m: module.apply(params, ids, m))
    return tok, apply


def get_debiased_prompt(prompt: str, model_dir: str,
                        mask_ids: Optional[List[int]] = None,
                        max_length: int = 16,
                        fill_mask=None) -> List[str]:
    """Per-view debiased prompts [side, front, back, overhead]
    (reference prompt_processors.py:387-447).

    ``fill_mask(texts) -> probs [N, 4]`` can inject a custom fill-mask
    probe (tests); by default a flax BERT is loaded from ``model_dir``.
    """
    if fill_mask is None:
        tok, apply = _build_pipeline(model_dir)
        view_ids = tok(" ".join(VIEWS),
                       return_tensors="np").input_ids[0][1:5]

        def fill_mask(texts):
            batch = tok([f"This image is depicting a [MASK] view of {t}"
                         for t in texts],
                        padding="max_length", truncation=True,
                        max_length=max_length, return_tensors="np")
            ids = batch["input_ids"].astype(np.int32)
            mask = batch["attention_mask"].astype(bool)
            logits = np.asarray(apply(jnp.asarray(ids), jnp.asarray(mask)))
            out = []
            for i in range(ids.shape[0]):
                pos = int(np.argmax(ids[i] == tok.mask_token_id))
                p = jax.nn.softmax(jnp.asarray(logits[i, pos]))
                p = np.asarray(p)[view_ids]
                out.append(p / p.sum())
            return np.stack(out)

    words = prompt.split(" ")
    n_words = len(words)
    mask_ids = list(range(n_words)) if mask_ids is None else list(mask_ids)
    prompts = [words.copy() for _ in range(4)]

    # one batched probe: full prompt + each word-dropped variant
    variants = [prompt] + [" ".join(words[:i] + words[i + 1:])
                           for i in mask_ids]
    probes = fill_mask(variants)
    full_probe = probes[0]
    for j, idx in enumerate(mask_ids):
        part_probe = probes[j + 1]
        # pmi = full / lerp(part, full, 0.5)  (:433)
        pmi = full_probe / (part_probe + 0.5 * (full_probe - part_probe))
        for v in range(4):
            if pmi[v] < 0.95:
                prompts[v][idx] = ""
    return [" ".join(w for w in p if w) for p in prompts]
