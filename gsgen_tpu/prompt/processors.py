"""Prompt processing: view-dependent embeddings, perp-neg, caching.

Port of prompt/prompt_processors.py:38-270 in gsgen3d/gsgen, with the
per-sample Python loops replaced by vectorized, jit-safe selection so
embedding choice happens INSIDE the jitted train step.

A text encoder is pluggable (``encode_fn(list[str]) -> [N, L, D]``):
real CLIP/T5 via transformers when local weights exist, or the
deterministic mock encoder for tests/benches (zero-egress environments
cannot download HF checkpoints).  Embeddings are cached on disk keyed
by md5(model+prompt), like the reference (:307-373).
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
from pathlib import Path
from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# perp-neg interpolation constants (prompt_processors.py:48-56, from
# threestudio / the Perp-Neg paper)
PERP_NEG_F_SB = (1.0, 0.5, -0.606)
PERP_NEG_F_FSB = (1.0, 0.5, 0.967)
PERP_NEG_F_FS = (4.0, 0.5, -2.426)
PERP_NEG_F_SF = (4.0, 0.5, -2.426)


def shift_azimuth_deg(azimuth):
    """to (-180, 180] (prompt_processors.py:178-180)."""
    return (azimuth + 180.0) % 360.0 - 180.0


def shifted_expotional_decay(a, b, c, r):
    """utils/ops.py:17-18 (reference spelling preserved)."""
    return a * jnp.exp(-b * r) + c


def direction_templates(prompt: str, front_style: bool = False,
                        overrides: Optional[dict] = None) -> List[str]:
    """The 4 view-conditioned prompts in reference order
    side/front/back/overhead (prompt_processors.py:204-270)."""
    overrides = overrides or {}
    if front_style:
        texts = [f"side view of {prompt}", f"front view of {prompt}",
                 f"backside view of {prompt}", f"overhead view of {prompt}"]
    else:
        texts = [f"{prompt}, side view", f"{prompt}, front view",
                 f"{prompt}, back view", f"{prompt}, overhead view"]
    for i, name in enumerate(["side", "front", "back", "overhead"]):
        if overrides.get(name):
            texts[i] = overrides[name]
    return texts


def direction_idx(elevation, azimuth, front_threshold=45.0,
                  back_threshold=45.0, overhead_threshold=60.0):
    """Vectorized view-direction classification, reference assignment
    order (side default -> front -> back -> overhead wins last)."""
    azi = shift_azimuth_deg(azimuth)
    idx = jnp.zeros_like(elevation, dtype=jnp.int32)
    idx = jnp.where((azi > -front_threshold) & (azi < front_threshold), 1, idx)
    idx = jnp.where((azi > 180.0 - back_threshold)
                    | (azi < -180.0 + back_threshold), 2, idx)
    idx = jnp.where(elevation > overhead_threshold, 3, idx)
    return idx


class PromptEmbedding(NamedTuple):
    """Precomputed embedding bank (a jit-safe pytree).

    text: [L, D]; uncond: [L, D]; text_vd / uncond_vd: [4, L, D] ordered
    side/front/back/overhead (prompt_processors.py:38-47).
    """

    text: jax.Array
    uncond: jax.Array
    text_vd: jax.Array
    uncond_vd: jax.Array

    def get_text_embedding(self, elevation, azimuth, camera_distances,
                           use_view_dependent: bool = True):
        """[2B, L, D]: cond then uncond (prompt_processors.py:58-90)."""
        bs = elevation.shape[0]
        if use_view_dependent:
            idx = direction_idx(elevation, azimuth)
            cond = self.text_vd[idx]
            uncond = self.uncond_vd[idx]
        else:
            cond = jnp.broadcast_to(self.text, (bs,) + self.text.shape)
            uncond = jnp.broadcast_to(self.uncond, (bs,) + self.uncond.shape)
        return jnp.concatenate([cond, uncond], axis=0)

    def get_text_embeddings_perp_neg(self, elevation, azimuth,
                                     camera_distances):
        """[4B, L, D] (pos, uncond, neg0, neg1) + weights [B, 2]
        (prompt_processors.py:92-176), fully vectorized."""
        idx = direction_idx(elevation, azimuth)
        azi = shift_azimuth_deg(azimuth)
        side, front, back, overhead = (self.text_vd[0], self.text_vd[1],
                                       self.text_vd[2], self.text_vd[3])
        uncond = self.uncond_vd[idx]

        abs_azi = jnp.abs(azi)
        is_fs = abs_azi < 90.0                    # front-side interpolation
        r_fs = 1.0 - abs_azi / 90.0
        r_sb = 2.0 - abs_azi / 90.0

        def bc(emb):  # [L, D] -> [B, L, D]
            return jnp.broadcast_to(emb, (idx.shape[0],) + emb.shape)

        sel = lambda c, a, b: jnp.where(c[:, None, None], a, b)
        pos_interp = sel(is_fs,
                         r_fs[:, None, None] * bc(front)
                         + (1 - r_fs)[:, None, None] * bc(side),
                         r_sb[:, None, None] * bc(side)
                         + (1 - r_sb)[:, None, None] * bc(back))
        pos = jnp.where((idx == 3)[:, None, None], bc(overhead), pos_interp)

        neg0 = sel(is_fs, bc(front), bc(side))
        neg1 = sel(is_fs, bc(side), bc(front))
        neg0 = jnp.where((idx == 3)[:, None, None], uncond, neg0)
        neg1 = jnp.where((idx == 3)[:, None, None], uncond, neg1)

        w0 = jnp.where(is_fs,
                       -shifted_expotional_decay(*PERP_NEG_F_FS, r_fs),
                       -shifted_expotional_decay(*PERP_NEG_F_SB, r_sb))
        w1 = jnp.where(is_fs,
                       -shifted_expotional_decay(*PERP_NEG_F_SF, 1 - r_fs),
                       -shifted_expotional_decay(*PERP_NEG_F_FSB, r_sb))
        w = jnp.stack([w0, w1], axis=-1)
        w = jnp.where((idx == 3)[:, None], 0.0, w)

        emb = jnp.concatenate(
            [pos, uncond,
             jnp.stack([neg0, neg1], axis=1).reshape(
                 -1, *neg0.shape[1:])], axis=0)
        return emb, w


@dataclasses.dataclass
class PromptProcessorConfig:
    prompt: str = "a corgi"
    negative_prompt: str = ""
    front_style: bool = False        # view_dependent_prompt_front
    use_view_dependent_prompt: bool = True
    use_perp_negative: bool = False
    front_threshold: float = 45.0
    back_threshold: float = 45.0
    overhead_threshold: float = 60.0
    use_cache: bool = True
    cache_dir: str = ".cache/text_prompt_embeddings"
    model_id: str = "mock"
    prompt_side: Optional[str] = None
    prompt_back: Optional[str] = None
    prompt_overhead: Optional[str] = None
    # BERT fill-mask prompt debiasing (prompt_processors.py:274-281,387-447)
    use_prompt_debiasing: bool = False
    debiasing_model_id: str = ""
    prompt_debiasing_mask_ids: Optional[List[int]] = None


def mock_encode(texts: Sequence[str], L: int = 77, D: int = 1024) -> np.ndarray:
    """Deterministic pseudo-embeddings (distinct prompts -> distinct,
    stable vectors) for tests/benches without text-encoder weights."""
    out = []
    for t in texts:
        seed = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        out.append(np.random.default_rng(seed).standard_normal((L, D)))
    return np.stack(out).astype(np.float32)


class PromptProcessor:
    """Builds a PromptEmbedding bank from a text-encoder callable
    (BasePromptProcessor semantics, prompt_processors.py:183-373)."""

    def __init__(self, cfg: PromptProcessorConfig,
                 encode_fn: Optional[Callable] = None,
                 fill_mask: Optional[Callable] = None):
        self.cfg = cfg
        self.encode_fn = encode_fn or mock_encode
        if cfg.use_prompt_debiasing:
            # reference :274-281: per-view debiased base prompts, manual
            # per-view overrides are mutually exclusive
            assert not (cfg.prompt_side or cfg.prompt_back
                        or cfg.prompt_overhead), \
                "Do not assign prompt_side/back/overhead with debiasing"
            from .debias import get_debiased_prompt
            base = get_debiased_prompt(
                cfg.prompt, cfg.debiasing_model_id,
                mask_ids=cfg.prompt_debiasing_mask_ids,
                fill_mask=fill_mask)
            vd_prompts = [
                direction_templates(p, cfg.front_style)[i]
                for i, p in enumerate(base)]
        else:
            overrides = {"side": cfg.prompt_side, "back": cfg.prompt_back,
                         "overhead": cfg.prompt_overhead}
            vd_prompts = direction_templates(cfg.prompt, cfg.front_style,
                                             overrides)
        texts = [cfg.prompt, cfg.negative_prompt] + vd_prompts \
            + [cfg.negative_prompt] * 4
        embs = self._encode_cached(texts)
        self.embedding = PromptEmbedding(
            text=jnp.asarray(embs[0]), uncond=jnp.asarray(embs[1]),
            text_vd=jnp.asarray(embs[2:6]), uncond_vd=jnp.asarray(embs[6:10]))

    def _encode_cached(self, texts: List[str]) -> np.ndarray:
        if not self.cfg.use_cache:
            return self.encode_fn(texts)
        cache = Path(self.cfg.cache_dir)
        cache.mkdir(parents=True, exist_ok=True)
        out, missing, order = [None] * len(texts), [], []
        for i, t in enumerate(texts):
            key = hashlib.md5(f"{self.cfg.model_id}:{t}".encode()).hexdigest()
            f = cache / f"{key}.npy"
            if f.exists():
                out[i] = np.load(f)
            else:
                missing.append(t)
                order.append((i, f))
        if missing:
            fresh = self.encode_fn(missing)
            for (i, f), e in zip(order, fresh):
                np.save(f, e)
                out[i] = e
        return np.stack(out)

    def __call__(self) -> PromptEmbedding:
        return self.embedding
