"""Checkpoint save / load / resume.

The reference persists ``{params, cfg, step}`` via torch.save
(trainer.py:255-266 in gsgen3d/gsgen) and rebuilds the Trainer from the
embedded cfg (trainer.py:232-253).  Here a checkpoint is a directory:

  step_N/
    arrays.npz      — every array leaf of the train state (scene params,
                      active mask, stats, bg params, Adam moments)
    meta.json       — step, config dataclasses (as dicts), tree structure

npz keeps checkpoints dependency-free and inspectable; orbax is
deliberately avoided for the small (<100 MB) states this model has.
Raw (pre-activation) tensors are stored, exactly like the reference
(gs/gaussian_splatting.py:294-339 get_params_for_save raw=True).
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree) -> Dict[str, np.ndarray]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(ckpt_dir, step: int, state, config_blob: Optional[Dict] = None):
    """Write ``<ckpt_dir>/step_<N>/{arrays.npz, meta.json}``."""
    d = Path(ckpt_dir) / f"step_{step}"
    d.mkdir(parents=True, exist_ok=True)
    arrays = _flatten_with_paths(state)
    np.savez(d / "arrays.npz", **arrays)
    treedef = jax.tree_util.tree_structure(state)
    meta = {"step": step, "treedef": str(treedef),
            "config": config_blob or {}}
    (d / "meta.json").write_text(json.dumps(meta, indent=2, default=str))
    return str(d)


def load_checkpoint(path, state_template) -> Tuple[Any, int]:
    """Load arrays back into the structure of ``state_template``.

    The template (a freshly-built state with the same config) provides
    the pytree structure; shapes must match (same capacity etc.).
    Returns (state, step).
    """
    d = Path(path)
    if (d / "arrays.npz").exists():
        pass
    else:
        # accept a ckpt_dir: pick the latest step (utils/ckpt.py:4-17)
        steps = sorted(d.glob("step_*"),
                       key=lambda p: int(p.name.split("_")[1]))
        assert steps, f"no checkpoints under {d}"
        d = steps[-1]
    data = np.load(d / "arrays.npz")
    meta = json.loads((d / "meta.json").read_text())

    flat, treedef = jax.tree_util.tree_flatten_with_path(state_template)
    leaves = []
    for path_, leaf in flat:
        key = "/".join(str(p) for p in path_)
        arr = data[key]
        assert arr.shape == leaf.shape, \
            f"shape mismatch for {key}: ckpt {arr.shape} vs template {leaf.shape}"
        leaves.append(jnp.asarray(arr, dtype=leaf.dtype))
    state = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(state_template), leaves)
    return state, int(meta["step"])


def scene_arrays_from_checkpoint(path) -> Dict[str, np.ndarray]:
    """Raw scene param arrays (ACTIVE rows only) from a checkpoint.

    The ``init.type=ckpt`` fresh-run path (reference from_ckpt,
    utils/initialize.py:335-356 dispatched at :495): unlike full resume
    (``Trainer.load``, which restores the whole train state including
    optimizer moments into an identically-shaped template), this pulls
    ONLY the Gaussian fields so a NEW run — new capacity, new guidance,
    new schedules — can start from a trained scene.  Returned arrays are
    raw (pre-activation), compacted to the active slots; keys: mean,
    qvec, svec, color, alpha (+ specular/normal when present).
    """
    d = Path(path)
    if not (d / "arrays.npz").exists():
        steps = sorted(d.glob("step_*"),
                       key=lambda p: int(p.name.split("_")[1]))
        assert steps, f"no checkpoints under {d}"
        d = steps[-1]
    data = np.load(d / "arrays.npz")

    def find(field):
        for key in data.files:
            parts = [p.strip(".") for p in key.split("/")]
            if ("scene" in parts and parts[-1] == field
                    and ("params" in parts or field == "active")):
                return data[key]
        return None

    active = find("active")
    out = {}
    for field in ("mean", "qvec", "svec", "color", "alpha",
                  "specular", "normal"):
        arr = find(field)
        if arr is None:
            continue
        out[field] = arr[active] if active is not None else arr
    assert "mean" in out, \
        f"{d} does not look like a trainer checkpoint (no scene params)"
    return out


def latest_checkpoint(ckpt_dir) -> Optional[str]:
    d = Path(ckpt_dir)
    if not d.exists():
        return None
    steps = sorted(d.glob("step_*"), key=lambda p: int(p.name.split("_")[1]))
    return str(steps[-1]) if steps else None
