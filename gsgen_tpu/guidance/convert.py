"""Torch(diffusers/transformers) <-> flax parameter-tree conversion.

The reference loads pretrained backbones through HF pipelines
(reference guidance/stable_diffusion.py:74-120).  Zero-egress TPU pods
get weights as locally-provisioned ``*.safetensors`` in the standard
diffusers/transformers PyTorch layout instead; this module maps them
into the flax modules of :mod:`unet2d`, :mod:`vae`,
:mod:`gsgen_tpu.prompt.clip` and :mod:`gsgen_tpu.prompt.t5`.

The mapping is mechanical because the flax modules mirror the torch
module hierarchy name-for-name:

* flax path component ``name_N`` (list entry)  <->  torch ``name.N`` —
  except ATOMIC names that legitimately contain ``_<digit>``
  (``linear_1``, ``wi_0``, ...);
* leaf transforms: Conv ``weight`` [O,I,kh,kw] <-> ``kernel``
  [kh,kw,I,O]; Linear ``weight`` [O,I] <-> ``kernel`` [I,O]; norm
  ``weight`` <-> ``scale``; Embedding ``weight`` <-> ``embedding``.

Both directions are provided; the export direction exists so tests can
serialize a flax tree into the torch layout and reload it bit-exactly
(mechanical round-trip — the acceptance gate for the loader).
"""

from __future__ import annotations

import os
import re
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# flax attribute names that contain "_<digit>" but are single torch
# names, not list entries
ATOMIC = ("linear_1", "linear_2", "wi_0", "wi_1", "conv_shortcut",
          "ln_1", "ln_2")    # point-e resblock norms

_LIST_RE = re.compile(r"^(.*)_(\d+)$")


def flax_name_to_torch(name: str) -> str:
    """``down_blocks_0`` -> ``down_blocks.0`` (ATOMIC names kept)."""
    if name in ATOMIC:
        return name
    parts = []
    while True:
        m = _LIST_RE.match(name)
        if m is None or name in ATOMIC:
            break
        parts.append(m.group(2))
        name = m.group(1)
    return ".".join([name] + list(reversed(parts)))


def flax_path_to_torch_key(path: Tuple[str, ...]) -> Tuple[str, str]:
    """flax param path -> (torch key, leaf kind).

    leaf kinds: kernel | scale | bias | embedding.
    """
    *mods, leaf = path
    prefix = ".".join(flax_name_to_torch(p) for p in mods)
    if leaf == "kernel":
        return f"{prefix}.weight", "kernel"
    if leaf in ("scale", "weight"):    # norm scale (T5LayerNorm names
        return f"{prefix}.weight", "scale"   # its param "weight")
    if leaf == "embedding":
        return f"{prefix}.weight", "embedding"
    if leaf == "bias":
        return f"{prefix}.bias", "bias"
    # bare parameters that are torch module attributes rather than
    # (weight, bias) pairs — e.g. ViT ``cls_token`` / ``pos_embed``
    return (f"{prefix}.{leaf}" if prefix else leaf), "raw"


def _to_flax_leaf(kind: str, arr: np.ndarray) -> np.ndarray:
    if kind == "kernel":
        if arr.ndim == 4:               # torch conv [O,I,kh,kw]
            return np.transpose(arr, (2, 3, 1, 0))
        if arr.ndim == 2:               # torch linear [O,I]
            return np.transpose(arr, (1, 0))
        raise ValueError(f"kernel with ndim {arr.ndim}")
    return arr                          # scale/bias/embedding: as-is


def _to_torch_leaf(kind: str, arr: np.ndarray) -> np.ndarray:
    if kind == "kernel":
        if arr.ndim == 4:               # flax conv [kh,kw,I,O]
            return np.transpose(arr, (3, 2, 0, 1))
        if arr.ndim == 2:
            return np.transpose(arr, (1, 0))
        raise ValueError(f"kernel with ndim {arr.ndim}")
    return arr


def _flat_paths(tree) -> Dict[Tuple[str, ...], jax.Array]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for keypath, leaf in flat:
        path = tuple(
            k.key if hasattr(k, "key") else str(k.idx) for k in keypath)
        out[path] = leaf
    return out


def flax_to_torch_state(params) -> Dict[str, np.ndarray]:
    """Serialize a flax param tree into torch state_dict layout.

    ``params`` is the tree under the ``"params"`` collection root (the
    root key itself is stripped if present).
    """
    if isinstance(params, dict) and set(params) == {"params"}:
        params = params["params"]
    out = {}
    for path, leaf in _flat_paths(params).items():
        tkey, kind = flax_path_to_torch_key(path)
        out[tkey] = _to_torch_leaf(kind, np.asarray(leaf))
    return out


def torch_state_to_flax(state: Dict[str, np.ndarray], flax_template,
                        skip_substrings: Iterable[str] = ("lora",
                                                          "class_embedding"),
                        strict: bool = True):
    """Fill a flax tree (template with final shapes) from a torch
    state_dict.  Keys whose flax path contains one of
    ``skip_substrings`` keep their template value (LoRA adapters /
    camera class embeddings never exist in pretrained checkpoints).

    Raises with the full diff when keys are missing/mismatched.
    """
    root = None
    tpl = flax_template
    if isinstance(tpl, dict) and set(tpl) == {"params"}:
        root = "params"
        tpl = tpl["params"]
    flat = _flat_paths(tpl)
    used = set()
    new_flat = {}
    missing = []
    for path, leaf in flat.items():
        tkey, kind = flax_path_to_torch_key(path)
        if any(s in p for s in skip_substrings for p in path):
            new_flat[path] = leaf
            continue
        if tkey not in state:
            missing.append(tkey)
            new_flat[path] = leaf
            continue
        arr = _to_flax_leaf(kind, np.asarray(state[tkey]))
        if arr.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {tkey}: checkpoint {arr.shape} vs "
                f"model {leaf.shape} (flax path {'/'.join(path)})")
        new_flat[path] = jnp.asarray(arr, dtype=leaf.dtype)
        used.add(tkey)
    if strict:
        unexpected = sorted(set(state) - used)
        if missing or unexpected:
            raise KeyError(
                f"state_dict mismatch: {len(missing)} missing "
                f"{missing[:8]}..., {len(unexpected)} unexpected "
                f"{unexpected[:8]}...")
    elif missing:
        raise KeyError(f"missing keys in checkpoint: {missing[:8]} "
                       f"(+{max(0, len(missing) - 8)} more)")

    # unflatten back into the nested dict structure
    out = {}
    for path, leaf in new_flat.items():
        d = out
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = leaf
    return {root: out} if root else out


# ---- safetensors IO ----

def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load one file or every ``*.safetensors`` under a directory
    (sharded checkpoints merge)."""
    from safetensors import safe_open
    files = []
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith(".safetensors"):
                files.append(os.path.join(path, name))
    elif os.path.exists(path):
        files = [path]
    if not files:
        raise FileNotFoundError(
            f"no .safetensors found at {path!r}; this environment has no "
            "network egress — provision diffusers/transformers weights "
            "locally (e.g. unet/diffusion_pytorch_model.safetensors).")
    out = {}
    for f in files:
        with safe_open(f, framework="numpy") as sf:
            for k in sf.keys():
                out[k] = sf.get_tensor(k)
    return out


def save_safetensors(state: Dict[str, np.ndarray], path: str):
    from safetensors.numpy import save_file
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in state.items()}, path)


def strip_prefix(state: Dict[str, np.ndarray],
                 prefix: str) -> Dict[str, np.ndarray]:
    """Drop e.g. ``text_model.`` from transformers checkpoints."""
    out = {}
    for k, v in state.items():
        out[k[len(prefix):] if k.startswith(prefix) else k] = v
    return out
