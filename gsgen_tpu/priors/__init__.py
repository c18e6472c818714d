"""3D generative priors (Point-E / Shap-E) as asset producers.

The reference vendors OpenAI's point-e and shap-e (~18 KLoC) and runs
them at Trainer init to produce a ~4K-point colored cloud
(utils/initialize.py:110-228, utils/point_e_helper.py in gsgen3d/gsgen).
In this framework generative init is an ASSET PIPELINE: clouds are
produced once (by any generator, on any machine), stored as .npy/.npz/
.ply, and consumed by ``init.type=point_cloud`` — the reference itself
treats init as one-shot data (SURVEY §7.0).  In a zero-egress
environment the pretrained Point-E/Shap-E checkpoints cannot be
downloaded, so the in-process generators raise with a pointer to the
asset path convention instead of silently degrading.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

ASSET_DIR = os.environ.get("GSGEN_ASSET_DIR", "assets/point_clouds")


def load_point_cloud(path) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Load (xyz [N,3], rgb [N,3] or None) from .npy/.npz/.ply.

    .npy: [N, 6] (xyz+rgb) or [N, 3] (utils/initialize.py:311-334).
    """
    path = Path(path)
    if path.suffix == ".npy":
        a = np.load(path)
        return a[:, :3], (a[:, 3:6] if a.shape[1] >= 6 else None)
    if path.suffix == ".npz":
        z = np.load(path)
        return z["xyz"], (z["rgb"] if "rgb" in z else None)
    if path.suffix == ".ply":
        return _load_ply_points(path)
    raise ValueError(f"unknown point cloud format {path.suffix}")


def _load_ply_points(path) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Minimal binary/ascii PLY vertex reader (x y z [red green blue])."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n = next(int(l.split()[-1]) for l in header
                 if l.startswith("element vertex"))
        props = [l.split()[1:] for l in header if l.startswith("property")]
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        names = [p[1] for p in props]
        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n)
        else:
            dt = np.dtype([(p[1], {"float": "<f4", "uchar": "u1",
                                   "double": "<f8", "int": "<i4"}[p[0]])
                           for p in props])
            data = np.frombuffer(f.read(n * dt.itemsize), dtype=dt, count=n)
            data = np.stack([data[nm].astype(np.float64) for nm in names], 1)
        xyz = data[:, [names.index("x"), names.index("y"), names.index("z")]]
        rgb = None
        if "red" in names:
            rgb = data[:, [names.index("red"), names.index("green"),
                           names.index("blue")]]
            if rgb.max() > 1.5:
                rgb = rgb / 255.0
        return xyz.astype(np.float32), rgb


def _asset_path(kind: str, prompt: str) -> Path:
    key = hashlib.md5(prompt.encode()).hexdigest()[:16]
    return Path(ASSET_DIR) / f"{kind}_{key}.npz"


def point_e_generate(prompt: str, num_points: int = 4096
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Text -> colored point cloud via a precomputed Point-E asset.

    Looks up ``$GSGEN_ASSET_DIR/point_e_<md5(prompt)[:16]>.npz`` (keys
    xyz, rgb).  Generating in-process requires the point-e checkpoints
    (reference downloads them, utils/point_e_helper.py:12-40) which this
    environment cannot fetch.
    """
    p = _asset_path("point_e", prompt)
    if p.exists():
        z = np.load(p)
        return z["xyz"][:num_points], z["rgb"][:num_points]
    raise FileNotFoundError(
        f"No Point-E asset for prompt {prompt!r} at {p}. Precompute the "
        "cloud (any machine with the point-e checkpoints) and save "
        "np.savez(path, xyz=..., rgb=...); or use init.type="
        "base/unisphere/semisphere/box.")


def shap_e_generate(prompt: str, num_points: int = 4096
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Text -> mesh-surface points via a precomputed Shap-E asset
    (reference utils/shap_e_helper.py + utils/initialize.py:170-228)."""
    p = _asset_path("shap_e", prompt)
    if p.exists():
        z = np.load(p)
        return z["xyz"][:num_points], z["rgb"][:num_points]
    raise FileNotFoundError(
        f"No Shap-E asset for prompt {prompt!r} at {p}; precompute and "
        "save np.savez(path, xyz=..., rgb=...).")
