"""Colormaps for eval images (depth / opacity / float channels).

Port of the reference's nerfstudio-derived colormaps
(utils/colormaps.py:48-218 in gsgen3d/gsgen) on numpy + matplotlib.
"""

from __future__ import annotations

import numpy as np


def _matplotlib_map(name: str):
    import matplotlib
    return matplotlib.colormaps[name]


def apply_float_colormap(x: np.ndarray, colormap: str = "viridis") -> np.ndarray:
    """[..., 1] floats in [0, 1] -> [..., 3] rgb."""
    cm = _matplotlib_map(colormap)
    rgba = cm(np.clip(x[..., 0], 0.0, 1.0))
    return rgba[..., :3].astype(np.float32)


def apply_depth_colormap(depth: np.ndarray,
                         accumulation: np.ndarray | None = None,
                         near: float | None = None,
                         far: float | None = None,
                         colormap: str = "turbo") -> np.ndarray:
    """Depth [..., 1] -> rgb, scaled to [near, far] (defaults to min/max),
    dimmed by accumulation like the reference (utils/colormaps.py:140-171)."""
    near = float(np.min(depth)) if near is None else near
    far = float(np.max(depth)) if far is None else far
    x = np.clip((depth - near) / (far - near + 1e-10), 0, 1)
    img = apply_float_colormap(x, colormap)
    if accumulation is not None:
        img = img * accumulation + (1.0 - accumulation)
    return img


def apply_boolean_colormap(mask: np.ndarray) -> np.ndarray:
    """bool [..., 1] -> white/black rgb."""
    return np.repeat(mask.astype(np.float32), 3, axis=-1)


def eval_image_strip(out: dict) -> np.ndarray:
    """rgb | depth | opacity | z_var strip for train logging
    (trainer.py:393-419 layout)."""
    rgb = np.clip(np.asarray(out["rgb"]), 0, 1)
    cols = [rgb]
    if "depth" in out:
        op = np.asarray(out["opacity"])[..., None]
        cols.append(apply_depth_colormap(np.asarray(out["depth"])[..., None],
                                         accumulation=op))
        cols.append(apply_float_colormap(op, "gray"))
    if "z_var" in out:
        zv = np.asarray(out["z_var"])[..., None]
        zv = zv / (zv.max() + 1e-10)
        cols.append(apply_float_colormap(np.clip(zv, 0, 1)))
    return np.concatenate(cols, axis=1)
