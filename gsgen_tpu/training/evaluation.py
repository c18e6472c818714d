"""Periodic evaluation: eval images, orbit videos.

The jitted render is reused across frames (same shapes); frames are
pulled to host one at a time like the reference's no-grad loop
(trainer.py:473-574 in gsgen3d/gsgen).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import RenderConfig, SceneState, render_view
from ..ops.camera import CameraIntrinsics
from ..utils.colormaps import eval_image_strip
from ..utils.spiral import camera_path_fixed_elevation, random_pose_fixed_elevation


@functools.partial(jax.jit, static_argnames=("intr", "cfg", "rgb_only"))
def _render_eval(params, active, c2w, intr: CameraIntrinsics,
                 cfg: RenderConfig, rgb_only=False):
    out = render_view(params, active, jnp.asarray(c2w, jnp.float32), intr,
                      cfg, jnp.zeros((3,)), rgb_only=rgb_only)
    out["rgb"] = jnp.clip(out["rgb"], 0.0, 1.0)  # eval clamp (:1404)
    return out


def eval_image(state: SceneState, intr: CameraIntrinsics, cfg: RenderConfig,
               rng: np.random.Generator, elevation: float = 45.0,
               camera_distance: float = 2.5) -> np.ndarray:
    """Random-azimuth eval strip (trainer.py:473-517 eval_image_step)."""
    c2w = random_pose_fixed_elevation(rng, camera_distance, elevation)
    out = _render_eval(state.params, state.active, c2w, intr, cfg)
    return eval_image_strip({k: np.asarray(v) for k, v in out.items()
                             if hasattr(v, "shape") and np.ndim(v) >= 2})


def eval_video(state: SceneState, intr: CameraIntrinsics, cfg: RenderConfig,
               n_frames: int = 30, n_circles: int = 1,
               elevation: float = 45.0,
               camera_distance: float = 2.5) -> np.ndarray:
    """Orbit video frames [T, H, W, 3] (trainer.py:519-574)."""
    c2ws = camera_path_fixed_elevation(n_frames, n_circles, camera_distance,
                                       elevation)
    frames = []
    for c2w in c2ws:
        out = _render_eval(state.params, state.active, c2w, intr, cfg,
                           rgb_only=True)
        frames.append(np.asarray(out["rgb"]))
    return np.stack(frames)
