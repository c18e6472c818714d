"""Mock guidance for tests and benchmarks.

The reference uses debug guidance configs (conf/guidance/debug.yaml) for
kernel work without downloading diffusion weights; this is the same idea
with a real optimization signal (SURVEY §7.0: "mock/analytic guidance
(e.g., multi-view photometric target) for tests and benchmarks").

Two modes:

* ``constant_color`` — pull renders toward a fixed color; convergence is
  trivially checkable.
* ``scene`` — multi-view photometric target: L2 toward renders of a
  frozen target Gaussian scene from the same cameras (a tiny
  reconstruction problem with a known optimum; exercises the full
  geometry + compositing gradient path).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..models.scene import GaussianParams, RenderConfig, render_batch
from ..ops.camera import CameraIntrinsics


class MockGuidance:
    def __init__(self, mode: str = "constant_color",
                 color=(0.8, 0.3, 0.2),
                 target_scene: Optional[GaussianParams] = None,
                 target_active=None,
                 intr: Optional[CameraIntrinsics] = None,
                 rcfg: Optional[RenderConfig] = None):
        self.mode = mode
        self.params = {}
        self.color = jnp.asarray(color, jnp.float32)
        self.target_scene = target_scene
        self.target_active = target_active
        self.intr = intr
        self.rcfg = rcfg

    def loss(self, params, rgb, embedding, elevation, azimuth,
             camera_distance, key, sched, c2ws=None, fxs=None, fys=None,
             cxs=None, cys=None) -> Dict[str, jax.Array]:
        if self.mode == "constant_color":
            target = self.color[None, None, None, :]
        elif self.mode == "scene":
            assert c2ws is not None and self.target_scene is not None
            B = c2ws.shape[0]
            bgs = jnp.ones((B, 3), jnp.float32)
            intr = self.intr
            if intr.h != rgb.shape[1] or intr.w != rgb.shape[2]:
                # resolution curriculum (c2f): render the target at the
                # CURRENT train reso — per-view focal/center scalars
                # come from the batch (fxs/cxs), so only the static
                # pixel grid needs rebuilding
                intr = CameraIntrinsics.from_reso(rgb.shape[1])
            outs = render_batch(self.target_scene, self.target_active, c2ws,
                                intr, self.rcfg, bgs, fxs, fys, cxs, cys,
                                rgb_only=True)
            target = jax.lax.stop_gradient(outs["rgb"])
        else:
            raise ValueError(self.mode)
        return {"loss_sds": 0.5 * jnp.mean((rgb - target) ** 2)}
