"""End-to-end visual demo: multi-view 3D reconstruction on the chip.

Optimizes a random Gaussian blob against the photometric scene-mode
mock guidance (the reference's debug-guidance idea,
conf/guidance/debug.yaml, with a real optimization signal) toward a
known target — three stacked RGB spheres — through the FULL production
training loop: fused Pallas rendering, per-field Adam, densification,
background.  Writes an orbit-strip image (target / init / final rows)
so the result is checkable by eye, and prints final-view PSNR.

Run:  python -m gsgen_tpu.tools.demo_recon [out.png]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cameras import CameraSamplerConfig
from ..guidance.mock import MockGuidance
from ..models.background import BackgroundConfig
from ..models.density import DensifyConfig, PruneConfig
from ..models.init import InitConfig
from ..models.scene import GaussianParams, RenderConfig, render_view
from ..ops.camera import CameraIntrinsics
from ..training.trainer import Trainer, TrainerConfig
from ..utils.activations import inv_act
from ..utils.spiral import camera_path_fixed_elevation


def build_target(key, n_per: int = 1500) -> GaussianParams:
    """Three stacked spheres (red / green / blue), surface-sampled."""
    centers = [(-0.0, 0.0, -0.45), (0.0, 0.0, 0.1), (0.0, 0.0, 0.5)]
    radii = [0.42, 0.3, 0.2]
    colors = [(0.85, 0.15, 0.15), (0.15, 0.8, 0.2), (0.2, 0.3, 0.9)]
    means, cols = [], []
    for i, (c, r, col) in enumerate(zip(centers, radii, colors)):
        d = jax.random.normal(jax.random.fold_in(key, i), (n_per, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        means.append(jnp.asarray(c) + r * d)
        cols.append(jnp.tile(jnp.asarray(col), (n_per, 1)))
    n = 3 * n_per
    logit = inv_act("sigmoid")
    return GaussianParams(
        mean=jnp.concatenate(means).astype(jnp.float32),
        qvec=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        svec=jnp.full((n, 3), jnp.log(0.025), jnp.float32),
        color=logit(jnp.clip(jnp.concatenate(cols), 1e-3, 1 - 1e-3)),
        alpha=jnp.full((n,), logit(jnp.float32(0.85))),
    )


def orbit_strip(params, active, rcfg, reso: int = 96, n: int = 6,
                distance: float = 2.2, elevation: float = 15.0):
    intr = CameraIntrinsics.from_reso(reso)
    c2ws = camera_path_fixed_elevation(n, 1, distance, elevation)
    bg = jnp.ones((3,), jnp.float32)
    frames = []
    for c2w in c2ws:
        out = render_view(params, active, jnp.asarray(c2w, jnp.float32),
                          intr, rcfg, bg, rgb_only=True)
        frames.append(np.clip(np.asarray(out["rgb"]), 0, 1))
    return np.concatenate(frames, axis=1)


def main(out_path: str = "docs/demo_recon.png", steps: int = 400):
    key = jax.random.PRNGKey(0)
    rcfg = RenderConfig(dup_cap=1 << 16, chunk=128)
    target = build_target(key)
    t_active = jnp.ones((target.mean.shape[0],), bool)

    reso = 64
    intr = CameraIntrinsics.from_reso(reso)
    guidance = MockGuidance(mode="scene", target_scene=target,
                            target_active=t_active, intr=intr, rcfg=rcfg)
    tcfg = TrainerConfig(
        max_steps=steps, batch_size=4,
        lr=dict(mean=0.02, svec=0.01, qvec=0.003, color=0.1, alpha=0.05,
                bg=0.003))
    trainer = Trainer(
        cfg=tcfg, rcfg=rcfg,
        init_cfg=InitConfig(num_points=1024, capacity=16384, svec_val=0.06,
                            mean_std=0.5),
        bg_cfg=BackgroundConfig(type="fixed", color=(1.0, 1.0, 1.0)),
        data_cfg=CameraSamplerConfig(
            batch_size=4, max_steps=steps, reso=(reso,),
            camera_distance=(2.0, 2.4)),
        guidance=guidance,
        dcfg=DensifyConfig(enabled=True, warm_up=100, end=steps - 100,
                           period=100, mean2d_thresh=2e-4,
                           split_thresh=0.04),
        pcfg=PruneConfig(enabled=True, warm_up=100, end=steps - 100,
                         period=100, alpha_thresh=0.02),
    )

    init_strip = orbit_strip(trainer.state.scene.params,
                             trainer.state.scene.active, rcfg)
    for s in range(steps):
        m = trainer.train_step(s)
        if s % 50 == 0 or s == steps - 1:
            print(f"step {s:4d}  loss {float(m['loss_total']):.5f}")

    final_strip = orbit_strip(trainer.state.scene.params,
                              trainer.state.scene.active, rcfg)
    target_strip = orbit_strip(target, t_active, rcfg)

    mse = float(np.mean((final_strip - target_strip) ** 2))
    psnr = -10.0 * np.log10(mse + 1e-12)
    print(f"orbit PSNR vs target: {psnr:.2f} dB")

    strip = np.concatenate([target_strip, init_strip, final_strip], axis=0)
    import os

    import imageio.v2 as imageio
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    imageio.imwrite(out_path, (strip * 255).astype(np.uint8))
    print(f"wrote {out_path} (rows: target / init / final)")
    return psnr


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["docs/demo_recon.png"]))
