"""Relight a trained scene with an orbiting point light.

TPU-native equivalent of reference utils/relight.py in gsgen3d/gsgen:
estimate per-Gaussian surface normals from the point cloud, modulate
the learned albedo by the Blinn half-vector term for each light
position, and render an orbit video with the shaded colors substituted
for the color field.

Usage: python -m gsgen_tpu.tools.relight <ckpt> [--frames 30] [--out x.mp4]
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..models.scene import (GaussianParams, RenderConfig, SceneState,
                            render_view, scene_normals)
from ..ops.camera import CameraIntrinsics
from ..utils.activations import act, inv_act
from ..data.cameras import c2w_from_up_and_look_at


def relight_colors(mean: jax.Array, normal: jax.Array, albedo: jax.Array,
                   light_pos: jax.Array, light_color: jax.Array,
                   cam_pos: jax.Array) -> jax.Array:
    """``light_color * |<bisector(L-x, C-x), n>| * albedo`` with backface
    culling via abs (reference utils/relight.py:13-18 compute_color)."""
    def unit(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                               1e-8)
    bisector = unit(unit(light_pos[None] - mean) + unit(cam_pos[None] - mean))
    dot = jnp.clip(jnp.abs(jnp.sum(bisector * normal, axis=-1)), 0.0, 1.0)
    return light_color[None] * dot[:, None] * albedo


def _shaded_params(params: GaussianParams, active, cfg: RenderConfig,
                   light_pos, light_color, cam_pos) -> GaussianParams:
    """Swap the color field for the relit color (the reference passes
    ``overrides={"color": ...}`` to render_one; here the override is a
    functional param substitution through the inverse activation)."""
    normal = scene_normals(params, active, cfg)
    albedo = act(cfg.color_act)(params.color)
    shaded = relight_colors(params.mean, normal, albedo, light_pos,
                            light_color, cam_pos)
    raw = inv_act(cfg.color_act)(jnp.clip(shaded, 1e-4, 1.0 - 1e-4))
    return params._replace(color=raw)


def relight_frames(state: SceneState, cfg: RenderConfig,
                   n_frames: int = 30, reso: int = 512,
                   camera_pos=(3.0, 0.0, 1.0),
                   light_radius: float = 3.0, light_z: float = 3.0,
                   light_color=(1.0, 1.0, 1.0)) -> np.ndarray:
    """[n_frames, reso, reso, 3] float frames: fixed camera, orbiting
    light (reference utils/relight.py:22-72 relight_video)."""
    if cfg.sh_degree > 0:
        raise ValueError("relight needs per-Gaussian RGB (sh_degree=0)")
    intr = CameraIntrinsics.from_reso(reso)
    up = np.array([0.0, 0.0, 1.0])
    c2w = jnp.asarray(c2w_from_up_and_look_at(
        up, np.zeros(3), np.asarray(camera_pos, np.float64)), jnp.float32)
    lcol = jnp.asarray(light_color, jnp.float32)
    azimuth = np.linspace(0, 2 * np.pi, n_frames)

    @jax.jit
    def frame(light_pos):
        p = _shaded_params(state.params, state.active, cfg, light_pos, lcol,
                           c2w[:3, 3])
        out = render_view(p, state.active, c2w, intr, cfg,
                          jnp.zeros((3,)), rgb_only=True)
        return jnp.clip(out["rgb"], 0.0, 1.0)

    frames = []
    for a in azimuth:
        lp = jnp.asarray([np.cos(a) * light_radius, np.sin(a) * light_radius,
                          light_z], jnp.float32)
        frames.append(np.asarray(frame(lp)))
    return np.stack(frames)


def main():
    import argparse
    import imageio.v2 as imageio

    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--config", default="configs/base.yaml")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--reso", type=int, default=512)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from ..config import build_trainer, load_config
    trainer = build_trainer(load_config(args.config))
    step = trainer.load(args.ckpt)
    print(f"loaded step {step}")
    frames = relight_frames(trainer.state.scene, trainer.rcfg,
                            n_frames=args.frames, reso=args.reso)
    out = args.out or "relight.mp4"
    imageio.mimwrite(out, (frames * 255).astype(np.uint8), fps=10)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
