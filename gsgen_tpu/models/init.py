"""Scene initializers: geometric priors + point-cloud / checkpoint loading.

JAX re-implementation of the reference init dispatcher
(utils/initialize.py:38-510 in gsgen3d/gsgen).  Generative 3D priors
(Point-E / Shap-E) are host-side asset producers in this framework —
``point_cloud`` consumes their output arrays (the reference also treats
init as one-shot data, SURVEY §7.0); see ``gsgen_tpu.priors`` for the
text->cloud generators.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.ops import mean_knn_sqdist
from .scene import RenderConfig, SceneState, make_scene


@dataclasses.dataclass(frozen=True)
class InitConfig:
    """Mirrors conf/base.yaml:27-37 + utils/initialize.py arg shapes."""

    type: str = "base"         # base|unisphere|semisphere|box|unbounded|
                               # point_cloud|ckpt (mesh / point_e /
                               # shap_e / point_e_image resolve to
                               # point_cloud arrays in config.py)
    num_points: int = 4096
    mean_std: float = 0.6      # blob std / sphere radius / box half-side
    svec_val: float = 0.02
    alpha_val: float = 0.8
    random_color: bool = True
    facex: bool = False        # rotate +x-facing (point-e convention)
    knn_scale: bool = False    # svec from mean KNN distance (gs/initialize.py:5)
    capacity: Optional[int] = None  # static param capacity (default: num_points)


def _sphere_points(key, n, radius, semi=False):
    """Uniform points on a (semi)sphere (utils/initialize.py:68-109)."""
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, (n,)) * 2.0 * jnp.pi
    if semi:
        theta = jax.random.uniform(k1, (n,)) * jnp.pi + jnp.pi / 2.0
    phi = jnp.arccos(1.0 - 2.0 * jax.random.uniform(k2, (n,)))
    x = radius * jnp.sin(phi) * jnp.cos(theta)
    y = radius * jnp.sin(phi) * jnp.sin(theta)
    z = radius * jnp.cos(phi)
    return jnp.stack([x, y, z], axis=1)


def _box_points(key, n, half):
    """Points on the surface of a box (utils/initialize.py:462-472)."""
    k1, k2, k3 = jax.random.split(key, 3)
    u = (jax.random.uniform(k1, (n,)) * 2.0 - 1.0) * half
    v = (jax.random.uniform(k2, (n,)) * 2.0 - 1.0) * half
    w = jnp.full((n,), half / 2.0).at[::2].multiply(-1.0)
    xyz = jnp.stack([u, v, w], axis=1)
    # random per-point axis permutation
    perm = jax.random.randint(k3, (n,), 0, 3)
    rolled = jnp.stack([xyz, jnp.roll(xyz, 1, axis=1), jnp.roll(xyz, 2, axis=1)])
    return rolled[perm, jnp.arange(n)]


def initialize(key: jax.Array, cfg: InitConfig,
               render_cfg: RenderConfig,
               points: Optional[np.ndarray] = None,
               colors: Optional[np.ndarray] = None,
               raw_values: Optional[dict] = None) -> SceneState:
    """Build an initialized SceneState (utils/initialize.py:485-510 dispatch)."""
    k_pos, k_col, k_misc = jax.random.split(key, 3)
    n = cfg.num_points

    if cfg.type == "ckpt":
        # fresh-run init from a checkpoint's RAW scene params (reference
        # from_ckpt, utils/initialize.py:335-356): a NEW run (new
        # capacity / guidance / schedules) starts from a trained scene;
        # unlike full resume nothing else (optimizer, step) carries over
        assert raw_values is not None, \
            "ckpt init needs raw_values (io.checkpoint." \
            "scene_arrays_from_checkpoint)"
        mean = jnp.asarray(raw_values["mean"], jnp.float32)
        return make_scene(
            mean,
            jnp.asarray(raw_values["qvec"], jnp.float32),
            jnp.asarray(raw_values["svec"], jnp.float32),
            jnp.asarray(raw_values["color"], jnp.float32),
            jnp.asarray(raw_values["alpha"], jnp.float32),
            render_cfg, capacity=cfg.capacity or mean.shape[0], raw=True)

    if cfg.type == "base":
        mean = jax.random.normal(k_pos, (n, 3)) * cfg.mean_std
    elif cfg.type in ("unisphere", "unbounded"):
        mean = _sphere_points(k_pos, n, cfg.mean_std)
    elif cfg.type == "semisphere":
        mean = _sphere_points(k_pos, n, cfg.mean_std, semi=True)
    elif cfg.type == "box":
        mean = _box_points(k_pos, n, cfg.mean_std)
    elif cfg.type == "point_cloud":
        assert points is not None, "point_cloud init needs points"
        mean = jnp.asarray(points, jnp.float32)[:, :3]
        n = mean.shape[0]
        if cfg.facex:
            # point-e convention rotate (utils/initialize.py:152-156):
            # (x, y, z) -> (-y, x, z)
            x, y, z = mean[:, 0], mean[:, 1], mean[:, 2]
            mean = jnp.stack([-y, x, z], axis=1)
    else:
        raise NotImplementedError(f"init type {cfg.type}")

    if colors is not None:
        color = jnp.asarray(colors, jnp.float32)[:, :3]
    elif cfg.random_color:
        color = jax.random.uniform(k_col, (n, 3))
    else:
        color = jnp.full((n, 3), 0.5)

    qvec = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    if cfg.knn_scale or cfg.svec_val <= 0.0:
        s = mean_knn_sqdist(mean, k=3)
        svec = jnp.broadcast_to(s[:, None], (n, 3))
    else:
        svec = jnp.full((n, 3), cfg.svec_val)
    alpha = jnp.full((n,), cfg.alpha_val)

    return make_scene(mean, qvec, svec, color, alpha, render_cfg,
                      capacity=cfg.capacity or n)
