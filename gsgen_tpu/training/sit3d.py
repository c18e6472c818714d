"""Image-to-3D (single-image-to-3D, "sit3d") support.

Ports the reference's image pipeline: depth-lifted initialization
(utils/initialize.py:359-407 in gsgen3d/gsgen), the original-view
image/depth losses and novel-view reference loss of train_step_sit3d
(trainer.py:623-734), and the front-point gradient mask
(gs/gaussian_splatting.py:341-366).

Monocular depth comes in as data (the reference runs Intel DPT at init,
trainer.py:101-107; any depth source works — DPT weights are an asset
in this framework).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.init import InitConfig, _sphere_points
from ..models.scene import RenderConfig, SceneState, make_scene
from ..ops.camera import CameraIntrinsics, get_rays_d
from ..utils.ops import farthest_point_sampling


class ImageTarget(NamedTuple):
    """Reference view assets for image-to-3D training (jit-safe pytree)."""

    image: jax.Array        # [H, W, 3] in [0, 1]
    depth: jax.Array        # [H, W] metric-ish monocular depth
    mask: jax.Array         # [H, W] bool foreground


def lift_to_3d(depth: jax.Array, intr: CameraIntrinsics,
               c2w: jax.Array) -> jax.Array:
    """Unproject a depth map to world points [H, W, 3]
    (kornia depth_to_3d semantics used at utils/initialize.py:370)."""
    dirs = get_rays_d(c2w, intr)                     # [H, W, 3] (unnormalized)
    origin = c2w[:3, 3]
    return origin[None, None, :] + dirs * depth[..., None]


def image_initialize(key: jax.Array, cfg: InitConfig, rcfg: RenderConfig,
                     target: ImageTarget, intr: CameraIntrinsics,
                     c2w: jax.Array, grad_mask: bool = True):
    """Depth-lifted front points + semisphere back points
    (utils/initialize.py:359-407).  Returns (SceneState, grad_mask [M]
    bool — True rows are FROZEN front points, or None)."""
    pts = lift_to_3d(target.depth, intr, c2w).reshape(-1, 3)
    rgb = target.image.reshape(-1, 3)
    m = target.mask.reshape(-1)
    # masked select with static shape: order foreground first, cut to n
    order = jnp.argsort(~m, stable=True)
    n_fg = jnp.sum(m)
    pts, rgb = pts[order], rgb[order]
    n_front = min(cfg.num_points, int(pts.shape[0]))
    idx = farthest_point_sampling(pts, n_front,
                                  mask=jnp.arange(pts.shape[0]) < n_fg)
    front_mean, front_rgb = pts[idx], rgb[idx]

    k1, k2 = jax.random.split(key)
    back_mean = _sphere_points(k1, cfg.num_points, cfg.mean_std, semi=True)
    back_rgb = jax.random.uniform(k2, (cfg.num_points, 3))

    mean = jnp.concatenate([front_mean, back_mean])
    color = jnp.concatenate([front_rgb, back_rgb])
    n = mean.shape[0]
    qvec = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    svec = jnp.full((n, 3), cfg.svec_val)
    alpha = jnp.full((n,), cfg.alpha_val)
    state = make_scene(mean, qvec, svec, color, alpha, rcfg,
                       capacity=cfg.capacity or n)
    gmask = None
    if grad_mask:
        m_cap = state.params.mean.shape[0]
        gmask = jnp.arange(m_cap) < n_front       # freeze the lifted points
    return state, gmask


def sit3d_losses(outs: Dict, batch: Dict, target: ImageTarget,
                 sched: Dict) -> Dict[str, jax.Array]:
    """Original-view image + depth losses (trainer.py:659-690), computed
    for every sample and weighted by the per-sample ``is_original``
    mask (static shapes; the reference boolean-indexes)."""
    from .losses import image_loss, pearson_depth_loss
    H = outs["rgb"].shape[1]
    img = jax.image.resize(target.image, (H, H, 3), "bilinear")
    dep = jax.image.resize(target.depth, (H, H), "bilinear")
    is_orig = batch["is_original"]
    n_orig = jnp.maximum(jnp.sum(is_orig), 1e-6)

    per_img = jax.vmap(lambda r: image_loss(r, img, 0.2, "l2"))(outs["rgb"])
    loss_image = jnp.sum(per_img * is_orig) / n_orig
    per_dep = jax.vmap(lambda d: pearson_depth_loss(d, dep))(outs["depth"])
    loss_depth = jnp.sum(per_dep * is_orig) / n_orig
    return {"loss_image": loss_image, "loss_depth": loss_depth}
