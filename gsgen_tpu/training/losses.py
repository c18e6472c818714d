"""Penalty and image losses.

Ports the reference auxiliary penalties (gs/gaussian_splatting.py:949-1121)
and image/depth losses (utils/loss.py:30-67, utils/ops.py:51-55) to pure
JAX over a masked fixed-capacity scene.  Every weight is a host-side
``C()`` schedule scalar; a weight of 0 skips nothing under jit (the
graph is static) but the terms are cheap elementwise reductions XLA
fuses away.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..models.scene import GaussianParams, RenderConfig, activate
from ..utils.ops import knn_self, distance_to_gaussian_surface
from ..ops.transforms import quat_to_rotmat


def _masked_mean(x, mask):
    return jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(jnp.sum(mask), 1.0)


def alpha_penalty(params: GaussianParams, active, cfg: RenderConfig,
                  kind: str = "center_weighted") -> jax.Array:
    """gs/gaussian_splatting.py:950-971."""
    _, _, _, _, alpha = activate(params, cfg)
    if kind == "uniform_l1":
        return _masked_mean(alpha, active)
    if kind == "uniform_l2":
        return _masked_mean(alpha * alpha, active)
    if kind == "center_weighted":
        r = jnp.linalg.norm(jax.lax.stop_gradient(params.mean), axis=-1)
        return _masked_mean(r * alpha, active)
    raise ValueError(f"alpha penalty {kind}")


def mean_penalty(params: GaussianParams, active, kind: str = "uniform_l1"):
    """gs/gaussian_splatting.py:973-1000."""
    r = jnp.linalg.norm(params.mean, axis=-1)
    if kind == "uniform_l1":
        return _masked_mean(r, active)
    if kind == "uniform_l2":
        return _masked_mean(r * r, active)
    if kind == "weighted_l1":
        return _masked_mean(jax.lax.stop_gradient(r) * r, active)
    if kind == "weighted_l2":
        rd = jax.lax.stop_gradient(r)
        return _masked_mean(rd * rd * r * r, active)
    raise ValueError(f"mean penalty {kind}")


def scale_penalty(params: GaussianParams, active, cfg: RenderConfig):
    """Total ellipsoid volume (gs/gaussian_splatting.py:1002-1015 — note
    the reference SUMS, not means)."""
    _, _, svec, _, _ = activate(params, cfg)
    vol = jnp.prod(svec, axis=-1)
    return jnp.sum(jnp.where(active, vol, 0.0))


def nn_penalty(params: GaussianParams, active):
    """Mean distance to the nearest neighbor (gs/gaussian_splatting.py:1035-1050)."""
    d2, _ = knn_self(params.mean, 1, mask=active)
    return _masked_mean(jnp.sqrt(jnp.maximum(d2[:, 0], 0.0)), active)


def compat_penalty(params: GaussianParams, active, cfg: RenderConfig,
                   kind: str = "l1"):
    """Gap-to-nearest-Gaussian-surface penalty — GSGEN's compactness
    regularizer (gs/gaussian_splatting.py:1052-1103)."""
    _, _, svec, _, _ = activate(params, cfg)
    _, idx = knn_self(params.mean, 1, mask=active)
    idx = idx[:, 0]
    nn_pos = params.mean[idx]
    nn_svec = svec[idx]
    nn_qvec = params.qvec[idx]
    d_nn_surf = distance_to_gaussian_surface(nn_pos, nn_svec, nn_qvec,
                                             params.mean)
    d_self_surf = distance_to_gaussian_surface(params.mean, svec, params.qvec,
                                               nn_pos)
    dist = jnp.linalg.norm(nn_pos - params.mean, axis=-1)
    gap = dist - d_self_surf - d_nn_surf
    m = active & (gap > 0)
    if kind == "l1":
        return _masked_mean(gap, m)
    if kind == "l2":
        return _masked_mean(gap * gap, m)
    raise ValueError(f"compat penalty {kind}")


def move_penalty(params: GaussianParams, active, prev_mean):
    """Mean displacement from the previous step's positions
    (gs/gaussian_splatting.py:1016-1030; the reference's ``prev_mean``
    is never written — here the trainer snapshots it each step)."""
    d2 = jnp.sum((params.mean - jax.lax.stop_gradient(prev_mean)) ** 2,
                 axis=-1)
    return _masked_mean(jnp.sqrt(d2 + 1e-12), active)


def specular_penalty(params: GaussianParams, active):
    """Mean specular albedo (gs/gaussian_splatting.py:1099-1111)."""
    if params.specular is None:
        raise ValueError("specular penalty needs RenderConfig.pbr=True")
    spec = jax.nn.sigmoid(params.specular)
    return _masked_mean(jnp.mean(spec, axis=-1), active)


PENALTIES = dict(alpha=alpha_penalty, mean=mean_penalty, scale=scale_penalty,
                 NN=nn_penalty, compat=compat_penalty, move=move_penalty,
                 specular=specular_penalty)


# -- image losses (utils/loss.py) --

def _gaussian_window(size: int, sigma: float):
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def ssim(a: jax.Array, b: jax.Array, window_size: int = 11,
         sigma: float = 1.5, c1: float = 0.01 ** 2, c2: float = 0.03 ** 2):
    """SSIM over [H, W, C] images (kornia.losses.ssim_loss semantics,
    utils/loss.py:30-43), separable Gaussian window."""
    win = _gaussian_window(window_size, sigma)

    def blur(x):
        # x [H, W, C]; depthwise separable convolution
        x = jnp.moveaxis(x, -1, 0)[:, None]            # [C,1,H,W]
        kh = win.reshape(1, 1, -1, 1)
        kw = win.reshape(1, 1, 1, -1)
        pad = window_size // 2
        x = jax.lax.conv_general_dilated(x, kh, (1, 1),
                                         [(pad, pad), (0, 0)])
        x = jax.lax.conv_general_dilated(x, kw, (1, 1),
                                         [(0, 0), (pad, pad)])
        return jnp.moveaxis(x[:, 0], 0, -1)

    mu_a, mu_b = blur(a), blur(b)
    var_a = blur(a * a) - mu_a ** 2
    var_b = blur(b * b) - mu_b ** 2
    cov = blur(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    return jnp.mean(s)


def image_loss(pred, target, ssim_weight: float = 0.2, kind: str = "l1"):
    """SSIM + L1/L2 mix (reference get_image_loss, utils/loss.py:46-58)."""
    if kind == "l1":
        photo = jnp.mean(jnp.abs(pred - target))
    else:
        photo = jnp.mean((pred - target) ** 2)
    return ssim_weight * (1.0 - ssim(pred, target)) + (1.0 - ssim_weight) * photo


def pearson_depth_loss(pred: jax.Array, target: jax.Array):
    """Negative Pearson correlation between depth maps
    (utils/loss.py:61-67)."""
    p = pred.reshape(-1)
    t = target.reshape(-1)
    p = p - p.mean()
    t = t - t.mean()
    denom = jnp.linalg.norm(p) * jnp.linalg.norm(t) + 1e-8
    return 1.0 - jnp.dot(p, t) / denom


def opacity_bce_loss(opacity: jax.Array, target_mask: jax.Array, eps=1e-6):
    """BCE against a coverage mask (utils/ops.py:51-55)."""
    o = jnp.clip(opacity, eps, 1.0 - eps)
    return -jnp.mean(target_mask * jnp.log(o) +
                     (1.0 - target_mask) * jnp.log(1.0 - o))
