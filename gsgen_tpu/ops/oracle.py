"""Dense O(N * pixels) reference compositor — the testing oracle.

This is a direct, sequential (``lax.scan``) transcription of the
reference CUDA compositing semantics (gs/src/include/vol_render.h:100-166
in gsgen3d/gsgen):

* per-Gaussian weight ``G = exp(-0.5 * radial)`` with ``radial`` clamped
  to >= 0 (the CUDA code sets radial=1000 when negative,
  kernels.h:195-224),
* alpha clamped to 0.99 (vol_render.h:128),
* a Gaussian is skipped entirely (no T update) when
  ``alpha * G < 1/255`` (vol_render.h:132, common.h:89),
* front-to-back compositing with early exit: once ``T < T_thresh`` the
  remaining Gaussians contribute nothing and T freezes
  (vol_render.h:125-127),
* arbitrary per-Gaussian feature channels composite with the same
  weights (vol_render_scalar.h semantics) — RGB, depth, z^2 and the
  constant 1 (opacity) are all just columns here.

The production Pallas kernels derive the same math via cumulative
products; tests assert both agree to fp32 tolerance.  This oracle is
differentiable by plain autodiff and is the gradient ground truth.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

ALPHA_CLAMP = 0.99          # vol_render.h:128
MIN_RENDER_ALPHA = 1.0 / 255.0  # common.h:89
DEFAULT_T_THRESH = 1e-4     # conf/base.yaml:137


def gaussian_weight(mean2d: jax.Array, conic: jax.Array, pos: jax.Array) -> jax.Array:
    """Unnormalized 2D Gaussian value at camera-plane positions.

    mean2d: [..., 2], conic: [..., 3] (a, b, c), pos: [..., 2] — shapes
    broadcast.  Matches kernel_gaussian_2d (kernels.h:195-224) with the
    conic precomputed as (cov_yy, -cov_xy, cov_xx)/det.
    """
    dx = pos[..., 0] - mean2d[..., 0]
    dy = pos[..., 1] - mean2d[..., 1]
    radial = conic[..., 0] * dx * dx + 2.0 * conic[..., 1] * dx * dy + conic[..., 2] * dy * dy
    radial = jnp.maximum(radial, 0.0)
    return jnp.exp(-0.5 * radial)


def composite_dense(
    mean2d: jax.Array,      # [N, 2]
    conic: jax.Array,       # [N, 3]
    alpha: jax.Array,       # [N]   in [0, 1]
    feats: jax.Array,       # [N, C] channels to composite
    depth: jax.Array,       # [N]   sort key (camera-space z)
    active: jax.Array,      # [N]   bool
    pixels: jax.Array,      # [P, 2] camera-plane positions
    T_thresh: float = DEFAULT_T_THRESH,
) -> Tuple[jax.Array, jax.Array]:
    """Front-to-back composite of all Gaussians at all pixels.

    Returns (out [P, C], T [P]).  Inactive Gaussians are sorted to the
    back with zero alpha.  Ties in depth keep ascending index order
    (stable sort) to mirror CUB radix-sort stability.
    """
    n = mean2d.shape[0]
    key = jnp.where(active, depth, jnp.inf)
    order = jnp.argsort(key, stable=True)
    mean2d = mean2d[order]
    conic = conic[order]
    alpha = jnp.where(active[order], alpha[order], 0.0)
    feats = feats[order]

    a_cl = jnp.minimum(alpha, ALPHA_CLAMP)

    def step(carry, g):
        T, acc = carry
        g_mean, g_conic, g_alpha, g_feat = g
        G = gaussian_weight(g_mean, g_conic, pixels)            # [P]
        aG = g_alpha * G
        aG = jnp.where(aG < MIN_RENDER_ALPHA, 0.0, aG)
        live = T >= T_thresh                                    # [P]
        w = jnp.where(live, aG * T, 0.0)
        acc = acc + w[:, None] * g_feat[None, :]
        T = jnp.where(live, T * (1.0 - aG), T)
        return (T, acc), None

    P = pixels.shape[0]
    C = feats.shape[-1]
    T0 = jnp.ones((P,), dtype=jnp.float32)
    acc0 = jnp.zeros((P, C), dtype=jnp.float32)
    (T, acc), _ = jax.lax.scan(step, (T0, acc0), (mean2d, conic, a_cl, feats))
    return acc, T


def pixel_grid(intr_topleft, pixel_size, h: int, w: int) -> jax.Array:
    """Camera-plane positions of all pixels, [H*W, 2], row-major.

    Pixel (i, j) -> topleft + (j * psx, i * psy), matching the CUDA
    pos computation (vol_render.h:105-107: ``topleft + global_xy *
    pixel_size``, no half-pixel offset).
    """
    tx, ty = intr_topleft
    psx, psy = pixel_size
    xs = tx + jnp.arange(w, dtype=jnp.float32) * psx
    ys = ty + jnp.arange(h, dtype=jnp.float32) * psy
    xg, yg = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([xg.reshape(-1), yg.reshape(-1)], axis=-1)
