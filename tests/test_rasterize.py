"""Tiled rasterizer (XLA backend) vs the dense oracle: pixels + grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsgen_tpu.ops.binning import bin_gaussians
from gsgen_tpu.ops.oracle import composite_dense, pixel_grid
from gsgen_tpu.ops.rasterize import rasterize_tiles


def make_scene(key, n, spread=0.6, cov_scale=0.02):
    ks = jax.random.split(key, 5)
    mean2d = jax.random.uniform(ks[0], (n, 2), minval=-spread, maxval=spread)
    # random SPD 2x2 covariances
    A = jax.random.normal(ks[1], (n, 2, 2)) * cov_scale
    cov2d = A @ jnp.swapaxes(A, 1, 2) + 1e-4 * jnp.eye(2)
    alpha = jax.random.uniform(ks[2], (n,), minval=0.2, maxval=1.0)
    feats = jax.random.uniform(ks[3], (n, 5))
    depth = jax.random.uniform(ks[4], (n,), minval=1.0, maxval=4.0)
    return mean2d, cov2d, alpha, feats, depth


def conic_of(cov2d):
    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] * cov2d[:, 1, 0]
    a = cov2d[:, 1, 1] / det
    b = -cov2d[:, 0, 1] / det
    c = cov2d[:, 0, 0] / det
    return jnp.stack([a, b, c], axis=-1)


RES = 32
TILE = 8
CHUNK = 32
FX = RES / 2.0  # focal: camera plane spans [-1, 1]


def render_both(n=60, radius=60.0, seed=0, cap=4096):
    """Render the same scene with the tiled rasterizer and the oracle.

    radius is the tile culling radius D; large D makes the tile AABB cut
    negligible so the tiled result must match the dense oracle exactly.
    """
    key = jax.random.PRNGKey(seed)
    mean2d, cov2d, alpha, feats, depth = make_scene(key, n)
    conic = conic_of(cov2d)
    active = jnp.ones((n,), bool)
    fx = fy = FX
    cx = cy = RES / 2.0

    bins = bin_gaussians(mean2d, cov2d, depth, active, fx, fy, cx, cy,
                         RES, RES, TILE, cap, chunk=CHUNK,
                         tile_culling_radius=radius)
    topleft = (-cx / fx, -cy / fy)
    psz = (1.0 / fx, 1.0 / fy)

    def tiled(mean2d, conic, alpha, feats):
        img, T = rasterize_tiles(mean2d, conic, alpha, feats, bins,
                                 topleft, psz, w=RES, h=RES, tile_size=TILE,
                                 chunk=CHUNK)
        return img, T

    def dense(mean2d, conic, alpha, feats):
        pix = pixel_grid(topleft, psz, RES, RES)
        out, T = composite_dense(mean2d, conic, alpha, feats, depth,
                                 active, pix)
        return out.reshape(RES, RES, -1), T.reshape(RES, RES)

    return (mean2d, conic, alpha, feats), tiled, dense, bins


def test_forward_matches_oracle():
    args, tiled, dense, bins = render_both()
    assert int(bins.total) <= 4096, "capacity overflow would invalidate test"
    img_t, T_t = tiled(*args)
    img_d, T_d = dense(*args)
    np.testing.assert_allclose(np.asarray(T_t), np.asarray(T_d),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_d),
                               rtol=1e-4, atol=1e-5)


def test_gradients_match_oracle():
    args, tiled, dense, _ = render_both(n=40)
    key = jax.random.PRNGKey(99)
    gimg = jax.random.normal(key, (RES, RES, 5))
    gT = jax.random.normal(jax.random.PRNGKey(7), (RES, RES))

    def loss(fn):
        def f(mean2d, conic, alpha, feats):
            img, T = fn(mean2d, conic, alpha, feats)
            return jnp.sum(img * gimg) + jnp.sum(T * gT)
        return f

    g_t = jax.grad(loss(tiled), argnums=(0, 1, 2, 3))(*args)
    g_d = jax.grad(loss(dense), argnums=(0, 1, 2, 3))(*args)
    names = ["mean2d", "conic", "alpha", "feats"]
    for name, a, b in zip(names, g_t, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_early_termination_semantics():
    # opaque wall of gaussians: T must freeze per reference ordering
    args, tiled, dense, _ = render_both(n=80, seed=3)
    mean2d, conic, alpha, feats = args
    alpha = jnp.full_like(alpha, 0.999)  # clamp + fast extinction
    img_t, T_t = tiled(mean2d, conic, alpha, feats)
    img_d, T_d = dense(mean2d, conic, alpha, feats)
    np.testing.assert_allclose(np.asarray(T_t), np.asarray(T_d),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_d),
                               rtol=1e-4, atol=1e-5)


def test_empty_scene():
    key = jax.random.PRNGKey(0)
    mean2d, cov2d, alpha, feats, depth = make_scene(key, 16)
    active = jnp.zeros((16,), bool)
    fx = fy = FX
    cx = cy = RES / 2.0
    bins = bin_gaussians(mean2d, cov2d, depth, active, fx, fy, cx, cy,
                         RES, RES, TILE, 512, chunk=CHUNK)
    img, T = rasterize_tiles(mean2d, conic_of(cov2d), alpha, feats, bins,
                             (-1.0, -1.0), (1.0 / fx, 1.0 / fy),
                             w=RES, h=RES, tile_size=TILE, chunk=CHUNK)
    assert np.allclose(np.asarray(img), 0.0)
    assert np.allclose(np.asarray(T), 1.0)
