"""Pallas kernels (interpret mode) vs dense oracle: pixels + grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsgen_tpu.ops.binning import bin_gaussians
from gsgen_tpu.ops.oracle import composite_dense, pixel_grid
from gsgen_tpu.ops.pallas_raster import rasterize_tiles_pallas
from gsgen_tpu.ops.rasterize import rasterize_tiles

from test_rasterize import make_scene, conic_of

RES = 32
TILE = 8
CHUNK = 128   # lane-aligned chunk
FX = RES / 2.0


def setup(n=60, radius=60.0, seed=0, cap=4096, alpha_override=None):
    key = jax.random.PRNGKey(seed)
    mean2d, cov2d, alpha, feats, depth = make_scene(key, n)
    if alpha_override is not None:
        alpha = jnp.full_like(alpha, alpha_override)
    conic = conic_of(cov2d)
    active = jnp.ones((n,), bool)
    fx = fy = FX
    cx = cy = RES / 2.0
    bins = bin_gaussians(mean2d, cov2d, depth, active, fx, fy, cx, cy,
                         RES, RES, TILE, cap, chunk=CHUNK,
                         tile_culling_radius=radius)
    topleft = (-cx / fx, -cy / fy)
    psz = (1.0 / fx, 1.0 / fy)

    interp = jax.default_backend() == "cpu"   # compiled on real TPU

    def pallas_fn(mean2d, conic, alpha, feats):
        return rasterize_tiles_pallas(
            mean2d, conic, alpha, feats, bins, topleft, psz,
            w=RES, h=RES, tile_size=TILE, chunk=CHUNK, interpret=interp)

    def dense_fn(mean2d, conic, alpha, feats):
        pix = pixel_grid(topleft, psz, RES, RES)
        out, T = composite_dense(mean2d, conic, alpha, feats, depth,
                                 active, pix)
        return out.reshape(RES, RES, -1), T.reshape(RES, RES)

    return (mean2d, conic, alpha, feats), pallas_fn, dense_fn, bins


def test_pallas_forward_matches_oracle():
    args, pallas_fn, dense_fn, bins = setup()
    assert int(bins.total) <= 4096
    img_p, T_p = pallas_fn(*args)
    img_d, T_d = dense_fn(*args)
    np.testing.assert_allclose(np.asarray(T_p), np.asarray(T_d),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_d),
                               rtol=1e-4, atol=1e-5)


def test_pallas_backward_matches_oracle():
    args, pallas_fn, dense_fn, _ = setup(n=40)
    gimg = jax.random.normal(jax.random.PRNGKey(99), (RES, RES, 5))
    gT = jax.random.normal(jax.random.PRNGKey(7), (RES, RES))

    def loss(fn):
        def f(mean2d, conic, alpha, feats):
            img, T = fn(mean2d, conic, alpha, feats)
            return jnp.sum(img * gimg) + jnp.sum(T * gT)
        return f

    g_p = jax.grad(loss(pallas_fn), argnums=(0, 1, 2, 3))(*args)
    g_d = jax.grad(loss(dense_fn), argnums=(0, 1, 2, 3))(*args)
    for name, a, b in zip(["mean2d", "conic", "alpha", "feats"], g_p, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_pallas_early_termination():
    args, pallas_fn, dense_fn, _ = setup(n=80, seed=3, alpha_override=0.999)
    img_p, T_p = pallas_fn(*args)
    img_d, T_d = dense_fn(*args)
    np.testing.assert_allclose(np.asarray(T_p), np.asarray(T_d),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_d),
                               rtol=1e-4, atol=1e-5)


def test_pallas_backward_with_early_exit_grads():
    # opaque scene: grads behind the opaque front must be exactly zero
    args, pallas_fn, dense_fn, _ = setup(n=50, seed=5, alpha_override=0.999)

    def loss(fn):
        def f(mean2d, conic, alpha, feats):
            img, T = fn(mean2d, conic, alpha, feats)
            return jnp.sum(img ** 2) + jnp.sum(T)
        return f

    g_p = jax.grad(loss(pallas_fn), argnums=(0, 1, 2, 3))(*args)
    g_d = jax.grad(loss(dense_fn), argnums=(0, 1, 2, 3))(*args)
    for name, a, b in zip(["mean2d", "conic", "alpha", "feats"], g_p, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4, err_msg=name)


def test_pallas_matches_xla_backend():
    args, pallas_fn, _, bins = setup(n=100, radius=6.0, seed=11)
    mean2d, conic, alpha, feats = args
    topleft = (-1.0, -1.0)
    psz = (1.0 / FX, 1.0 / FX)
    img_x, T_x = rasterize_tiles(mean2d, conic, alpha, feats, bins,
                                 topleft, psz, w=RES, h=RES, tile_size=TILE,
                                 chunk=CHUNK)
    img_p, T_p = pallas_fn(*args)
    np.testing.assert_allclose(np.asarray(T_p), np.asarray(T_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                               rtol=1e-4, atol=1e-5)


def test_pack_seg_vjp_matches_autodiff_scatter():
    """The sort+segment-scan pack backward (used when gid_cum is given)
    must match the gather's autodiff transpose for pipeline-shaped
    cotangents (invalid rows carry signal only on the alpha row — the
    kernel's other channels are analytically zero there because the
    packed alpha is zero)."""
    from gsgen_tpu.ops.pallas_raster import pack_dup

    N, CAP = 500, 2048
    mean2d = jax.random.normal(jax.random.PRNGKey(0), (N, 2))
    conic = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
    alpha = jax.random.uniform(jax.random.PRNGKey(2), (N,))
    feats = jax.random.normal(jax.random.PRNGKey(3), (N, 5))
    gid = jax.random.randint(jax.random.PRNGKey(4), (CAP,), 0, N)
    valid = jax.random.uniform(jax.random.PRNGKey(5), (CAP,)) < 0.7
    cnt = jnp.zeros((N,), jnp.int32).at[
        jnp.where(valid, gid, N)].add(1, mode="drop")
    gid_cum = jnp.cumsum(cnt)
    cot = jax.random.normal(jax.random.PRNGKey(6), (16, CAP))
    cot = cot * valid[None, :].astype(jnp.float32)
    cot = cot.at[5].set(jax.random.normal(jax.random.PRNGKey(7), (CAP,)))

    def loss(m2, cn, al, ft, use_seg):
        return jnp.sum(pack_dup(m2, cn, al, ft, gid, valid, CAP,
                                gid_cum=gid_cum if use_seg else None) * cot)

    f0 = loss(mean2d, conic, alpha, feats, False)
    f1 = loss(mean2d, conic, alpha, feats, True)
    assert float(jnp.abs(f0 - f1)) == 0.0
    g0 = jax.grad(loss, argnums=(0, 1, 2, 3))(mean2d, conic, alpha, feats,
                                              False)
    g1 = jax.grad(loss, argnums=(0, 1, 2, 3))(mean2d, conic, alpha, feats,
                                              True)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def _setup_layout(layout, seed=0, n=96):
    key = jax.random.PRNGKey(seed)
    mean2d, cov2d, alpha, feats, depth = make_scene(key, n)
    conic = conic_of(cov2d)
    active = jnp.ones((n,), bool)
    fx = fy = FX
    cx = cy = RES / 2.0
    bins = bin_gaussians(mean2d, cov2d, depth, active, fx, fy, cx, cy,
                         RES, RES, TILE, 1024, chunk=CHUNK, layout=layout)
    topleft = (-cx / fx, -cy / fy)
    psz = (1.0 / fx, 1.0 / fy)
    interp = jax.default_backend() == "cpu"

    def fn(mean2d, conic, alpha, feats):
        img, T = rasterize_tiles_pallas(
            mean2d, conic, alpha, feats, bins, topleft, psz,
            w=RES, h=RES, tile_size=TILE, chunk=CHUNK, interpret=interp)
        return img, T
    return (mean2d, conic, alpha, feats), fn


def test_compact_layout_matches_padded():
    """The padding-free compact layout (round 3: kernels walk K-aligned
    windows of the sorted table, boundary lanes masked, backward merges
    shared windows by output-block revisiting) must reproduce the padded
    layout bit-for-bit — forward AND gradients."""
    args, fn_pad = _setup_layout("padded")
    _, fn_cmp = _setup_layout("compact")

    img_p, T_p = jax.jit(fn_pad)(*args)
    img_c, T_c = jax.jit(fn_cmp)(*args)
    np.testing.assert_allclose(np.asarray(img_c), np.asarray(img_p),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(T_c), np.asarray(T_p),
                               rtol=1e-6, atol=1e-7)

    cot = jax.random.uniform(jax.random.PRNGKey(7), img_p.shape)
    cotT = jax.random.uniform(jax.random.PRNGKey(8), T_p.shape)

    def loss(fn, *a):
        img, T = fn(*a)
        return jnp.sum(img * cot) + jnp.sum(T * cotT)

    g_p = jax.jit(jax.grad(lambda *a: loss(fn_pad, *a), argnums=(0, 1, 2, 3)))(*args)
    g_c = jax.jit(jax.grad(lambda *a: loss(fn_cmp, *a), argnums=(0, 1, 2, 3)))(*args)
    # boundary windows regroup fp32 accumulation -> reassociation noise
    for a, b in zip(g_p, g_c):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=2e-5)


def test_compact_layout_early_exit():
    """Saturated scene: the forward early exit truncates the backward
    walk identically in both layouts."""
    args, fn_pad = _setup_layout("padded", seed=3)
    _, fn_cmp = _setup_layout("compact", seed=3)
    m2, cn, al, ft = args
    al = jnp.full_like(al, 4.0)      # sigmoid-ish saturation: big alphas
    img_p, T_p = jax.jit(fn_pad)(m2, cn, al, ft)
    img_c, T_c = jax.jit(fn_cmp)(m2, cn, al, ft)
    np.testing.assert_allclose(np.asarray(img_c), np.asarray(img_p),
                               rtol=1e-6, atol=1e-7)
    g_p = jax.jit(jax.grad(lambda a: jnp.sum(jax.jit(fn_pad)(m2, cn, a, ft)[0])))(al)
    g_c = jax.jit(jax.grad(lambda a: jnp.sum(jax.jit(fn_cmp)(m2, cn, a, ft)[0])))(al)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_p),
                               rtol=1e-5, atol=1e-6)
