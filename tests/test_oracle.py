"""Tests for the dense reference compositor against closed-form values."""

import jax
import jax.numpy as jnp
import numpy as np

from gsgen_tpu.ops import oracle as O


def make_gaussian(mx=0.0, my=0.0, var=1.0, alpha=0.5, rgb=(1.0, 0.0, 0.0), depth=1.0):
    mean2d = jnp.array([[mx, my]], jnp.float32)
    conic = jnp.array([[1.0 / var, 0.0, 1.0 / var]], jnp.float32)
    a = jnp.array([alpha], jnp.float32)
    feats = jnp.array([list(rgb)], jnp.float32)
    d = jnp.array([depth], jnp.float32)
    return mean2d, conic, a, feats, d


def test_single_gaussian_at_center():
    mean2d, conic, alpha, feats, depth = make_gaussian(alpha=0.5)
    pixels = jnp.array([[0.0, 0.0], [1.0, 0.0], [10.0, 0.0]], jnp.float32)
    out, T = O.composite_dense(mean2d, conic, alpha, feats, depth,
                               jnp.array([True]), pixels)
    # at center: G = 1, w = 0.5
    np.testing.assert_allclose(out[0, 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(T[0], 0.5, atol=1e-6)
    # at distance 1 with var 1: G = exp(-0.5)
    w1 = 0.5 * np.exp(-0.5)
    np.testing.assert_allclose(out[1, 0], w1, atol=1e-6)
    # far away: below 1/255 cutoff -> exactly zero, T untouched
    np.testing.assert_allclose(out[2, 0], 0.0, atol=0)
    np.testing.assert_allclose(T[2], 1.0, atol=0)


def test_two_gaussians_front_to_back():
    m1 = make_gaussian(alpha=0.6, rgb=(1.0, 0.0, 0.0), depth=1.0)
    m2 = make_gaussian(alpha=0.8, rgb=(0.0, 1.0, 0.0), depth=2.0)
    mean2d = jnp.concatenate([m1[0], m2[0]])
    conic = jnp.concatenate([m1[1], m2[1]])
    alpha = jnp.concatenate([m1[2], m2[2]])
    feats = jnp.concatenate([m1[3], m2[3]])
    depth = jnp.concatenate([m1[4], m2[4]])
    pixels = jnp.zeros((1, 2), jnp.float32)
    out, T = O.composite_dense(mean2d, conic, alpha, feats, depth,
                               jnp.array([True, True]), pixels)
    # front (depth 1) first: red 0.6, then green 0.8 * (1 - 0.6)
    np.testing.assert_allclose(out[0], jnp.array([0.6, 0.8 * 0.4, 0.0]), atol=1e-6)
    np.testing.assert_allclose(T[0], 0.4 * 0.2, atol=1e-6)


def test_order_independence_of_input_layout():
    """Compositing must depend on depth, not on array order."""
    key = jax.random.PRNGKey(0)
    n = 32
    mean2d = jax.random.normal(key, (n, 2)) * 0.5
    conic = jnp.tile(jnp.array([[2.0, 0.0, 2.0]]), (n, 1))
    alpha = jax.random.uniform(jax.random.PRNGKey(1), (n,), minval=0.1, maxval=0.9)
    feats = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
    depth = jax.random.uniform(jax.random.PRNGKey(3), (n,), minval=0.5, maxval=5.0)
    active = jnp.ones((n,), bool)
    pixels = O.pixel_grid((-0.5, -0.5), (1 / 8, 1 / 8), 8, 8)

    out1, T1 = O.composite_dense(mean2d, conic, alpha, feats, depth, active, pixels)
    perm = jax.random.permutation(jax.random.PRNGKey(4), n)
    out2, T2 = O.composite_dense(mean2d[perm], conic[perm], alpha[perm],
                                 feats[perm], depth[perm], active[perm], pixels)
    np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(T1, T2, rtol=1e-5, atol=1e-6)


def test_alpha_clamp():
    mean2d, conic, _, feats, depth = make_gaussian()
    alpha = jnp.array([1.0])
    pixels = jnp.zeros((1, 2), jnp.float32)
    out, T = O.composite_dense(mean2d, conic, alpha, feats, depth,
                               jnp.array([True]), pixels)
    np.testing.assert_allclose(out[0, 0], 0.99, atol=1e-6)
    np.testing.assert_allclose(T[0], 0.01, atol=1e-7)


def test_early_exit_freezes_T():
    """Stack enough opaque gaussians that T crosses 1e-4 and freezes."""
    n = 8
    mean2d = jnp.zeros((n, 2))
    conic = jnp.tile(jnp.array([[1.0, 0.0, 1.0]]), (n, 1))
    alpha = jnp.full((n,), 0.95)
    feats = jnp.ones((n, 1))
    depth = jnp.arange(n, dtype=jnp.float32)
    pixels = jnp.zeros((1, 2), jnp.float32)
    out, T = O.composite_dense(mean2d, conic, alpha, feats, depth,
                               jnp.ones((n,), bool), pixels)
    # manual front-to-back with freeze at T < 1e-4
    Tm, acc = 1.0, 0.0
    for _ in range(n):
        if Tm >= 1e-4:
            acc += 0.95 * Tm
            Tm *= 0.05
    np.testing.assert_allclose(out[0, 0], acc, rtol=1e-6)
    np.testing.assert_allclose(T[0], Tm, rtol=1e-6)
    # T froze at the value it had when it crossed (not decayed further)
    assert float(T[0]) >= 1e-4 * 0.05


def test_inactive_excluded():
    m = make_gaussian(alpha=0.7)
    pixels = jnp.zeros((1, 2), jnp.float32)
    out, T = O.composite_dense(m[0], m[1], m[2], m[3], m[4],
                               jnp.array([False]), pixels)
    np.testing.assert_allclose(out, 0.0, atol=0)
    np.testing.assert_allclose(T, 1.0, atol=0)


def test_gradients_flow():
    mean2d, conic, alpha, feats, depth = make_gaussian(mx=0.1, alpha=0.5)
    pixels = jnp.array([[0.0, 0.0]], jnp.float32)

    def loss(mean2d, alpha, feats):
        out, _ = O.composite_dense(mean2d, conic, alpha, feats, depth,
                                   jnp.array([True]), pixels)
        return jnp.sum(out)

    g = jax.grad(loss, argnums=(0, 1, 2))(mean2d, alpha, feats)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    # d loss / d alpha = G * sum(feats) = G (feats = (1, 0, 0))
    G = float(np.exp(-0.5 * (0.1 ** 2)))
    np.testing.assert_allclose(g[1][0], G, rtol=1e-5)
