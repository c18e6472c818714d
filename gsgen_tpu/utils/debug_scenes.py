"""Deterministic hand-constructed scenes for visual/numeric debugging.

Port of utils/debug.py:5-40 + the MockRenderer layouts of gs/debug.py
(48-128) in gsgen3d/gsgen — the reference's manual test harness, here
doubling as fixtures for golden-image tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.scene import RenderConfig, SceneState, make_scene


def debug_scene(flag: str, rcfg: RenderConfig,
                key=None, n_points: int = 128,
                bounds: float = 0.5) -> SceneState:
    if flag == "one":
        mean = jnp.array([[0.0, 0.0, 0.0]])
        svec = jnp.array([[0.1, 0.1, 0.2]])
        qvec = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        color = jnp.array([[0.01, 0.01, 0.99]])
        alpha = jnp.array([0.8])
    elif flag == "two":
        mean = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.4, 0.0]])
        svec = jnp.full((2, 3), 0.1)
        qvec = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1))
        color = jnp.tile(jnp.array([[0.01, 0.01, 0.99]]), (2, 1))
        alpha = jnp.array([0.8, 0.8])
    elif flag == "paper":
        mean = jnp.array([[0.0, -0.3, 0.2], [0.0, 0.3, -0.1]])
        svec = jnp.array([[0.1, 0.2, 0.1], [0.1, 0.1, 0.2]])
        qvec = jnp.array([[1.0, 1.0, 0.0, 1.0], [1.0, 0.0, 1.0, 0.0]])
        color = jnp.array([[0.0, 0.0, 0.9], [0.0, 0.0, 0.9]])
        alpha = jnp.array([0.9, 0.9])
    elif flag == "grid":
        # gs/debug.py grid layout: a regular lattice of small gaussians
        side = max(int(round(n_points ** (1 / 3))), 2)
        g = (jnp.arange(side) / (side - 1) - 0.5) * 2 * bounds
        gx, gy, gz = jnp.meshgrid(g, g, g, indexing="ij")
        mean = jnp.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], 1)
        n = mean.shape[0]
        svec = jnp.full((n, 3), bounds / side * 0.5)
        qvec = jnp.zeros((n, 4)).at[:, 0].set(1.0)
        color = (mean / (2 * bounds) + 0.5)
        alpha = jnp.full((n,), 0.8)
    elif flag == "pressure":
        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, 5)
        mean = jax.random.normal(ks[0], (n_points, 3)) * bounds
        svec = jax.random.uniform(ks[1], (n_points, 3)) * 0.05
        qvec = jax.random.uniform(ks[2], (n_points, 4))
        color = jax.random.uniform(ks[3], (n_points, 3))
        alpha = jax.random.uniform(ks[4], (n_points,))
    else:
        raise NotImplementedError(flag)
    return make_scene(mean, qvec, svec, color, alpha, rcfg)
