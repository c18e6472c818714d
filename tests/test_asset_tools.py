"""Asset tools: lens (un)distortion, relighting, paper snapshots."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsgen_tpu.tools import (opencv_lens_distortion,
                             opencv_lens_distortion_fisheye,
                             opencv_lens_undistortion,
                             opencv_lens_undistortion_fisheye,
                             relight_colors, relight_frames,
                             take_photos, take_spiral)
from gsgen_tpu.models.init import InitConfig, initialize
from gsgen_tpu.models.scene import RenderConfig

PARAMS_RT = jnp.asarray([-0.08, 0.02, 1e-3, -5e-4, 0.001, 0.0, 0.0, 0.0])
PARAMS_FISH = jnp.asarray([-0.02, 0.01, -0.005, 0.002])


def _grid(n=9, r=0.4):
    u, v = np.meshgrid(np.linspace(-r, r, n), np.linspace(-r, r, n))
    return jnp.asarray(np.stack([u, v], -1).reshape(-1, 2), jnp.float32)


def test_undistort_inverts_distort_radtan():
    uv = _grid()
    d = opencv_lens_distortion(uv, PARAMS_RT)
    assert float(jnp.max(jnp.abs(d - uv))) > 1e-4   # actually distorts
    back = opencv_lens_undistortion(d, PARAMS_RT)
    np.testing.assert_allclose(np.asarray(back), np.asarray(uv), atol=1e-5)


def test_undistort_inverts_distort_fisheye():
    uv = _grid()
    d = opencv_lens_distortion_fisheye(uv, PARAMS_FISH)
    back = opencv_lens_undistortion_fisheye(d, PARAMS_FISH)
    np.testing.assert_allclose(np.asarray(back), np.asarray(uv), atol=1e-5)


def test_undistort_accepts_short_param_vectors():
    uv = _grid(5)
    # 0/1/2/4 trailing params zero-padded to 8 (reference accepts the same)
    for k in (0, 1, 2, 4):
        out = opencv_lens_undistortion(uv, PARAMS_RT[:k])
        assert out.shape == uv.shape
    np.testing.assert_allclose(
        np.asarray(opencv_lens_undistortion(uv, PARAMS_RT[:0])),
        np.asarray(uv), atol=1e-6)          # no params = identity


def test_undistortion_is_differentiable():
    uv = _grid(3)
    g = jax.grad(lambda p: jnp.sum(
        opencv_lens_undistortion(uv, p) ** 2))(PARAMS_RT)
    assert np.all(np.isfinite(np.asarray(g)))


def test_relight_colors_properties():
    n = 32
    key = jax.random.PRNGKey(0)
    mean = jax.random.normal(key, (n, 3))
    normal = mean / jnp.linalg.norm(mean, axis=-1, keepdims=True)
    albedo = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    light = jnp.asarray([3.0, 0.0, 3.0])
    cam = jnp.asarray([0.0, 3.0, 1.0])
    c = relight_colors(mean, normal, albedo, light, jnp.ones(3), cam)
    assert c.shape == (n, 3)
    assert float(jnp.min(c)) >= 0.0
    assert np.all(np.asarray(c) <= np.asarray(albedo) + 1e-6)
    # backface culling via abs: flipping normals changes nothing
    c2 = relight_colors(mean, -normal, albedo, light, jnp.ones(3), cam)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c), atol=1e-6)


@pytest.fixture(scope="module")
def tiny_scene():
    rcfg = RenderConfig(dup_cap=4096, chunk=64, tile_size=8)
    state = initialize(jax.random.PRNGKey(0),
                       InitConfig(num_points=48, svec_val=0.06), rcfg)
    return state, rcfg


def test_relight_frames_shape(tiny_scene):
    state, rcfg = tiny_scene
    frames = relight_frames(state, rcfg, n_frames=2, reso=32)
    assert frames.shape == (2, 32, 32, 3)
    assert np.all((frames >= 0) & (frames <= 1))


def test_take_photos_rgba(tiny_scene):
    state, rcfg = tiny_scene
    shots = take_photos(state, rcfg, reso=32,
                        poses={"front": np.array([1.5, 1.5, 2.0])})
    img = shots["front"]["rgb"]
    assert img.shape == (32, 32, 4)        # alpha = 1 - T appended
    assert shots["front"]["depth"].shape == (32, 32, 4)
    assert np.all((img >= 0) & (img <= 1 + 1e-6))
    with_bg = take_photos(state, rcfg, reso=32, use_bg=True,
                          poses={"front": np.array([1.5, 1.5, 2.0])})
    assert with_bg["front"]["rgb"].shape == (32, 32, 3)


def test_take_spiral_frames(tiny_scene):
    state, rcfg = tiny_scene
    frames = take_spiral(state, rcfg, n_frames=2, reso=32,
                         rng=np.random.default_rng(0))
    assert frames.shape == (2, 32, 64, 3)  # rgb|depth side by side
    assert np.all((frames >= 0) & (frames <= 1 + 1e-6))
