"""Scene model, activations, backgrounds, SH basis, point ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsgen_tpu.models.background import (BackgroundConfig, apply_background,
                                         init_background)
from gsgen_tpu.models.init import InitConfig, initialize
from gsgen_tpu.models.scene import (RenderConfig, activate, make_scene,
                                    num_active, render_view)
from gsgen_tpu.ops.camera import CameraIntrinsics, get_rays_d
from gsgen_tpu.ops.sh import eval_sh_basis
from gsgen_tpu.utils.activations import ACTIVATIONS, INV_ACTIVATIONS
from gsgen_tpu.utils.ops import (farthest_point_sampling, knn_self,
                                 mean_knn_sqdist)

RCFG = RenderConfig(dup_cap=8192, chunk=64)
INTR = CameraIntrinsics.from_reso(32)
C2W = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.5]], jnp.float32)


def test_activation_inverses():
    x = jnp.array([0.05, 0.3, 0.9])
    for name in ["sigmoid", "exp", "abs", "nothing", "softplus"]:
        y = ACTIVATIONS[name](INV_ACTIVATIONS[name](x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-4)


def test_make_scene_roundtrip():
    n, m = 16, 32
    key = jax.random.PRNGKey(0)
    svec = jnp.full((n, 3), 0.05)
    color = jax.random.uniform(key, (n, 3), minval=0.1, maxval=0.9)
    alpha = jnp.full((n,), 0.8)
    state = make_scene(jnp.zeros((n, 3)), jnp.zeros((n, 4)).at[:, 0].set(1.0),
                       svec, color, alpha, RCFG, capacity=m)
    assert int(num_active(state)) == n
    _, _, svec2, color2, alpha2 = activate(state.params, RCFG)
    np.testing.assert_allclose(np.asarray(svec2[:n]), np.asarray(svec), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(color2[:n]), np.asarray(color), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(alpha2[:n]), np.asarray(alpha), rtol=1e-4)


@pytest.mark.parametrize("init_type", ["base", "unisphere", "semisphere", "box"])
def test_initializers(init_type):
    state = initialize(jax.random.PRNGKey(1),
                       InitConfig(type=init_type, num_points=64, mean_std=0.5),
                       RCFG)
    m = np.asarray(state.params.mean)
    assert np.isfinite(m).all()
    if init_type in ("unisphere", "semisphere"):
        np.testing.assert_allclose(np.linalg.norm(m, axis=1), 0.5, rtol=1e-4)


def test_render_view_channels():
    state = initialize(jax.random.PRNGKey(2),
                       InitConfig(num_points=128, svec_val=0.05, mean_std=0.3),
                       RCFG)
    out = render_view(state.params, state.active, C2W, INTR, RCFG,
                      jnp.ones((3,)))
    assert out["rgb"].shape == (32, 32, 3)
    o = np.asarray(out["opacity"])
    T = np.asarray(out["T"])
    np.testing.assert_allclose(o, 1.0 - T, atol=1e-5)
    d = np.asarray(out["depth"])
    # composited depth is bounded by opacity * max scene depth
    assert (d >= 0).all() and np.isfinite(np.asarray(out["z_var"])).all()


def test_backgrounds():
    key = jax.random.PRNGKey(0)
    dirs = get_rays_d(C2W, INTR)
    for t in ["random", "fixed", "learned_const", "mlp"]:
        cfg = BackgroundConfig(type=t)
        p = init_background(key, cfg)
        bg = apply_background(p, cfg, dirs, key, training=True)
        assert bg.shape in ((3,), (32, 32, 3))
        assert bool(jnp.isfinite(bg).all())
    # eval-mode random bg is black (gs/backgrounds.py:61-63)
    cfg = BackgroundConfig(type="random")
    bg = apply_background({}, cfg, dirs, key, training=False)
    np.testing.assert_allclose(np.asarray(bg), 0.0)


def test_sh_basis_orthonormality():
    # Monte-Carlo: int Y_i Y_j dOmega ~ delta_ij
    key = jax.random.PRNGKey(3)
    v = jax.random.normal(key, (200_000, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    Y = eval_sh_basis(v, 4)                       # 16 funcs
    gram = (Y.T @ Y) / v.shape[0] * (4 * np.pi)
    np.testing.assert_allclose(np.asarray(gram), np.eye(16), atol=0.15)


def test_knn_and_fps():
    pts = jnp.array([[0., 0, 0], [1, 0, 0], [0, 1, 0], [10, 10, 10]])
    d, i = knn_self(pts, 1)
    assert i[0, 0] in (1, 2) and i[3, 0] in (0, 1, 2)
    np.testing.assert_allclose(np.asarray(d[0, 0]), 1.0, rtol=1e-5)
    md = mean_knn_sqdist(pts, k=2)
    np.testing.assert_allclose(np.asarray(md[0]), 1.0, rtol=1e-5)
    idx = farthest_point_sampling(pts, 2)
    assert int(idx[1]) == 3  # farthest from point 0


def test_masked_knn_excludes_inactive():
    pts = jnp.array([[0., 0, 0], [0.1, 0, 0], [5, 0, 0]])
    mask = jnp.array([True, False, True])
    _, i = knn_self(pts, 1, mask=mask)
    assert int(i[0, 0]) == 2  # nearest active, not the masked neighbor
