"""Golden behavior on the reference's deterministic debug scenes.

The analytic checks the reference does by eye (gs/debug.py
test_basic_alias/test_aabb etc.) become numeric assertions here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsgen_tpu.models.scene import RenderConfig, render_view
from gsgen_tpu.ops.camera import CameraIntrinsics
from gsgen_tpu.utils.debug_scenes import debug_scene

RCFG = RenderConfig(dup_cap=8192, chunk=64, tile_size=8)
INTR = CameraIntrinsics.from_reso(64)
C2W = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.0]], jnp.float32)


def render(flag, **kw):
    s = debug_scene(flag, RCFG, **kw)
    return render_view(s.params, s.active, C2W, INTR, RCFG, jnp.zeros((3,)))


def test_one_gaussian_center_peak():
    out = render("one")
    rgb = np.asarray(out["rgb"])
    op = np.asarray(out["opacity"])
    # peak opacity at image center; blue-dominant color there
    cy, cx = np.unravel_index(op.argmax(), op.shape)
    assert abs(cy - 32) <= 1 and abs(cx - 32) <= 1
    assert rgb[32, 32, 2] > 5 * rgb[32, 32, 0]
    # alpha value at center ~ alpha (G=1): opacity = 0.8
    np.testing.assert_allclose(op[cy, cx], 0.8, atol=0.02)
    # depth at center ~ camera distance 2.0 times opacity (unnormalized)
    np.testing.assert_allclose(np.asarray(out["depth"])[cy, cx], 0.8 * 2.0,
                               rtol=0.05)


def test_one_gaussian_symmetry():
    op = np.asarray(render("one")["opacity"])
    # isotropic in xy (svec 0.1, 0.1).  The pixel grid has no half-pixel
    # offset (reference vol_render.h:105-107), so the center sits ON
    # pixel 32 — crop to the odd window centered there before flipping.
    sym = op[1:, 1:]
    np.testing.assert_allclose(sym, sym[:, ::-1], atol=5e-2)  # AABB tile cut is integer-quantized
    np.testing.assert_allclose(sym, sym[::-1, :], atol=5e-2)


def test_two_gaussians_offset():
    op = np.asarray(render("two")["opacity"])
    # second gaussian at y=+0.4 (camera y-down -> lower half of image)
    upper = op[:32].sum()
    lower = op[32:].sum()
    assert lower > upper * 1.3


def test_grid_scene_coverage():
    out = render("grid", n_points=27)
    op = np.asarray(out["opacity"])
    assert 0.1 < op.mean() < 0.95
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_pressure_scene_gradients():
    s = debug_scene("pressure", RCFG, key=jax.random.PRNGKey(1), n_points=64)

    def loss(params):
        out = render_view(params, s.active, C2W, INTR, RCFG, jnp.zeros((3,)),
                          rgb_only=True)
        return jnp.mean(out["rgb"] ** 2)

    g = jax.grad(loss)(s.params)
    assert all(bool(jnp.isfinite(x).all())
               for x in jax.tree_util.tree_leaves(g))
