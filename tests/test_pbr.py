"""PBR fields: specular/normal, shading, penalties, densify carry-through
(reference gs/gaussian_splatting.py:159-204,1015-1121, utils/ops.py:62-72,
188-195)."""

import numpy as np
import jax
import jax.numpy as jnp

from gsgen_tpu.models.init import InitConfig, initialize
from gsgen_tpu.models.scene import (RenderConfig, make_scene, render_batch,
                                    scene_normals, shaded_color)
from gsgen_tpu.ops.camera import CameraIntrinsics
from gsgen_tpu.utils.ops import estimate_pointcloud_normals

PBR_CFG = RenderConfig(dup_cap=4096, chunk=64, pbr=True,
                       normal_type="learned", normal_neighborhood=8)


def _sphere_scene(cfg, n=256, capacity=None):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(n, 3))
    mean = v / np.linalg.norm(v, axis=1, keepdims=True)
    return make_scene(jnp.asarray(mean, jnp.float32),
                      jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1)),
                      jnp.full((n, 3), 0.05), jnp.full((n, 3), 0.5),
                      jnp.full((n,), 0.8), cfg, capacity=capacity or n)


def test_estimate_normals_sphere():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(512, 3))
    pts = jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True),
                      jnp.float32)
    n = estimate_pointcloud_normals(pts, k=8)
    # unit sphere: normals are radial; orientation points outward
    dots = jnp.sum(n * pts, axis=-1)
    assert float(jnp.mean(jnp.abs(dots))) > 0.95
    assert float(jnp.mean(dots)) > 0.9          # disambiguation worked
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(n, axis=-1)), 1.0,
                               atol=1e-5)


def test_pbr_scene_fields():
    st = _sphere_scene(PBR_CFG)
    assert st.params.specular is not None and st.params.normal is not None
    spec = jax.nn.sigmoid(st.params.specular)
    # TPU transcendentals: sigmoid(inv_sigmoid(0.05)) is ~1e-6 off on chip
    np.testing.assert_allclose(np.asarray(spec), 0.05, atol=1e-5)
    n = scene_normals(st.params, st.active, PBR_CFG)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(n, axis=-1)), 1.0,
                               atol=1e-5)


def test_shaded_color_properties():
    mean = jnp.zeros((4, 3))
    normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (4, 1))
    spec = jnp.full((4, 3), 0.5)
    light = jnp.asarray([0.0, 0.0, 3.0])
    cam = jnp.asarray([0.0, 0.0, 2.0])
    c = shaded_color(light, jnp.ones(3), normal, spec, mean, cam)
    np.testing.assert_allclose(np.asarray(c), 0.5, atol=1e-5)  # head-on
    # grazing: half-vector orthogonal to normal -> no specular
    light2 = jnp.asarray([3.0, 0.0, 0.0])
    cam2 = jnp.asarray([-3.0, 0.0, 0.0])
    c2 = shaded_color(light2, jnp.ones(3), normal, spec, mean, cam2)
    np.testing.assert_allclose(np.asarray(c2), 0.0, atol=1e-5)


def test_pbr_render_and_grads():
    st = _sphere_scene(PBR_CFG)
    intr = CameraIntrinsics.from_reso(32)
    c2w = jnp.asarray([[[0, 0, -1, 2.5], [1, 0, 0, 0], [0, -1, 0, 0]]],
                      jnp.float32)
    bgs = jnp.zeros((1, 3))
    lp = jnp.asarray([[2.5, 1.0, 1.0]])
    lc = jnp.ones((1, 3))

    def render_sum(params, use_light):
        out = render_batch(params, st.active, c2w, intr, PBR_CFG, bgs,
                           rgb_only=True,
                           light_pos=lp if use_light else None,
                           light_color=lc if use_light else None)
        return jnp.sum(out["rgb"]), out["rgb"]

    (s_lit, img_lit) = render_sum(st.params, True)
    (s_plain, img_plain) = render_sum(st.params, False)
    assert float(jnp.abs(img_lit - img_plain).max()) > 1e-5  # shading acts
    assert float(s_lit) > float(s_plain)   # specular only adds light

    grads = jax.grad(lambda p: render_sum(p, True)[0])(st.params)
    assert float(jnp.abs(grads.specular).max()) > 0.0
    assert float(jnp.abs(grads.normal).max()) > 0.0
    assert bool(jnp.isfinite(grads.specular).all())


def test_estimated_normals_render():
    cfg = RenderConfig(dup_cap=4096, chunk=64, pbr=True,
                       normal_type="estimated", normal_neighborhood=8)
    st = _sphere_scene(cfg)
    assert st.params.normal is None          # estimated: no learned field
    intr = CameraIntrinsics.from_reso(16)
    c2w = jnp.asarray([[[0, 0, -1, 2.5], [1, 0, 0, 0], [0, -1, 0, 0]]],
                      jnp.float32)
    out = render_batch(st.params, st.active, c2w, intr, cfg,
                       jnp.zeros((1, 3)), rgb_only=True,
                       light_pos=jnp.asarray([[2.5, 0, 0]]),
                       light_color=jnp.ones((1, 3)))
    assert bool(jnp.isfinite(out["rgb"]).all())


def test_move_and_specular_penalties():
    from gsgen_tpu.training.losses import move_penalty, specular_penalty
    st = _sphere_scene(PBR_CFG)
    prev = st.params.mean + 0.1
    mp = move_penalty(st.params, st.active, prev)
    np.testing.assert_allclose(float(mp), 0.1 * np.sqrt(3), rtol=1e-4)
    sp = specular_penalty(st.params, st.active)
    np.testing.assert_allclose(float(sp), 0.05, atol=1e-5)


def test_pbr_densify_carries_fields():
    from gsgen_tpu.models.density import DensifyConfig, densify_clone_split
    from gsgen_tpu.training.optimizer import adam_init
    st = _sphere_scene(PBR_CFG, n=64, capacity=256)
    st = st._replace(grad_accum=jnp.full((256,), 1.0),
                     grad_cnt=jnp.full((256,), 1.0))
    opt = adam_init(st.params)
    dcfg = DensifyConfig(mean2d_thresh=1e-6, split_thresh=1e9)
    st2, opt2, info = densify_clone_split(st, opt, dcfg, PBR_CFG,
                                          jax.random.PRNGKey(0), False)
    assert int(info["num_clone"]) > 0
    assert st2.params.specular.shape == (256, 3)
    assert st2.params.normal.shape == (256, 3)
    assert bool(jnp.isfinite(st2.params.specular).all())


def test_pbr_through_trainer():
    """One PBR train step through build_trainer with move+specular
    penalties scheduled."""
    from gsgen_tpu.config import load_config, build_trainer
    cfg = load_config("configs/smoke.yaml", [
        "trainer.max_steps=2", "init.num_points=32", "init.capacity=64",
        "renderer.pbr=true", "renderer.normal_type=learned",
        "renderer.normal_neighborhood=8",
        "trainer.penalty={alpha: {value: 0.0}, move: {value: 0.01}, "
        "specular: {value: 0.01}}",
    ])
    tr = build_trainer(cfg)
    m0 = tr.train_step(0)
    m1 = tr.train_step(1)
    assert np.isfinite(float(m0["loss_total"]))
    assert np.isfinite(float(m1["loss_total"]))
    assert "pen_move" in m1 and "pen_specular" in m1
    # after one optimizer step positions moved, so the move penalty is
    # strictly positive at step 1
    assert float(m1["pen_move"]) > 0.0
