"""Distribution: tile-sharded rendering on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsgen_tpu.models.init import InitConfig, initialize
from gsgen_tpu.models.scene import RenderConfig, render_view
from gsgen_tpu.ops.camera import CameraIntrinsics
from gsgen_tpu.parallel.mesh import make_mesh
from gsgen_tpu.parallel.sharded_render import render_view_tile_sharded

RCFG = RenderConfig(dup_cap=8192, chunk=64, tile_size=8, backend="xla")
INTR = CameraIntrinsics.from_reso(64)
C2W = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.5]], jnp.float32)


@pytest.fixture(scope="module")
def scene():
    return initialize(jax.random.PRNGKey(0),
                      InitConfig(num_points=300, svec_val=0.04, mean_std=0.4),
                      RCFG)


def test_tile_sharded_matches_single(scene):
    if jax.device_count() < 4:
        pytest.skip("needs multi-device mesh")
    mesh = make_mesh(4, axes=("tile",))
    bg = jnp.ones((3,))
    ref = render_view(scene.params, scene.active, C2W, INTR, RCFG, bg)
    out = jax.jit(lambda p, a: render_view_tile_sharded(
        p, a, C2W, INTR, RCFG, bg, mesh))(scene.params, scene.active)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ref["rgb"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["T"]), np.asarray(ref["T"]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), rtol=1e-4, atol=1e-5)


def test_tile_sharded_gradients_psum(scene):
    if jax.device_count() < 4:
        pytest.skip("needs multi-device mesh")
    mesh = make_mesh(4, axes=("tile",))
    bg = jnp.ones((3,))

    def loss_sharded(params):
        out = render_view_tile_sharded(params, scene.active, C2W, INTR, RCFG,
                                       bg, mesh, rgb_only=True)
        return jnp.mean(out["rgb"] ** 2)

    def loss_single(params):
        out = render_view(params, scene.active, C2W, INTR, RCFG, bg,
                          rgb_only=True)
        return jnp.mean(out["rgb"] ** 2)

    g_s = jax.jit(jax.grad(loss_sharded))(scene.params)
    g_r = jax.jit(jax.grad(loss_single))(scene.params)
    # replicated-input transpose = psum over slabs: per-Gaussian grads
    # must equal the single-device render's grads
    for name in ["mean", "qvec", "svec", "color", "alpha"]:
        np.testing.assert_allclose(
            np.asarray(getattr(g_s, name)), np.asarray(getattr(g_r, name)),
            rtol=5e-3, atol=1e-5, err_msg=name)


def test_dp_mesh_batch_sharding(scene):
    if jax.device_count() < 2:
        pytest.skip("needs multi-device mesh")
    from gsgen_tpu.parallel.mesh import shard_batch, replicate
    mesh = make_mesh(2, axes=("data",))
    batch = {"x": jnp.arange(8.0).reshape(2, 4)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    rep = replicate({"y": jnp.ones(3)}, mesh)
    assert rep["y"].sharding.spec == jax.sharding.PartitionSpec()


def test_trainer_with_tile_mesh(scene):
    """Full training step with per-view tile-sharded rendering."""
    if jax.device_count() < 4:
        pytest.skip("needs multi-device mesh")
    from gsgen_tpu.data.cameras import CameraSamplerConfig
    from gsgen_tpu.guidance.mock import MockGuidance
    from gsgen_tpu.models.background import BackgroundConfig
    from gsgen_tpu.models.density import DensifyConfig, PruneConfig
    from gsgen_tpu.models.init import InitConfig
    from gsgen_tpu.training.trainer import Trainer, TrainerConfig

    mesh = make_mesh(4, axes=("tile",))

    def build(tile_mesh):
        return Trainer(
            cfg=TrainerConfig(max_steps=10, batch_size=2, seed=3,
                              auto_dup_bucket=False, eval_image_period=0,
                              eval_video_period=0, save_period=0),
            rcfg=RCFG,
            init_cfg=InitConfig(num_points=64, capacity=64, svec_val=0.05,
                                mean_std=0.4),
            bg_cfg=BackgroundConfig(type="fixed"),
            data_cfg=CameraSamplerConfig(batch_size=2, max_steps=10,
                                         reso=(64,)),
            guidance=MockGuidance(),
            dcfg=DensifyConfig(enabled=False), pcfg=PruneConfig(enabled=False),
            tile_mesh=tile_mesh)

    t_sharded = build(mesh)
    t_single = build(None)
    m_s = t_sharded.train_step(0)
    m_r = t_single.train_step(0)
    # identical data (same seed) -> identical loss and updated params
    np.testing.assert_allclose(float(m_s["loss_total"]),
                               float(m_r["loss_total"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(t_sharded.state.scene.params.mean),
        np.asarray(t_single.state.scene.params.mean), atol=1e-5)
