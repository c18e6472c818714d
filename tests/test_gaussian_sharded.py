"""Gaussian-sharded renderer: params sharded over the mesh axis, slab
per device; must match the replicated single-device render exactly and
deliver reduce-scattered per-Gaussian gradients (SURVEY §2.6 north
star — no reference equivalent, gsgen is single-GPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gsgen_tpu.models.init import InitConfig, initialize
from gsgen_tpu.models.scene import RenderConfig, render_view
from gsgen_tpu.ops.camera import CameraIntrinsics
from gsgen_tpu.parallel.gaussian_sharded import (
    render_view_gaussian_sharded, shard_scene)

RCFG = RenderConfig(dup_cap=4096, chunk=32, backend="xla")
C2W = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.5]], jnp.float32)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]).reshape(8), ("gauss",))


@pytest.fixture(scope="module")
def scene():
    # capacity divisible by 8
    return initialize(jax.random.PRNGKey(0),
                      InitConfig(num_points=256, capacity=512,
                                 svec_val=0.05, mean_std=0.5), RCFG)


def test_matches_replicated_render(mesh, scene):
    intr = CameraIntrinsics.from_reso(128)
    bg = jnp.ones((3,), jnp.float32)
    want = render_view(scene.params, scene.active, C2W, intr, RCFG, bg)

    st = shard_scene(scene, mesh)
    got = jax.jit(lambda p, a: render_view_gaussian_sharded(
        p, a, C2W, intr, RCFG, bg, mesh))(st.params, st.active)

    # same math, different XLA fusion schedule -> agree to ~1 ulp
    tight = dict(rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(want["rgb"]), **tight)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(want["depth"]), **tight)
    np.testing.assert_allclose(np.asarray(got["T"]),
                               np.asarray(want["T"]), **tight)
    np.testing.assert_allclose(np.asarray(got["radii2d"]),
                               np.asarray(want["radii2d"]), **tight)
    np.testing.assert_array_equal(np.asarray(got["visible"]),
                                  np.asarray(want["visible"]))


def test_gradients_reduce_scatter(mesh, scene):
    """Grads through the sharded render == grads through the replicated
    render; they arrive SHARDED like the params (the all-gather
    transpose is a psum_scatter over the slabs)."""
    intr = CameraIntrinsics.from_reso(128)
    bg = jnp.ones((3,), jnp.float32)

    def loss_rep(params):
        out = render_view(params, scene.active, C2W, intr, RCFG, bg)
        return jnp.mean(out["rgb"] ** 2) + jnp.mean(out["T"])

    want = jax.grad(loss_rep)(scene.params)

    st = shard_scene(scene, mesh)

    def loss_sh(params, active):
        out = render_view_gaussian_sharded(params, active, C2W, intr,
                                           RCFG, bg, mesh)
        return jnp.mean(out["rgb"] ** 2) + jnp.mean(out["T"])

    got = jax.jit(jax.grad(loss_sh))(st.params, st.active)
    for name in ("mean", "qvec", "svec", "color", "alpha"):
        a = np.asarray(getattr(want, name))
        b = np.asarray(getattr(got, name))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7,
                                   err_msg=name)
    # grads really are sharded like the params
    assert got.mean.sharding.spec == P("gauss")


def test_composes_with_densify(mesh, scene):
    """Shard-local densify: run the functional densify on each shard via
    shard_map — slot allocation needs no cross-shard communication."""
    from gsgen_tpu.models.density import DensifyConfig, densify
    from gsgen_tpu.training.optimizer import adam_init
    from jax.experimental.shard_map import shard_map

    # interleave active/free slots so each shard has local free capacity
    # (initialize() packs active rows first; a contiguous shard split
    # would give shards 0-3 no free slots — a real operational concern,
    # handled by interleaved placement at shard time)
    order = jnp.asarray(np.arange(512).reshape(2, 256).T.ravel())
    perm = jax.tree_util.tree_map(
        lambda x: x[order] if getattr(x, "ndim", 0) >= 1 else x,
        scene._replace(grad_accum=jnp.ones(512) * 10.0,
                       grad_cnt=jnp.ones(512)))
    st = shard_scene(perm, mesh)
    opt = adam_init(st.params)
    cfg = DensifyConfig(mean2d_thresh=0.01, split_thresh=0.01,
                        use_legacy=True)

    def body(state, opt):
        s2, o2, info = densify(state, opt, cfg, RCFG, jax.random.PRNGKey(1))
        return s2, info["num_split"][None]

    def spec_tree(tree):
        return jax.tree_util.tree_map(
            lambda x: P("gauss") if getattr(x, "ndim", 0) >= 1 else P(),
            tree)

    s2, nsplit = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(spec_tree(st), spec_tree(opt)),
        out_specs=(spec_tree(st), P("gauss")), check_rep=False))(st, opt)
    assert int(jnp.sum(nsplit)) > 0
    assert int(jnp.sum(s2.active)) > int(jnp.sum(scene.active))
