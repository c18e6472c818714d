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


def test_full_sharded_train_step(mesh, scene):
    """End-to-end exercise of the docstring's memory claim: render ->
    reduce-scattered grads -> Adam update with SHARDED moments ->
    shard-local densify -> second render.  Params, moments and the
    post-densify state all stay P('gauss'); numerics match the same
    sequence run replicated on one logical device."""
    from jax.experimental.shard_map import shard_map

    from gsgen_tpu.models.density import DensifyConfig, densify
    from gsgen_tpu.parallel.gaussian_sharded import (
        gaussian_sharded_train_step)
    from gsgen_tpu.training.optimizer import adam_init, adam_update

    intr = CameraIntrinsics.from_reso(128)
    bg = jnp.ones((3,), jnp.float32)

    # ---- replicated oracle: same loss, same Adam hyperparams ----
    def loss_rep(params):
        out = render_view(params, scene.active, C2W, intr, RCFG, bg)
        return jnp.mean(out["rgb"] ** 2) + jnp.mean(out["T"])

    l_want, g_want = jax.value_and_grad(loss_rep)(scene.params)
    p_want, o_want = adam_update(
        g_want, adam_init(scene.params), scene.params, jnp.float32(1e-2))

    # ---- sharded path ----
    st = shard_scene(scene, mesh)
    opt = shard_scene(adam_init(st.params), mesh)
    step = gaussian_sharded_train_step(mesh, intr, RCFG)
    p2, o2, l_got = step(st.params, st.active, opt, C2W, bg)
    jax.block_until_ready(p2)

    assert float(l_got) == pytest.approx(float(l_want), rel=1e-6)
    for name in ("mean", "qvec", "svec", "color", "alpha"):
        # Adam with eps=1e-15 is ~sign(g): where the true grad is ~0,
        # fp-noise differences between the two schedules flip the step
        # to the other side — compare params only where the grad is
        # meaningful, and bound the step size elsewhere
        gw = np.asarray(getattr(g_want, name))
        a = np.asarray(getattr(p2, name))
        b = np.asarray(getattr(p_want, name))
        sig = np.abs(gw) > 1e-6
        np.testing.assert_allclose(a[sig], b[sig], rtol=1e-4, atol=1e-6,
                                   err_msg=name)
        np.testing.assert_array_less(
            np.abs(a - np.asarray(getattr(scene.params, name))),
            1.01e-2, err_msg=name)          # |step| <= lr everywhere
        # the moments really live sharded — never replicated
        assert getattr(o2.mu, name).sharding.spec == P("gauss"), name
        assert getattr(o2.nu, name).sharding.spec == P("gauss"), name
        np.testing.assert_allclose(
            np.asarray(getattr(o2.mu, name)),
            np.asarray(getattr(o_want.mu, name)), rtol=1e-4, atol=1e-8)
    assert p2.mean.sharding.spec == P("gauss")

    # ---- shard-local densify on the updated state, then render again
    # under the SAME sharded placement ----
    order = jnp.asarray(np.arange(512).reshape(2, 256).T.ravel())
    st_up = scene._replace(params=p2,
                           grad_accum=jnp.ones(512) * 10.0,
                           grad_cnt=jnp.ones(512))
    perm = jax.tree_util.tree_map(
        lambda x: x[order] if getattr(x, "ndim", 0) >= 1 else x, st_up)
    st_d = shard_scene(perm, mesh)
    opt_d = shard_scene(jax.tree_util.tree_map(
        lambda x: x[order] if getattr(x, "ndim", 0) >= 1 else x, o2), mesh)
    dcfg = DensifyConfig(mean2d_thresh=0.01, split_thresh=0.01,
                         use_legacy=True)

    def body(state, opt):
        s2, o3, info = densify(state, opt, dcfg, RCFG, jax.random.PRNGKey(1))
        return s2, o3, info["num_split"][None]

    def spec_tree(tree):
        return jax.tree_util.tree_map(
            lambda x: P("gauss") if getattr(x, "ndim", 0) >= 1 else P(),
            tree)

    s3, o3, nsplit = jax.jit(shard_map(
        body, mesh=mesh, in_specs=(spec_tree(st_d), spec_tree(opt_d)),
        out_specs=(spec_tree(st_d), spec_tree(opt_d), P("gauss")),
        check_rep=False))(st_d, opt_d)
    assert int(jnp.sum(nsplit)) > 0
    assert s3.params.mean.sharding.spec == P("gauss")
    assert o3.mu.mean.sharding.spec == P("gauss")

    # second render from the densified sharded state: finite + matches
    # the same state rendered replicated
    want2 = render_view(jax.device_get(s3.params),
                        np.asarray(s3.active), C2W, intr, RCFG, bg)
    got2 = jax.jit(lambda p, a: render_view_gaussian_sharded(
        p, a, C2W, intr, RCFG, bg, mesh))(s3.params, s3.active)
    np.testing.assert_allclose(np.asarray(got2["rgb"]),
                               np.asarray(want2["rgb"]),
                               rtol=1e-5, atol=1e-6)


def test_gauss_tile_2d_mesh(scene):
    """gauss x tile 2-D composition: params sharded over gauss only,
    image rows over BOTH axes; grads reduce-scatter over gauss + psum
    over tile — parity with the replicated render and grad."""
    from gsgen_tpu.parallel.gaussian_sharded import (
        render_view_gauss_tile_sharded)

    mesh2 = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                 ("gauss", "tile"))
    intr = CameraIntrinsics.from_reso(128)
    bg = jnp.ones((3,), jnp.float32)

    want = render_view(scene.params, scene.active, C2W, intr, RCFG, bg,
                       rgb_only=True)
    sh = jax.sharding.NamedSharding(mesh2, P("gauss"))
    p_sh = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if getattr(x, "ndim", 0) >= 1
        else x, scene.params)
    a_sh = jax.device_put(scene.active, sh)

    got = jax.jit(lambda p, a: render_view_gauss_tile_sharded(
        p, a, C2W, intr, RCFG, bg, mesh2))(p_sh, a_sh)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(want["rgb"]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["T"]),
                               np.asarray(want["T"]),
                               rtol=1e-6, atol=1e-6)

    def loss_rep(params):
        out = render_view(params, scene.active, C2W, intr, RCFG, bg,
                          rgb_only=True)
        return jnp.mean(out["rgb"] ** 2)

    def loss_sh(params, active):
        out = render_view_gauss_tile_sharded(params, active, C2W, intr,
                                             RCFG, bg, mesh2)
        return jnp.mean(out["rgb"] ** 2)

    g_want = jax.grad(loss_rep)(scene.params)
    g_got = jax.jit(jax.grad(loss_sh))(p_sh, a_sh)
    for name in ("mean", "qvec", "svec", "color", "alpha"):
        np.testing.assert_allclose(
            np.asarray(getattr(g_got, name)),
            np.asarray(getattr(g_want, name)), rtol=1e-5, atol=1e-7,
            err_msg=name)
    assert g_got.mean.sharding.spec == P("gauss")


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


def test_sharded_training_run_with_density_events(mesh, scene):
    """VERDICT r4 item 5: a ~20-step training RUN under the
    gaussian-sharded mesh with a densify event, a prune event, and a
    dup-capacity (bucket) growth mid-run — the resharding events are the
    multi-chip design's hardest claim, and steady-state steps alone
    don't prove them.  Parity oracle: the IDENTICAL sequence run
    replicated; with a clones-only densify (split_thresh huge) every
    per-gaussian decision is deterministic, so the post-event scenes
    are the same MULTISET of gaussians and the rendered views must
    match."""
    import dataclasses

    from gsgen_tpu.models.density import (DensifyConfig, PruneConfig,
                                          densify, prune)
    from gsgen_tpu.parallel.gaussian_sharded import (
        gaussian_sharded_train_step, sharded_density_step)
    from gsgen_tpu.training.optimizer import adam_init, adam_update

    intr = CameraIntrinsics.from_reso(128)
    bg = jnp.ones((3,), jnp.float32)
    # clones-only: huge split_thresh, low mean2d_thresh + injected stats
    dcfg = DensifyConfig(enabled=True, mean2d_thresh=1e-4,
                         split_thresh=1e9, use_legacy=False)
    pcfg = PruneConfig(enabled=True, alpha_thresh=0.08, radii2d_thresh=0.0)
    key = jax.random.PRNGKey(5)

    # ---- replicated oracle sequence ----
    def loss_rep(params, active):
        out = render_view(params, active, C2W, intr, RCFG, bg)
        return jnp.mean(out["rgb"] ** 2) + jnp.mean(out["T"])

    @jax.jit
    def rep_step(params, active, opt):
        loss, g = jax.value_and_grad(loss_rep)(params, active)
        lrs = jax.tree_util.tree_map(lambda _: jnp.float32(1e-2), params)
        p2, o2 = adam_update(g, opt, params, lrs)
        return p2, o2, loss

    st_rep = scene
    opt_rep = adam_init(st_rep.params)
    losses_rep = []
    for s in range(20):
        p2, opt_rep, l = rep_step(st_rep.params, st_rep.active, opt_rep)
        st_rep = st_rep._replace(params=p2)
        losses_rep.append(float(l))
        if s == 6:   # densify event: inject hot stats (deterministic)
            st_rep = st_rep._replace(
                grad_accum=jnp.ones_like(st_rep.grad_accum) * 10.0,
                grad_cnt=jnp.ones_like(st_rep.grad_cnt))
            st_rep, opt_rep, dinfo_rep = densify(st_rep, opt_rep, dcfg,
                                                 RCFG, key)
        if s == 12:  # prune event
            st_rep, opt_rep, pinfo_rep = prune(
                st_rep, opt_rep, pcfg, RCFG, jnp.float32(0.0),
                jnp.float32(pcfg.alpha_thresh))

    # ---- sharded sequence: same seeds, same events, plus a dup-cap
    # bucket growth at step 15 (recompile onto a larger capacity) ----
    # interleave so every shard holds both active rows and free slots
    # (shard-local densify allocates only from its own free slots)
    from gsgen_tpu.parallel.gaussian_sharded import interleave_shards
    st_sh = shard_scene(interleave_shards(scene, 8), mesh)
    opt_sh = shard_scene(interleave_shards(adam_init(scene.params), 8), mesh)
    step_fn = gaussian_sharded_train_step(mesh, intr, RCFG)
    losses_sh = []
    rcfg_now = RCFG
    for s in range(20):
        p2, opt_sh, l = step_fn(st_sh.params, st_sh.active, opt_sh,
                                C2W, bg)
        st_sh = st_sh._replace(params=p2)
        losses_sh.append(float(l))
        if s == 6:
            st_sh = st_sh._replace(
                grad_accum=jnp.ones_like(st_sh.grad_accum) * 10.0,
                grad_cnt=jnp.ones_like(st_sh.grad_cnt))
            build = sharded_density_step(
                mesh, dataclasses.replace(dcfg), PruneConfig(enabled=False),
                rcfg_now)
            st_sh, opt_sh, dinfo = build(st_sh, opt_sh)(
                st_sh, opt_sh, key, jnp.float32(0.0), jnp.float32(0.0))
            assert st_sh.params.mean.sharding.spec == P("gauss")
            assert opt_sh.mu.mean.sharding.spec == P("gauss")
            # same global clone count as the replicated event
            assert int(dinfo["num_clone"]) == int(dinfo_rep["num_clone"])
            assert int(dinfo["num_clone"]) > 0
        if s == 12:
            build = sharded_density_step(
                mesh, DensifyConfig(enabled=False), pcfg, rcfg_now)
            st_sh, opt_sh, pinfo = build(st_sh, opt_sh)(
                st_sh, opt_sh, key, jnp.float32(0.0),
                jnp.float32(pcfg.alpha_thresh))
            assert st_sh.params.mean.sharding.spec == P("gauss")
            assert int(pinfo["num_pruned_alpha"]) == \
                int(pinfo_rep["num_pruned_alpha"])
        if s == 15:  # bucket growth: new executable at 2x dup capacity
            rcfg_now = dataclasses.replace(rcfg_now,
                                           dup_cap=RCFG.dup_cap * 2)
            step_fn = gaussian_sharded_train_step(mesh, intr, rcfg_now)

    # loss parity: exact until the first event, tight throughout (the
    # events shuffle slot PLACEMENT, not the multiset of gaussians)
    np.testing.assert_allclose(losses_sh[:7], losses_rep[:7],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(losses_sh, losses_rep, rtol=2e-3, atol=1e-5)

    # final-state render parity: same multiset of gaussians -> same
    # view up to the Adam eps=1e-15 sign-flip drift on ~zero-grad
    # params (the optimizer property the single-step test documents —
    # tiny cross-schedule fp noise flips those steps' signs, drifting a
    # few barely-visible gaussians).  PSNR between the two 20-step
    # trajectories measures exactly that residual (~51 dB measured).
    assert int(np.asarray(jax.device_get(st_sh.active)).sum()) == \
        int(np.asarray(st_rep.active).sum())
    got = jax.jit(lambda p, a: render_view_gaussian_sharded(
        p, a, C2W, intr, rcfg_now, bg, mesh, rgb_only=True))(
        st_sh.params, st_sh.active)
    want = render_view(jax.device_get(st_rep.params),
                       np.asarray(st_rep.active), C2W, intr, RCFG, bg,
                       rgb_only=True)
    mse = float(np.mean((np.asarray(got["rgb"])
                         - np.asarray(want["rgb"])) ** 2))
    assert -10.0 * np.log10(mse + 1e-12) > 40.0, mse


def test_gauss_tile_training_run_with_density_event(scene):
    """The same resharding-event claim on the gauss x tile 2-D mesh:
    steps + a clones-only densify under a (2, 4) mesh, with params and
    moments staying P('gauss') throughout and the final state matching
    the replicated sequence's render."""
    import dataclasses

    from gsgen_tpu.models.density import DensifyConfig, PruneConfig, densify
    from gsgen_tpu.parallel.gaussian_sharded import (
        gauss_tile_train_step, render_view_gauss_tile_sharded,
        sharded_density_step)
    from gsgen_tpu.training.optimizer import adam_init, adam_update

    mesh2 = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                 ("gauss", "tile"))
    intr = CameraIntrinsics.from_reso(128)
    bg = jnp.ones((3,), jnp.float32)
    dcfg = DensifyConfig(enabled=True, mean2d_thresh=1e-4,
                         split_thresh=1e9, use_legacy=False)
    key = jax.random.PRNGKey(9)

    def loss_rep(params, active):
        out = render_view(params, active, C2W, intr, RCFG, bg,
                          rgb_only=True)
        return jnp.mean(out["rgb"] ** 2) + jnp.mean(out["T"])

    @jax.jit
    def rep_step(params, active, opt):
        loss, g = jax.value_and_grad(loss_rep)(params, active)
        lrs = jax.tree_util.tree_map(lambda _: jnp.float32(1e-2), params)
        p2, o2 = adam_update(g, opt, params, lrs)
        return p2, o2, loss

    st_rep, opt_rep = scene, adam_init(scene.params)
    sh = jax.sharding.NamedSharding(mesh2, P("gauss"))
    put = lambda t: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if getattr(x, "ndim", 0) >= 1
        else x, t)
    from gsgen_tpu.parallel.gaussian_sharded import interleave_shards
    st_sh = put(interleave_shards(scene, 2))
    opt_sh = put(interleave_shards(adam_init(scene.params), 2))
    step_fn = gauss_tile_train_step(mesh2, intr, RCFG)
    for s in range(10):
        p_r, opt_rep, l_r = rep_step(st_rep.params, st_rep.active, opt_rep)
        st_rep = st_rep._replace(params=p_r)
        p_s, opt_sh, l_s = step_fn(st_sh.params, st_sh.active, opt_sh,
                                   C2W, bg)
        st_sh = st_sh._replace(params=p_s)
        assert float(l_s) == pytest.approx(float(l_r), rel=2e-3)
        if s == 4:
            hot = lambda st: st._replace(
                grad_accum=jnp.ones_like(st.grad_accum) * 10.0,
                grad_cnt=jnp.ones_like(st.grad_cnt))
            st_rep, opt_rep, di_r = densify(hot(st_rep), opt_rep, dcfg,
                                            RCFG, key)
            build = sharded_density_step(mesh2, dcfg,
                                         PruneConfig(enabled=False), RCFG)
            st_sh, opt_sh, di_s = build(hot(st_sh), opt_sh)(
                hot(st_sh), opt_sh, key, jnp.float32(0.0),
                jnp.float32(0.0))
            assert int(di_s["num_clone"]) == int(di_r["num_clone"]) > 0
            assert st_sh.params.mean.sharding.spec == P("gauss")
            assert opt_sh.mu.mean.sharding.spec == P("gauss")

    got = jax.jit(lambda p, a: render_view_gauss_tile_sharded(
        p, a, C2W, intr, RCFG, bg, mesh2))(st_sh.params, st_sh.active)
    want = render_view(jax.device_get(st_rep.params),
                       np.asarray(st_rep.active), C2W, intr, RCFG, bg,
                       rgb_only=True)
    mse = float(np.mean((np.asarray(got["rgb"])
                         - np.asarray(want["rgb"])) ** 2))
    assert -10.0 * np.log10(mse + 1e-12) > 40.0, mse
