"""On-chip ablation of the Pallas forward kernel body (round 4).

Times the REAL fwd kernel against hacked variants on the bench scene to
attribute the 2.3 ms: exact lane-scan vs MXU cumprod vs no cumprod
(wrong results, cost bound only) vs no exp (wrong, bound only).
"""

import time

import jax
import jax.numpy as jnp

from gsgen_tpu.models.init import InitConfig, initialize
from gsgen_tpu.models.scene import RenderConfig
from gsgen_tpu.ops import pallas_raster as pr
from gsgen_tpu.ops.binning import bin_gaussians
from gsgen_tpu.ops.camera import CameraIntrinsics
from gsgen_tpu.ops.projection import (conic_from_cov2d, frustum_cull_mask,
                                      project_gaussians)
from gsgen_tpu.utils.activations import act

N, RESO, CAP, CHUNK, ITERS = 100_000, 512, 1 << 18, 128, 50


def time_chain(fn, *args, iters=ITERS):
    @jax.jit
    def many(*a):
        def step(i, c):
            r = fn(*[x + c * 1e-30 if isinstance(x, jax.Array)
                     and jnp.issubdtype(x.dtype, jnp.floating) else x
                     for x in a])
            leaves = [l for l in jax.tree_util.tree_leaves(r)
                      if jnp.issubdtype(l.dtype, jnp.floating)]
            return c + sum(jnp.sum(l) for l in leaves) * 1e-30
        return jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))
    jax.block_until_ready(many(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(many(*args))
    return (time.perf_counter() - t0) / iters


def main():
    rcfg = RenderConfig(dup_cap=CAP, chunk=CHUNK)
    intr = CameraIntrinsics.from_reso(RESO)
    state = jax.block_until_ready(jax.jit(lambda k: initialize(
        k, InitConfig(num_points=N, svec_val=0.01, mean_std=0.6),
        rcfg))(jax.random.PRNGKey(0)))
    p = state.params
    c2w = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.5]],
                    jnp.float32)

    @jax.jit
    def stage_in(params):
        proj = project_gaussians(params.mean, params.qvec,
                                 act(rcfg.svec_act)(params.svec), c2w)
        conic, _ = conic_from_cov2d(proj.cov2d)
        cull = frustum_cull_mask(params.mean,
                                 act(rcfg.svec_act)(params.svec), c2w,
                                 intr) & proj.in_front & state.active
        alpha = act(rcfg.alpha_act)(params.alpha)
        color = act(rcfg.color_act)(params.color)
        feats = jnp.concatenate([
            color, proj.depth[:, None], jnp.ones_like(alpha)[:, None],
            (proj.depth ** 2)[:, None]], axis=1)
        return (proj.mean2d, conic, proj.depth, cull, alpha, feats,
                proj.cov2d)

    mean2d, conic, depth, cullm, alpha, feats, cov2d = stage_in(p)
    F = feats.shape[1]

    bins = jax.block_until_ready(jax.jit(lambda m2, dp: bin_gaussians(
        m2, cov2d, dp, cullm, intr.fx, intr.fy, intr.cx, intr.cy,
        RESO, RESO, 16, cap=CAP, chunk=CHUNK, alpha=alpha))(mean2d, depth))
    cap_padded = bins.padded_gid.shape[0]
    print("duplicates:", int(bins.total), "padded:", int(bins.padded_total))

    dup = jax.block_until_ready(jax.jit(
        lambda m2, cn, al, fe: pr.pack_dup(
            m2, cn, al, fe, bins.padded_gid, bins.row_valid, cap_padded,
            gid_cum=bins.gid_cum))(mean2d, conic, alpha, feats))

    n_tiles_w = RESO // 16
    n_tiles = n_tiles_w * n_tiles_w
    geom = jnp.stack([jnp.float32(intr.image_topleft[0]),
                      jnp.float32(intr.image_topleft[1]),
                      jnp.float32(intr.pixel_size[0]),
                      jnp.float32(intr.pixel_size[1])])
    counts = bins.ends - bins.starts
    nchunks = ((counts + CHUNK - 1) // CHUNK).astype(jnp.int32)
    ct = bins.chunk_tile.astype(jnp.int32)
    st = bins.starts.astype(jnp.int32)
    en = bins.ends.astype(jnp.int32)

    def run(core):
        return time_chain(lambda d: core(d, ct, st, en, nchunks, geom), dup)

    core_exact = pr._make_core(n_tiles, n_tiles_w, 16, CHUNK, F, cap_padded,
                               1e-4, False)
    print(f"fwd exact scan:   {run(core_exact)*1e3:.3f} ms")
    core_fast = pr._make_core(n_tiles, n_tiles_w, 16, CHUNK, F, cap_padded,
                              1e-4, False, fast_fwd_cumprod=True)
    print(f"fwd MXU cumprod:  {run(core_fast)*1e3:.3f} ms")

    # hacked bodies: monkeypatch the cumprod/exp for cost bounds
    orig_cumprod = pr._excl_cumprod_lanes
    pr._excl_cumprod_lanes = lambda x: x          # WRONG, cost bound
    pr._make_core.cache_clear()
    core_noscan = pr._make_core(n_tiles, n_tiles_w, 16, CHUNK, F,
                                cap_padded, 1e-4, False)
    print(f"fwd NO cumprod:   {run(core_noscan)*1e3:.3f} ms (wrong)")
    pr._excl_cumprod_lanes = orig_cumprod
    pr._make_core.cache_clear()

    # no-exp bound: replace exp with a multiply
    import gsgen_tpu.ops.pallas_raster as prm
    orig_cw = prm._chunk_weights

    def cw_noexp(d, pixx, pixy, T_col, T_thresh, mxu_scans=False,
                 lane_valid=None):
        mx, my = d[0:1, :], d[1:2, :]
        ca, cb, cc = d[2:3, :], d[3:4, :], d[4:5, :]
        al = d[5:6, :]
        dx = pixx - mx
        dy = pixy - my
        radial = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
        radial = jnp.maximum(radial, 0.0)
        G = 1.0 - 0.37 * radial                      # WRONG, cost bound
        from gsgen_tpu.ops.oracle import ALPHA_CLAMP, MIN_RENDER_ALPHA
        a_cl = jnp.minimum(al, ALPHA_CLAMP)
        aG = a_cl * G
        aG = jnp.where(aG < MIN_RENDER_ALPHA, 0.0, aG)
        if lane_valid is not None:
            aG = jnp.where(lane_valid, aG, 0.0)
        om = 1.0 - aG
        cp_excl = prm._excl_cumprod_lanes(om)
        T_run = T_col * cp_excl
        processed = T_run >= T_thresh
        w = jnp.where(processed, aG * T_run, 0.0)
        return dx, dy, radial, G, a_cl, aG, om, cp_excl, T_run, processed, w

    prm._chunk_weights = cw_noexp
    pr._make_core.cache_clear()
    core_noexp = pr._make_core(n_tiles, n_tiles_w, 16, CHUNK, F,
                               cap_padded, 1e-4, False)
    print(f"fwd NO exp:       {run(core_noexp)*1e3:.3f} ms (wrong)")
    prm._chunk_weights = orig_cw
    pr._make_core.cache_clear()


if __name__ == "__main__":
    main()
