"""Roofline accounting for the render pipeline (BASELINE.json north star).

Measures, on the attached chip (device time via chained dispatch):

1. empirical machine peaks — HBM stream bandwidth and fp32 VPU
   throughput (measured, not quoted, so the SoL denominators match
   *this* chip through *this* runtime),
2. per-stage times on the 100K-Gaussian / 512x512 profiling scene:
   projection+culling, binning, duplicate packing, Pallas fwd kernel,
   Pallas fwd+bwd, and the full gradient step,
3. analytic bytes-moved and FLOPs per kernel, giving each stage's
   percentage of speed-of-light against whichever resource binds it.

Prints a markdown table (paste into BASELINE.md) + one JSON line.

Usage:  python bench_roofline.py            # full pipeline roofline
        BENCH_SAT=1 python bench_roofline.py  # opaque scene (early exit)
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _slope_time(fn, k_lo=8, k_hi=64):
    """Marginal per-iteration device time of ``fn(k) -> scalar array``.

    Two rules learned the hard way on the tunneled (axon) platform:
    (1) ``block_until_ready`` on a large device array returns before the
    computation finishes — only *fetching a scalar value* forces a true
    sync; (2) every dispatch carries a fixed ~35 ms host<->TPU round
    trip.  So: reduce to a scalar, fetch it with float(), and take the
    slope between two trip counts to cancel the fixed latency.  The trip
    count is a TRACED argument — with a static bound XLA unrolls the
    fori_loop and fuses the per-iteration elementwise ops into one HBM
    pass, inflating measured bandwidth ~iters-fold."""
    def timed(k):
        kj = jnp.int32(k)
        float(fn(kj))                        # warm / compile
        t0 = time.perf_counter()
        float(fn(kj))                        # value fetch = real sync
        return time.perf_counter() - t0
    return (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo)


def measure_peaks():
    """Empirical HBM BW (big streaming add) + fp32 VPU throughput
    (high-arithmetic-intensity elementwise iteration).  Each fori_loop
    iteration is one HBM round trip; the quadratic map in the VPU probe
    cannot be algebraically collapsed (unlike an affine chain, which
    XLA folds into a single FMA)."""
    n = 1 << 26                      # 64M floats = 256 MB

    @jax.jit
    def stream_many(x0, k):
        y = jax.lax.fori_loop(0, k, lambda i, y: y + 1.0, x0)
        return jnp.sum(y)

    x = jnp.ones((n,), jnp.float32)
    dt = _slope_time(lambda k: stream_many(x, k))
    hbm_bw = 2 * n * 4 / dt                  # read + write per iter

    deg = 64                                 # quadratic maps per iter
    m = 1 << 24

    @jax.jit
    def poly_many(x0, k):
        def step(i, y):
            for _ in range(deg):
                y = y * y - 0.1              # bounded orbit from y0=0.3
            return y
        y = jax.lax.fori_loop(0, k, step, x0)
        return jnp.sum(y)

    xs = jnp.full((m,), 0.3, jnp.float32)
    dt = _slope_time(lambda k: poly_many(xs, k))
    vpu_flops = deg * 2 * m / dt
    return hbm_bw, vpu_flops


def main():
    n_gauss = int(os.environ.get("BENCH_N", 100_000))
    reso = int(os.environ.get("BENCH_RESO", 512))
    iters = int(os.environ.get("BENCH_ITERS", 50))
    saturated = bool(os.environ.get("BENCH_SAT"))

    from gsgen_tpu.models.scene import RenderConfig, render_view, activate
    from gsgen_tpu.models.init import InitConfig, initialize
    from gsgen_tpu.ops.camera import CameraIntrinsics, get_frustum, \
        sphere_in_frustum
    from gsgen_tpu.ops.projection import (conic_from_cov2d,
                                          project_gaussians)
    from gsgen_tpu.ops.binning import bin_gaussians
    from gsgen_tpu.ops.pallas_raster import (pack_dup, rasterize_tiles_pallas,
                                             D_ROWS, CH_OUT)

    cap = 1 << int(os.environ.get("BENCH_CAP_LOG", 18))
    chunk = int(os.environ.get("BENCH_CHUNK", 128))
    rcfg = RenderConfig(dup_cap=cap, chunk=chunk)
    intr = CameraIntrinsics.from_reso(reso)
    tile = rcfg.tile_size
    n_tiles = (reso // tile) ** 2
    P = tile * tile

    @jax.jit
    def build(key):
        st = initialize(key, InitConfig(num_points=n_gauss, svec_val=0.01,
                                        mean_std=0.6), rcfg)
        if saturated:
            st = st._replace(params=st.params._replace(
                alpha=jnp.full_like(st.params.alpha, 4.0)))  # sigmoid->0.98
        return st

    state = jax.block_until_ready(build(jax.random.PRNGKey(0)))
    c2w = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.5]], jnp.float32)
    bg = jnp.ones((3,), jnp.float32)

    hbm_bw, vpu_flops = measure_peaks()
    print(f"measured peaks: HBM {hbm_bw/1e9:.0f} GB/s, "
          f"VPU fp32 {vpu_flops/1e12:.2f} TFLOP/s")

    # ---- stage closures ------------------------------------------------
    def project_stage(params):
        mean, qvec, svec, color, alpha = activate(params, rcfg)
        normals, pts = get_frustum(c2w, intr)
        radii = jnp.max(svec, axis=-1) * rcfg.frustum_culling_radius
        cull = sphere_in_frustum(mean, radii, normals, pts)
        proj = project_gaussians(mean, qvec, svec, c2w)
        conic, _ = conic_from_cov2d(proj.cov2d)
        return proj, conic, cull, color, alpha

    proj, conic, cull, color, alpha = jax.jit(project_stage)(state.params)
    vis = state.active & cull & proj.in_front

    def bin_stage(mean2d, cov2d, depth):
        return bin_gaussians(mean2d, cov2d, depth, vis,
                             intr.fx, intr.fy, intr.cx, intr.cy,
                             reso, reso, tile, cap, chunk=chunk)

    bins = jax.jit(bin_stage)(proj.mean2d, proj.cov2d, proj.depth)
    bins = jax.block_until_ready(bins)
    n_dup = int(bins.total)
    counts = np.asarray(bins.ends - bins.starts)
    nck_host = (counts + chunk - 1) // chunk
    walked_dups = int(nck_host.sum()) * chunk
    feats = jnp.concatenate(
        [color, proj.depth[:, None], (proj.depth**2)[:, None]], axis=-1)
    F = feats.shape[-1]
    topleft = (-intr.cx / intr.fx, -intr.cy / intr.fy)
    psz = (1.0 / intr.fx, 1.0 / intr.fy)

    def raster_fwd(mean2d, conic, alpha, feats):
        return rasterize_tiles_pallas(mean2d, conic, alpha, feats, bins,
                                      topleft, psz, w=reso, h=reso,
                                      tile_size=tile, chunk=chunk)

    def raster_loss(mean2d, conic, alpha, feats):
        img, T = raster_fwd(mean2d, conic, alpha, feats)
        return jnp.mean(img) + jnp.mean(T)

    def full_loss(params):
        out = render_view(params, state.active, c2w, intr, rcfg, bg)
        return (jnp.mean(out["rgb"]) + jnp.mean(out["depth"])
                + jnp.mean(out["T"]))

    # ---- timings (chained; additive eps on a traced input defeats
    # hoisting because each iteration's input differs; scalar value
    # fetch + two-point slope per _slope_time's rules) -------------------
    def time_chain(make_body, *args, label=""):
        @jax.jit
        def many(k, *a):
            def step(i, c):
                return make_body(c, *a)
            return jax.lax.fori_loop(0, k, step, jnp.float32(0.0))
        return _slope_time(lambda k: many(k, *args),
                           k_lo=iters // 4, k_hi=iters)

    t_proj = time_chain(
        lambda c, p: c + 1e-20 * jnp.sum(
            jax.jit(project_stage)(jax.tree_util.tree_map(
                lambda x: x + c * 1e-30, p))[0].mean2d),
        state.params)

    t_bin = time_chain(
        lambda c, m2, cv, dp: c + 1e-20 * jnp.sum(
            bin_stage(m2 + c * 1e-30, cv, dp).ends.astype(jnp.float32)),
        proj.mean2d, proj.cov2d, proj.depth)

    t_pack = time_chain(
        lambda c, m2: c + 1e-20 * jnp.sum(pack_dup(
            m2 + c * 1e-30, conic, alpha, feats, bins.padded_gid,
            bins.row_valid, bins.padded_gid.shape[0])[0]),
        proj.mean2d)

    t_fwd = time_chain(
        lambda c, m2: c + 1e-20 * jnp.sum(
            raster_fwd(m2 + c * 1e-30, conic, alpha, feats)[0]),
        proj.mean2d)

    grad_r = jax.grad(raster_loss, argnums=(0, 1, 2, 3))
    t_fb = time_chain(
        lambda c, m2: c + 1e-20 * jnp.sum(
            grad_r(m2 + c * 1e-30, conic, alpha, feats)[0]),
        proj.mean2d)

    grad_full = jax.grad(full_loss)
    t_e2e = time_chain(
        lambda c, p: c + 1e-20 * jnp.sum(grad_full(
            jax.tree_util.tree_map(lambda x: x + c * 1e-30, p)).mean),
        state.params)

    # ---- analytic bytes / flops ---------------------------------------
    cap_padded = bins.padded_gid.shape[0]
    fwd_bytes = (walked_dups * D_ROWS * 4          # dup chunk DMA
                 + n_tiles * CH_OUT * P * 4)       # out
    # ~35 VPU flops per (dup x pixel) incl. Hillis-Steele cumprod
    fwd_flops = walked_dups * P * 35
    bwd_bytes = (walked_dups * D_ROWS * 4 * 2      # dup read + grad write
                 + n_tiles * CH_OUT * P * 4 * 2)   # out + cotangent
    bwd_flops = walked_dups * P * 80               # ~2.3x fwd math
    pack_bytes = (cap_padded * D_ROWS * 4          # write
                  + cap_padded * D_ROWS * 4)       # gather reads
    bin_bytes = cap * 4 * 14                       # ~14 cap-sized passes

    def sol(t, bytes_, flops):
        t_mem = bytes_ / hbm_bw
        t_cmp = flops / vpu_flops
        bound = max(t_mem, t_cmp)
        return bound / t * 100, ("HBM" if t_mem > t_cmp else "VPU")

    t_bwd = t_fb - t_fwd
    rows = [
        ("project+cull", t_proj, None, None),
        ("binning", t_bin, bin_bytes, 0),
        ("pack", t_pack, pack_bytes, 0),
        ("raster fwd (pack+kernel)", t_fwd, fwd_bytes + pack_bytes,
         fwd_flops),
        ("raster bwd (delta)", t_bwd, bwd_bytes, bwd_flops),
        ("e2e grad step", t_e2e, None, None),
    ]
    print(f"\nscene: {n_gauss} Gaussians, {reso}x{reso}, dup={n_dup} "
          f"(walked {walked_dups}), saturated={saturated}")
    print("| stage | time (ms) | SoL % | bound |")
    print("|---|---|---|---|")
    for name, t, b, f in rows:
        if b is None:
            print(f"| {name} | {t*1e3:.2f} | — | — |")
        else:
            pct, which = sol(t, b, f or 0)
            print(f"| {name} | {t*1e3:.2f} | {pct:.0f}% | {which} |")

    rays = reso * reso / t_e2e
    print(json.dumps({"metric": "roofline_e2e_rays_per_s", "value": rays,
                      "unit": "rays/s", "walked_dups": walked_dups,
                      "hbm_gbs": hbm_bw / 1e9,
                      "vpu_tflops": vpu_flops / 1e12}))


if __name__ == "__main__":
    main()
