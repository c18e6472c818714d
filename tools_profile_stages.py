"""Fine-grained kernel-stage attribution for the perf attack (round 3).

Separates what BASELINE.md's coarse stage table lumps together:
  pack-fwd | fwd-kernel | bwd-kernel | pack-VJP | binning | glue
Each stage is timed as a chained fori_loop inside one jit dispatch
(device time, tunnel latency excluded).
"""

import time

import jax
import jax.numpy as jnp

from gsgen_tpu.models.init import InitConfig, initialize
from gsgen_tpu.models.scene import RenderConfig, render_view
from gsgen_tpu.ops import pallas_raster as pr
from gsgen_tpu.ops.binning import bin_gaussians
from gsgen_tpu.ops.camera import CameraIntrinsics
from gsgen_tpu.ops.projection import (conic_from_cov2d, frustum_cull_mask,
                                      project_gaussians)

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
    c2w = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.5]],
                    jnp.float32)
    p = state.params

    from gsgen_tpu.models.scene import activate
    from gsgen_tpu.utils.activations import act

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
        return proj.mean2d, conic, proj.depth, cull, alpha, feats

    mean2d, conic, depth, cullm, alpha, feats = stage_in(p)
    F = feats.shape[1]

    def bin_fn(m2, dp):
        return bin_gaussians(m2, jnp.zeros((N, 2, 2)), dp, cullm,
                             intr.fx, intr.fy, intr.cx, intr.cy,
                             RESO, RESO, 16, cap=CAP, chunk=CHUNK,
                             alpha=alpha)
    # NOTE: bin needs cov2d; rebuild from conic? just re-project inside:
    @jax.jit
    def bin_full(m2, dp):
        proj = project_gaussians(p.mean, p.qvec,
                                 act(rcfg.svec_act)(p.svec), c2w)
        return bin_gaussians(m2, proj.cov2d, dp, cullm,
                             intr.fx, intr.fy, intr.cx, intr.cy,
                             RESO, RESO, 16, cap=CAP, chunk=CHUNK,
                             alpha=alpha)

    bins = jax.block_until_ready(bin_full(mean2d, depth))
    print("duplicates:", int(bins.total))
    cap_padded = bins.padded_gid.shape[0]

    # --- pack fwd alone ---
    def pack_fn(m2, cn, al, fe):
        return pr.pack_dup(m2, cn, al, fe, bins.padded_gid,
                           bins.row_valid, cap_padded,
                           gid_cum=bins.gid_cum)
    t_pack = time_chain(pack_fn, mean2d, conic, alpha, feats)
    print(f"pack fwd: {t_pack*1e3:.2f} ms")

    dup = jax.jit(pack_fn)(mean2d, conic, alpha, feats)
    dup = jax.block_until_ready(dup)

    # --- fwd kernel alone (dup precomputed) ---
    n_tiles_w = RESO // 16
    n_tiles = n_tiles_w * n_tiles_w
    core = pr._make_core(n_tiles, n_tiles_w, 16, CHUNK, F, cap_padded,
                         1e-4, False)
    geom = jnp.stack([jnp.float32(intr.image_topleft[0]),
                      jnp.float32(intr.image_topleft[1]),
                      jnp.float32(intr.pixel_size[0]),
                      jnp.float32(intr.pixel_size[1])])
    counts = bins.ends - bins.starts
    nchunks = ((counts + CHUNK - 1) // CHUNK).astype(jnp.int32)
    ct = bins.chunk_tile.astype(jnp.int32)
    st = bins.starts.astype(jnp.int32)
    en = bins.ends.astype(jnp.int32)

    def fwd_fn(d):
        return core(d, ct, st, en, nchunks, geom)
    t_fwd = time_chain(fwd_fn, dup)
    print(f"fwd kernel: {t_fwd*1e3:.2f} ms")

    # --- fwd+bwd kernel (dup precomputed; grads wrt dup only) ---
    out0 = jax.jit(fwd_fn)(dup)
    cot = jax.block_until_ready(
        out0 * jax.random.uniform(jax.random.PRNGKey(1), out0.shape))

    def fwdbwd_fn(d, ctg):
        out, vjp = jax.vjp(
            lambda dd: core(dd, ct, st, en, nchunks, geom), d)
        return vjp(ctg)[0]
    t_fb = time_chain(fwdbwd_fn, dup, cot)
    print(f"fwd+bwd kernels: {t_fb*1e3:.2f} ms "
          f"(bwd kernel delta {1e3*(t_fb-t_fwd):.2f})")

    # --- pack VJP alone (random non-foldable cotangent) ---
    dcot = jax.block_until_ready(jax.random.uniform(
        jax.random.PRNGKey(2), dup.shape))

    def packvjp_fn(m2, cn, al, fe, ctg):
        out, vjp = jax.vjp(pack_fn, m2, cn, al, fe)
        return vjp(ctg)
    t_packvjp = time_chain(packvjp_fn, mean2d, conic, alpha, feats, dcot)
    print(f"pack fwd+VJP: {t_packvjp*1e3:.2f} ms "
          f"(VJP delta {1e3*(t_packvjp-t_pack):.2f})")

    # --- binning alone ---
    t_bin = time_chain(lambda m2, dp: bin_full(m2, dp).padded_gid
                       .astype(jnp.float32), mean2d, depth)
    print(f"binning: {t_bin*1e3:.2f} ms")

    # --- projection+activations ---
    t_proj = time_chain(lambda pp: stage_in(pp)[0], p)
    print(f"project+act: {t_proj*1e3:.2f} ms")

    # --- e2e grad step (the bench number's inner body) ---
    bg = jnp.ones((3,), jnp.float32)

    def loss(params):
        out = render_view(params, state.active, c2w, intr, rcfg, bg)
        return (jnp.mean(out["rgb"]) + jnp.mean(out["depth"])
                + jnp.mean(out["T"]))
    g = jax.grad(loss)

    @jax.jit
    def e2e_many():
        def body(i, carry):
            gg = g(jax.tree_util.tree_map(
                lambda x: x + carry * 1e-20, p))
            return carry + jnp.sum(gg.mean) * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    jax.block_until_ready(e2e_many())
    t0 = time.perf_counter()
    jax.block_until_ready(e2e_many())
    t_e2e = (time.perf_counter() - t0) / ITERS
    print(f"e2e grad step: {t_e2e*1e3:.2f} ms "
          f"({RESO*RESO/t_e2e/1e6:.2f} M rays/s)")
    known = t_pack + t_fwd + (t_fb - t_fwd) + (t_packvjp - t_pack) \
        + t_bin + t_proj
    print(f"sum of stages: {known*1e3:.2f} ms; "
          f"unattributed glue: {(t_e2e-known)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
