"""Property tests for the static-shape tile binner."""

import jax
import jax.numpy as jnp
import numpy as np

from gsgen_tpu.ops import binning as B


def simple_scene(n=16, seed=0, reso=64):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    # camera-plane positions within the image ([-0.5, 0.5] for from_reso)
    mean2d = jax.random.uniform(k1, (n, 2), minval=-0.4, maxval=0.4)
    var = jax.random.uniform(k2, (n,), minval=1e-4, maxval=3e-3)
    cov2d = var[:, None, None] * jnp.eye(2)[None]
    depth = jax.random.uniform(k3, (n,), minval=1.0, maxval=4.0)
    active = jnp.ones((n,), bool)
    return mean2d, cov2d, depth, active


def run_bin(mean2d, cov2d, depth, active, reso=64, tile_size=16, cap=1024, chunk=8):
    f = float(reso)
    return B.bin_gaussians(mean2d, cov2d, depth, active,
                           fx=f, fy=f, cx=f / 2, cy=f / 2,
                           w=reso, h=reso, tile_size=tile_size,
                           cap=cap, chunk=chunk)


def reference_bins(mean2d, cov2d, depth, active, reso=64, tile_size=16, D=6.0):
    """Slow numpy reimplementation of gs/culling.py AABB binning."""
    n_tw = reso // tile_size
    mean2d, cov2d, depth = map(np.asarray, (mean2d, cov2d, depth))
    bins = {}
    for g in range(mean2d.shape[0]):
        if not bool(active[g]):
            continue
        hx = np.sqrt(D * cov2d[g, 0, 0])
        hy = np.sqrt(D * cov2d[g, 1, 1])
        tlx = int(np.clip(int((mean2d[g, 0] - hx) * reso + reso / 2), 0, reso - 1)) // tile_size
        tly = int(np.clip(int((mean2d[g, 1] - hy) * reso + reso / 2), 0, reso - 1)) // tile_size
        brx = int(np.clip(int((mean2d[g, 0] + hx) * reso + reso / 2), 0, reso - 1)) // tile_size
        bry = int(np.clip(int((mean2d[g, 1] + hy) * reso + reso / 2), 0, reso - 1)) // tile_size
        for ty in range(tly, bry + 1):
            for tx in range(tlx, brx + 1):
                bins.setdefault(ty * n_tw + tx, []).append(g)
    # sort each by (depth, insertion order) — insertion order is gid order
    for t in bins:
        bins[t].sort(key=lambda g: (depth[g], g))
    return bins


def extract_bins(binned, n_tiles):
    gid = np.asarray(binned.padded_gid)
    starts = np.asarray(binned.starts)
    ends = np.asarray(binned.ends)
    return {t: list(gid[starts[t]:ends[t]]) for t in range(n_tiles) if ends[t] > starts[t]}


def test_binning_matches_reference():
    mean2d, cov2d, depth, active = simple_scene(n=24)
    binned = run_bin(mean2d, cov2d, depth, active)
    got = extract_bins(binned, 16)
    want = reference_bins(mean2d, cov2d, depth, active)
    assert set(got) == set(want)
    for t in want:
        assert got[t] == want[t], f"tile {t}: {got[t]} != {want[t]}"


def test_total_matches_reference_count():
    mean2d, cov2d, depth, active = simple_scene(n=24, seed=3)
    binned = run_bin(mean2d, cov2d, depth, active)
    want = reference_bins(mean2d, cov2d, depth, active)
    assert int(binned.total) == sum(len(v) for v in want.values())


def test_segments_depth_sorted():
    mean2d, cov2d, depth, active = simple_scene(n=48, seed=1)
    binned = run_bin(mean2d, cov2d, depth, active, cap=4096)
    d = np.asarray(depth)
    for t, gids in extract_bins(binned, 16).items():
        dd = d[gids]
        assert (np.diff(dd) >= 0).all()


def test_chunk_alignment():
    mean2d, cov2d, depth, active = simple_scene(n=48, seed=2)
    chunk = 8
    binned = run_bin(mean2d, cov2d, depth, active, cap=4096, chunk=chunk)
    assert (np.asarray(binned.starts) % chunk == 0).all()
    # segments must not overlap each other's aligned regions
    starts, ends = np.asarray(binned.starts), np.asarray(binned.ends)
    order = np.argsort(starts)
    for a, b in zip(order[:-1], order[1:]):
        aligned_end = -(-ends[a] // chunk) * chunk
        assert starts[b] >= aligned_end or ends[b] == starts[b]


def test_row_valid_consistent():
    mean2d, cov2d, depth, active = simple_scene(n=32, seed=4)
    binned = run_bin(mean2d, cov2d, depth, active, cap=4096)
    rv = np.asarray(binned.row_valid)
    starts, ends = np.asarray(binned.starts), np.asarray(binned.ends)
    covered = np.zeros_like(rv)
    for s, e in zip(starts, ends):
        assert rv[s:e].all()
        covered[s:e] = True
    assert not rv[~covered].any()


def test_inactive_dropped():
    mean2d, cov2d, depth, active = simple_scene(n=16, seed=5)
    active = active.at[::2].set(False)
    binned = run_bin(mean2d, cov2d, depth, active)
    gids = set()
    for t, g in extract_bins(binned, 16).items():
        gids.update(g)
    assert all(g % 2 == 1 for g in gids)


def test_capacity_overflow_drops_tail():
    mean2d, cov2d, depth, active = simple_scene(n=32, seed=6)
    full = run_bin(mean2d, cov2d, depth, active, cap=4096)
    small_cap = max(int(full.total) - 5, 8)
    binned = run_bin(mean2d, cov2d, depth, active, cap=small_cap)
    assert int(binned.total) == int(full.total)  # total reports true demand
    kept = sum(int(e - s) for s, e in zip(binned.starts, binned.ends))
    assert kept == small_cap


def test_alpha_aware_aabb_is_pixel_exact():
    """Passing alpha shrinks footprints without changing any pixel or
    gradient: outside min(D, 2 ln(255 a)) every contribution is hard-
    zeroed by the rasterizer's 1/255 skip rule, so the dropped
    duplicates were exact no-ops."""
    from gsgen_tpu.ops.rasterize import rasterize_tiles

    mean2d, cov2d, depth, active = simple_scene(n=48, seed=7)
    key = jax.random.PRNGKey(8)
    # spread of opacities: below 1/255 (no footprint), low (tight
    # footprint), high (reference D governs)
    alpha = jnp.concatenate([
        jnp.full((8,), 1e-3), jnp.full((20,), 0.02),
        jax.random.uniform(key, (20,), minval=0.3, maxval=0.95)])
    feats = jax.random.uniform(jax.random.PRNGKey(9), (48, 4))
    reso, tile, chunk = 64, 16, 8
    f = float(reso)
    kw = dict(fx=f, fy=f, cx=f / 2, cy=f / 2, w=reso, h=reso,
              tile_size=tile, cap=2048, chunk=chunk)

    def render(m2, al, use_alpha):
        bins = B.bin_gaussians(m2, cov2d, depth, active,
                               alpha=al if use_alpha else None, **kw)
        img, T = rasterize_tiles(m2, _conic(cov2d), al, feats, bins,
                                 (-0.5, -0.5), (1.0 / f, 1.0 / f),
                                 w=reso, h=reso, tile_size=tile,
                                 chunk=chunk)
        return img, T, bins.total

    def _conic(cv):
        from gsgen_tpu.ops.projection import conic_from_cov2d
        return conic_from_cov2d(cv)[0]

    img0, t0_, tot0 = render(mean2d, alpha, False)
    img1, t1_, tot1 = render(mean2d, alpha, True)
    assert int(tot1) < int(tot0)          # footprints actually shrank
    # dropped duplicates are exact no-ops; the only residual is ULP-level
    # re-association when chunk boundaries shift
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1),
                               rtol=0, atol=5e-7)
    np.testing.assert_allclose(np.asarray(t0_), np.asarray(t1_),
                               rtol=0, atol=5e-7)

    def loss(m2, al, use_alpha):
        img, T, _ = render(m2, al, use_alpha)
        return jnp.sum(img ** 2) + jnp.sum(T)

    g0 = jax.grad(loss, argnums=(0, 1))(mean2d, alpha, False)
    g1 = jax.grad(loss, argnums=(0, 1))(mean2d, alpha, True)
    np.testing.assert_allclose(np.asarray(g0[0]), np.asarray(g1[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g0[1]), np.asarray(g1[1]),
                               rtol=1e-5, atol=1e-6)


def test_expansion_rank_kernel_parity():
    """The block-parallel rank kernel == the scatter+cumsum form, across
    count distributions (zeros, pile-ups, capacity overflow) and on both
    sides of the window-overflow lax.cond."""
    from gsgen_tpu.ops.expansion_rank import _gid_scatter, expansion_gid

    rng = np.random.default_rng(0)
    cap = 8192

    def check(counts, cap=cap):
        cum = jnp.cumsum(jnp.asarray(counts, jnp.int32))
        got = np.asarray(jax.jit(expansion_gid,
                                 static_argnums=1)(cum, cap))
        want = np.asarray(jax.jit(_gid_scatter,
                                  static_argnums=1)(cum, cap))
        np.testing.assert_array_equal(got, want)

    # mixed small counts with many zero-count gaussians
    check(rng.integers(0, 5, size=500) * rng.integers(0, 2, size=500))
    # all zero (everything culled)
    check(np.zeros(300, np.int64))
    # single gaussian owning every slot
    check(np.array([cap + 32]))
    # total overflowing the capacity (mode='drop' semantics)
    check(rng.integers(0, 9, size=4000))
    # pathological pile-up: >4096 equal cum values in one window ->
    # fits=False, exercises the scatter fallback branch of the cond
    piled = np.zeros(6000, np.int64)
    piled[0] = 7
    check(piled)
    # non-multiple cap: pure-XLA path
    check(rng.integers(0, 4, size=200), cap=1000)
    # window straddling a WR-row block boundary (lo near a multiple of
    # 4096 values): dense 1-count gaussians push lo deep into the table
    check(np.ones(7000, np.int64))


def test_fp32_floor_division_trick_exhaustive():
    """dy = floor((local+0.5)/gw) in fp32 must equal local // gw for
    every width and at every quotient boundary the binner can produce."""
    gw = np.arange(1, 1024, dtype=np.int64)
    # per width: locals at every boundary dy*gw and dy*gw - 1 for a
    # spread of dy values, plus the extremes
    dys = np.unique(np.concatenate(
        [np.arange(0, 64), np.linspace(0, 1 << 19, 257).astype(np.int64)]))
    loc = (dys[:, None] * gw[None, :])
    for shift in (0, -1, 1):
        local = np.clip(loc + shift, 0, 1 << 19)
        want = local // gw[None, :]
        got = np.floor(
            (local.astype(np.float32) + np.float32(0.5))
            / gw[None, :].astype(np.float32)).astype(np.int64)
        np.testing.assert_array_equal(got, want)


def test_searchsorted2_matches_stock():
    """Two-level searchsorted == jnp.searchsorted across sides, ties,
    out-of-range queries, and the pad (n % 256 != 0) path."""
    from gsgen_tpu.ops.searchsorted2 import searchsorted2

    rng = np.random.default_rng(3)
    for n in (2048, 100_000, 99_999):       # divisible / padded
        arr = jnp.sort(jnp.asarray(
            rng.integers(0, 5000, size=n), jnp.int32))
        q = jnp.asarray(np.concatenate(
            [rng.integers(-10, 5010, size=777),
             np.asarray(arr[rng.integers(0, n, size=200)])]), jnp.int32)
        for side in ("left", "right"):
            got = np.asarray(jax.jit(
                lambda a, qq: searchsorted2(a, qq, side=side))(arr, q))
            want = np.asarray(jnp.searchsorted(arr, q, side=side))
            np.testing.assert_array_equal(got, want, err_msg=f"{n}/{side}")
