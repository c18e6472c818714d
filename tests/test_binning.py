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
