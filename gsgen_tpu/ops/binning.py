"""Tile binning: AABB footprint -> padded duplication -> lexicographic sort.

TPU-native replacement for the reference's dynamic-shape CUB pipeline
(gs/src/include/aabb_culling.h:15-260 + gs/culling.py:9-37 in
gsgen3d/gsgen).  Design deltas, all driven by XLA's static-shape
requirement and by what the Pallas kernels need:

* The reference computes the exact duplicate count ``N_with_dub`` with a
  host sync (gs/culling.py:34 ``.item()``) and allocates per frame.  We
  use a **static capacity** ``cap``; duplicate slots are materialized by
  the classic vectorized-repeat trick (exclusive-cumsum + searchsorted)
  and slots beyond ``cap`` are dropped (monitored via the returned
  ``total`` so the host can pick a bigger bucket).
* The CUB 64-bit radix sort over ``tile_id << 32 | depth_bits`` keys
  (aabb_culling.h:162-168) becomes a stable two-key ``lax.sort`` —
  identical ordering semantics including tie-breaking by generation
  order.
* Per-tile segments are **aligned to the kernel chunk size**: every
  tile's segment starts at a multiple of ``chunk``.  This makes every
  forward DMA aligned and — crucial for the backward pass — gives each
  tile exclusive ownership of whole chunks of the gradient buffer, so
  gradient writes need no atomics and cannot clobber a neighbor tile.

Everything here is index math (no gradients); callers gather features
with the returned ``padded_gid`` (the gather IS differentiable and its
autodiff transpose performs the deterministic scatter-add of gradients
back onto Gaussians).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class BinnedTiles(NamedTuple):
    """Static-shape tile binning result.

    padded_gid: [cap_padded] int32 — Gaussian id per duplicate slot, laid
        out so tile ``t`` owns rows ``[starts[t], starts[t] + counts[t])``
        and ``starts[t]`` is chunk-aligned.  Padding rows contain the
        SENTINEL id N (one past the last Gaussian): the Pallas packer
        appends a zero row there, and index-clamp semantics keep other
        consumers safe; they are also outside every ``[start, end)``.
    row_valid: [cap_padded] bool — True for rows holding a real duplicate.
    starts:   [n_tiles] int32 — chunk-aligned segment starts.
    ends:     [n_tiles] int32 — starts + per-tile duplicate count.
    total:    [] int32 — exact number of duplicates before capacity drop
        (the reference's N_with_dub; compare against ``cap`` to detect
        overflow).
    gid_cum:  [N] int32 — inclusive cumsum of per-Gaussian SURVIVING
        duplicate counts (capacity drop applied).  Lets the rasterizer's
        backward aggregate duplicate-row gradients with a sort+segment
        scan instead of a scatter-add: after sorting rows by Gaussian
        id, Gaussian g's rows end at ``gid_cum[g] - 1``.
    chunk_tile: [cap_padded // chunk] int32 — owning tile of each
        chunk-sized slot of the padded layout (segments are back-to-back
        and chunk-aligned, so each slot has exactly one owner; slots
        past the used region map to the last tile and are rejected by
        the per-tile chunk-count bound).  Drives the backward kernel's
        flat chunk grid.
    """

    padded_gid: jax.Array
    row_valid: jax.Array
    starts: jax.Array
    ends: jax.Array
    total: jax.Array
    gid_cum: jax.Array
    chunk_tile: jax.Array
    padded_total: jax.Array
    # ---- compact layout (layout="compact", the Pallas production path:
    # no alignment padding, no pos scatter — kernels walk K-aligned
    # WINDOWS of the compact sorted table with lane masks at segment
    # boundaries; see pallas_raster.py round-3 notes) ----
    gid_s: Optional[jax.Array] = None        # [cap] sorted gaussian ids
    step_tile: Optional[jax.Array] = None    # [max_steps] owning tile per
                                             # (tile, window) kernel step;
                                             # sentinel n_tiles = dead
    step_window: Optional[jax.Array] = None  # [max_steps] window index
    # ---- padded-layout VJP maps (round 4): the gradient aggregation
    # sorts/gathers over the COMPACT [cap] domain instead of the padded
    # [cap_padded] one (-27%% rows at the 100K/512² scale).  vjp_gid is
    # the compact sorted gaussian id (sentinel N past ``total``);
    # vjp_pos is the PADDED buffer position of each compact row
    # (r + off_tile, carried through the aggregation sort so the one
    # row-gather reads the padded grad buffer directly) ----
    vjp_gid: Optional[jax.Array] = None      # [cap]
    vjp_pos: Optional[jax.Array] = None      # [cap]


def tile_aabbs(
    mean2d: jax.Array,
    cov2d: jax.Array,
    fx, fy, cx, cy,
    w: int, h: int,
    tile_size: int,
    tile_culling_radius: float = 6.0,
    pixel_offset_y=0,
    alpha=None,
):
    """Per-Gaussian inclusive tile-space AABB (tl_x, tl_y, br_x, br_y).

    Matches tile_culling_aabb_count (gs/culling.py:9-37): half extents
    bounding the ellipse ``{radial <= D}`` in camera-plane units,
    converted to pixels, clamped to the image, then floor-divided by
    tile_size.

    The extents are derived from the CONIC the rasterizer evaluates
    (``sqrt(D * C_cc / det C)`` — the exact max |dx| over the rendered
    ellipse), not from cov2d directly: conic_from_cov2d's degeneracy
    guard can make the rendered ellipse larger than the raw covariance
    implies, and a cov-derived box then misses real contributions at
    tile boundaries.  Binning must cover what the kernel will actually
    composite, whatever numerical guards apply — in exact arithmetic the
    two agree (``C_cc/det C == cov_xx``).

    With ``alpha`` (post-activation opacity), D tightens per Gaussian to
    ``min(D, 2 ln(255 a_cl))`` — the exact support of the rasterizer's
    hard ``a·G < 1/255`` zeroing (common.h:89 semantics): outside that
    radius every contribution is identically zero, so the shrink changes
    no pixel and no gradient while cutting duplicates for low-opacity
    Gaussians (which dominate trained scenes).  Gaussians whose peak
    contribution a_cl is below 1/255 get no footprint at all.
    """
    from .projection import conic_from_cov2d

    D = jnp.asarray(tile_culling_radius, jnp.float32)
    dropped = None
    if alpha is not None:
        from .oracle import ALPHA_CLAMP, MIN_RENDER_ALPHA
        a_cl = jnp.minimum(alpha, ALPHA_CLAMP)
        D = jnp.minimum(
            D, 2.0 * jnp.log(jnp.maximum(a_cl, 1e-12) / MIN_RENDER_ALPHA))
        dropped = D < 0.0
    conic, _ = conic_from_cov2d(cov2d)     # pure fn of cov2d: bitwise
    ca = conic[..., 0]                     # identical to the caller's
    cb = conic[..., 1]
    cc = conic[..., 2]
    detc = ca * cc - cb * cb
    # near-degenerate conic (fp-negative det): ellipse direction nearly
    # unbounded — the relative floor yields huge, image-clipped extents
    # (conservative: bin everywhere it might reach)
    detc = jnp.maximum(detc, 1e-7 * (jnp.abs(ca * cc) + cb * cb) + 1e-38)
    hx = jnp.sqrt(jnp.maximum(D * cc / detc, 0.0))
    hy = jnp.sqrt(jnp.maximum(D * ca / detc, 0.0))
    # pixel bounds are computed in GLOBAL image coordinates and shifted
    # by the (integer) slab offset afterwards, so tile membership is
    # bit-identical between a full render and its tile-sharded slabs
    tl_px = ((mean2d[..., 0] - hx) * fx + cx).astype(jnp.int32)
    tl_py = ((mean2d[..., 1] - hy) * fy + cy).astype(jnp.int32) - pixel_offset_y
    br_px = ((mean2d[..., 0] + hx) * fx + cx).astype(jnp.int32)
    br_py = ((mean2d[..., 1] + hy) * fy + cy).astype(jnp.int32) - pixel_offset_y
    # a footprint entirely outside the image is DROPPED, not clamped into
    # edge tiles (the reference clamps, gs/culling.py:23-27, spuriously
    # binning out-of-frame Gaussians into border tiles; correctness of
    # tile-sharded slab rendering requires the drop)
    overlaps = ((br_px >= 0) & (tl_px <= w - 1)
                & (br_py >= 0) & (tl_py <= h - 1))
    if dropped is not None:
        overlaps = overlaps & ~dropped
    tl_x = jnp.clip(tl_px, 0, w - 1) // tile_size
    tl_y = jnp.clip(tl_py, 0, h - 1) // tile_size
    br_x = jnp.clip(br_px, 0, w - 1) // tile_size
    br_y = jnp.clip(br_py, 0, h - 1) // tile_size
    return tl_x, tl_y, br_x, br_y, overlaps


def bin_gaussians(
    mean2d: jax.Array,        # [N, 2]
    cov2d: jax.Array,         # [N, 2, 2]
    depth: jax.Array,         # [N]
    active: jax.Array,        # [N] bool (frustum cull & in_front & alive)
    fx, fy, cx, cy,           # dynamic intrinsics scalars
    w: int, h: int,           # static image size
    tile_size: int,           # static
    cap: int,                 # static duplicate capacity (pre-alignment)
    chunk: int = 256,         # static kernel chunk size (segment alignment)
    tile_culling_radius: float = 6.0,
    pixel_offset_y=0,         # slab offset (tile-sharded rendering)
    alpha=None,               # post-activation opacity: exact AABB shrink
    pad_budget=None,          # static alignment-padding slots (default:
                              # worst-case n_tiles*chunk; average use is
                              # ~n_tiles*chunk/2 — a tighter budget cuts
                              # the pack gather and the backward grid;
                              # overflow drops far duplicates, monitored
                              # via ``padded_total``)
    layout: str = "padded",   # "padded": chunk-aligned copy of each
                              # segment (XLA backend, sharded renders) —
                              # "compact": no padding; kernels walk
                              # K-aligned WINDOWS of the sorted table
                              # with boundary lane masks (Pallas path;
                              # skips the pos scatter + fills, the
                              # hottest binning ops, BASELINE.md round 3)
) -> BinnedTiles:
    """Bin Gaussians into chunk-aligned, depth-sorted per-tile segments."""
    n_tiles_w = -(-w // tile_size)
    n_tiles_h = -(-h // tile_size)
    n_tiles = n_tiles_w * n_tiles_h
    if pad_budget is None:
        pad_budget = n_tiles * chunk
    assert pad_budget % chunk == 0
    cap_padded = cap + pad_budget

    tl_x, tl_y, br_x, br_y, overlaps = tile_aabbs(
        mean2d, cov2d, fx, fy, cx, cy, w, h, tile_size, tile_culling_radius,
        pixel_offset_y, alpha=alpha)

    width = br_x - tl_x + 1
    height = br_y - tl_y + 1
    counts = jnp.where(active & overlaps, width * height, 0).astype(jnp.int32)

    # vectorized repeat: slot d belongs to gaussian g with
    # cum_excl[g] <= d < cum_excl[g] + counts[g].  A searchsorted here
    # costs ~130ms at 1M slots on TPU (binary search = log N serial
    # gathers); gid[d] = #(cum <= d) = searchsorted(cum, d, 'right') is
    # computed by the block-parallel rank kernel (ops/expansion_rank.py)
    # — the scatter+cumsum form it replaces ran at the serial scatter-
    # engine rate (0.87 ms at 100K/512², the round-4 floor table) and
    # survives as its lax.cond fallback.
    from .expansion_rank import expansion_gid

    cum = jnp.cumsum(counts)
    total = cum[-1] if counts.size else jnp.int32(0)
    cum_excl = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum[:-1]])

    d = jnp.arange(cap, dtype=jnp.int32)
    gid = expansion_gid(cum, cap)
    slot_valid = d < total
    gid_safe = jnp.clip(gid, 0, counts.shape[0] - 1)

    # one NARROW row-gather for all per-gaussian attributes: 13 separate
    # [cap] gathers are ~13x slower than one row-gather, and an 8-column
    # row-gather + column slices is ~7x slower than a 3-column one (the
    # column extraction from the lane-padded (8,128)-tiled gather output
    # dominates) — so width/tl_x/tl_y ride bit-packed in ONE int32
    # (10 bits each: tile grids up to 1023 per side = images up to
    # ~16360 px at tile 16), measured 4.03 -> 0.58 ms at 100K/512²
    # (round 4)
    assert n_tiles_w <= 1023 and n_tiles_h <= 1023, \
        "geo bit-packing supports tile grids up to 1023 per side"
    geo = width | (tl_x << 10) | (tl_y << 20)
    table = jnp.stack(
        [cum_excl, geo,
         jax.lax.bitcast_convert_type(depth.astype(jnp.float32),
                                      jnp.int32)], axis=1)  # [N, 3] int32
    rows = table[gid_safe]                           # [cap, 3]
    local = d - rows[:, 0]
    pg = rows[:, 1]
    gw = pg & 1023
    # dy = local // gw via fp32: variable int32 division lowers to a
    # long scalarized sequence on TPU; (local+0.5)/gw floors exactly —
    # local+0.5 is exact in f32 (|local| < 2^22), the correctly-rounded
    # divide errs < q*2^-24 while the distance to the nearest integer
    # boundary is (dx+0.5)/gw >= 0.5/1023, a >=16x margin for
    # |local| <= 2^19 (cap <= 2^20 covers every bucket in use)
    assert cap <= 1 << 20, \
        "fp32 floor-division margin requires dup cap <= 2^20"
    dy = jnp.floor(
        (local.astype(jnp.float32) + 0.5) / gw.astype(jnp.float32)
    ).astype(jnp.int32)
    dx = local - dy * gw
    tile = (((pg >> 20) & 1023) + dy) * n_tiles_w + ((pg >> 10) & 1023) + dx

    # sort keys: (tile, depth), stable — invalid slots to sentinel tile.
    # Depth rides as its raw int32 BITS through the order-preserving
    # float->int map (sign-flip for negatives): a float bitcast back to
    # f32 here cost a second full pass over the lane-padded gather
    # output (fusion.189, 0.18 ms at 100K/512² in the round-4 trace)
    # because XLA would not fuse it into the column-unpack fusion; the
    # integer form fuses and the sort order is bit-identical.
    dbits = rows[:, 2]
    depth_key = dbits ^ ((dbits >> 31) & jnp.int32(0x7FFFFFFF))
    tile_key = jnp.where(slot_valid, tile, n_tiles).astype(jnp.int32)
    depth_key = jnp.where(slot_valid, depth_key, jnp.int32(0x7F800000))
    tile_s, _, gid_s = jax.lax.sort(
        (tile_key, depth_key, gid_safe), num_keys=2, is_stable=True)

    # compact per-tile segments: ONE searchsorted over n_tiles+1 edges
    # (end_c[t] == start_c[t+1] on a sorted array — the second
    # searchsorted the old code ran was pure waste, ~1 ms at this scale)
    from .searchsorted2 import searchsorted2

    tix = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    edges = searchsorted2(tile_s, tix, side="left")
    start_c = edges[:-1]
    end_c = edges[1:]
    seg_len = end_c - start_c

    gid_cum_early = jnp.minimum(cum, jnp.minimum(jnp.int32(cap), total))
    if layout == "compact":
        # (tile, window) kernel-step tables: tile t walks the K-aligned
        # windows [start_c//K, ceil(end_c/K)); adjacent tiles SHARE the
        # boundary window (disjoint lanes).  Enumerated by tile, window
        # ascending: the step list is non-decreasing in window, so the
        # backward can merge shared windows via output-block revisiting.
        K = chunk
        w_lo = start_c // K
        w_hi = (end_c + K - 1) // K
        n_win = jnp.maximum(w_hi - w_lo, 0)
        max_steps = cap // K + n_tiles
        step_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_win)[:-1]])
        total_steps = step_start[-1] + n_win[-1]
        jj = jnp.arange(max_steps, dtype=jnp.int32)
        tid = jnp.arange(n_tiles, dtype=jnp.int32)
        fill = lambda v: jax.lax.cummax(  # noqa: E731
            jnp.full((max_steps,), jnp.int32(-(1 << 30))).at[
                jnp.clip(step_start, 0, max_steps - 1)].max(
                    v, mode="drop"))
        live_step = jj < total_steps
        step_tile = jnp.where(live_step, fill(tid), n_tiles)
        # window = j - (step_start[t] - w_lo[t]); clamp dead tail so
        # late steps only zero-fill blocks past the last real window
        step_window = jnp.clip(jj - fill(step_start - w_lo),
                               0, cap // K - 1)
        # the VJP keys tail rows (>= total) to the sentinel id N so the
        # gather pulls the zero row and grads aggregate nowhere
        gid_sent = jnp.where(jnp.arange(cap, dtype=jnp.int32) < total,
                             gid_s, counts.shape[0]).astype(jnp.int32)
        return BinnedTiles(
            padded_gid=None, row_valid=None,
            starts=start_c, ends=end_c, total=total,
            gid_cum=gid_cum_early, chunk_tile=None,
            padded_total=total, gid_s=gid_sent,
            step_tile=step_tile, step_window=step_window)

    # chunk-aligned layout; clamp to cap_padded so kernels never walk
    # past the buffer when the padding budget overflows (the pos scatter
    # below drops those rows; padded_total records the demand)
    aligned_len = ((seg_len + chunk - 1) // chunk) * chunk
    aligned_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned_len)[:-1]])
    padded_total = (aligned_start[-1] + aligned_len[-1]
                    if seg_len.size else jnp.int32(0))
    starts = jnp.minimum(aligned_start, cap_padded)
    ends = jnp.minimum(aligned_start + seg_len, cap_padded)

    gid_cum = gid_cum_early
    # owning tile per chunk slot: scatter each tile's id at its first
    # slot (.max resolves empty-tile collisions to the last/largest id,
    # whose chunk-count bound then rejects the slot) + cummax fill.
    # Tiles whose aligned_start overflows the padding budget are DROPPED
    # from the scatter (index n_slots_c -> mode="drop"), not clipped
    # into the last slot: clipping would hand the final chunk to the
    # overflow tile whose end bound is cap_padded, marking up to
    # chunk-1 garbage rows valid there (ADVICE r4).
    n_slots = cap_padded // chunk
    n_slots_c = -(-cap_padded // chunk)           # ceil: tail remainder
    slot_of_tile = jnp.where(aligned_start < cap_padded,
                             aligned_start // chunk, n_slots_c)
    chunk_tile_c = jax.lax.cummax(
        jnp.zeros((n_slots_c,), jnp.int32).at[slot_of_tile].max(
            jnp.arange(n_tiles, dtype=jnp.int32), mode="drop"))
    chunk_tile = chunk_tile_c[:n_slots]

    # row_valid[r] = r < end(tile-of-r).  Segment starts are chunk-
    # aligned, so the end fill is CONSTANT per chunk and chunk_tile
    # already names the owner: ends[chunk_tile[r // chunk]] — the
    # full-domain scatter+cummax this replaces ran two [cap_padded]
    # passes for a value derivable from the [n_slots] table (for row r
    # of chunk c, {t: aligned_start[t] <= r} == {t: aligned_start[t]
    # <= c*chunk} exactly because starts are chunk multiples, and ends
    # is non-decreasing so the cummax picks the same last tile).
    end_chunk = ends[chunk_tile_c]                        # [n_slots_c]
    row_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (n_slots_c, chunk), 1)
        + jnp.arange(n_slots_c, dtype=jnp.int32)[:, None] * chunk
        < end_chunk[:, None]).reshape(n_slots_c * chunk)[:cap_padded]

    # padded_gid: padded slot s of tile t takes the contiguous compact
    # rows starting at s*chunk - (aligned_start[t] - start_c[t]); built
    # by a shifted-block-copy Pallas kernel (ops/gid_repack.py) instead
    # of the 1-D pos scatter — the scatter ran at the serial scatter-
    # engine rate and was the hottest binning op (1.46 ms at this
    # scale, BASELINE.md round-3 sub-profile).  Padding rows carry the
    # SENTINEL id N: the packer appends a zero row there (alpha 0 ->
    # no contribution) with no post-gather fixup.
    from .gid_repack import repack_gid
    offset_t = aligned_start - start_c                     # [n_tiles]
    padded_gid = repack_gid(gid_s, chunk_tile, offset_t, ends,
                            cap_padded, chunk, counts.shape[0])

    # VJP maps over the compact domain: off_t = aligned_start - start_c
    # is a cumsum of non-negative per-tile padding amounts, hence
    # NON-DECREASING — the tiny-scatter + cummax fill applies.  Empty
    # tiles share a start_c position; .max resolves to the later tile's
    # (larger) offset, which is the one owning the slot.
    n_surv = jnp.minimum(total, jnp.int32(cap))
    off_fill = jax.lax.cummax(
        jnp.zeros((cap,), jnp.int32).at[
            jnp.clip(start_c, 0, cap - 1)].max(offset_t, mode="drop"))
    riota = jnp.arange(cap, dtype=jnp.int32)
    vjp_gid = jnp.where(riota < n_surv, gid_s,
                        jnp.int32(counts.shape[0]))
    vjp_pos = jnp.minimum(riota + off_fill, cap_padded - 1)
    return BinnedTiles(padded_gid=padded_gid, row_valid=row_valid,
                       starts=starts, ends=ends, total=total,
                       gid_cum=gid_cum, chunk_tile=chunk_tile,
                       padded_total=padded_total,
                       vjp_gid=vjp_gid, vjp_pos=vjp_pos)
