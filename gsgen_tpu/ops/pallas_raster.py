"""Pallas TPU kernels: fused tile compositing, forward + backward.

The performance path — the TPU equivalent of the reference CUDA
extension's compositing kernels (gs/src/include/vol_render.h +
vol_render_scalar.h in gsgen3d/gsgen).  Semantics are identical to
:mod:`gsgen_tpu.ops.rasterize` (the XLA backend) and the dense oracle;
the kernel replaces the CUDA design like so:

* one CUDA block per tile -> one (sequentially pipelined) grid step per
  tile; 256 threads -> [P=tile², K=chunk] VPU vectors,
* 48 KB shared-memory streaming (``carry``, vol_render.h:441-467) ->
  forward: double-buffered async DMA of chunk slices from HBM;
  backward: a flat grid over chunk SLOTS with auto-pipelined blocks
  (one slot per grid step; tile carries persist in VMEM scratch and
  reset when the prefetched slot->tile map changes — ~2x cheaper per
  chunk than a manual DMA loop, see BASELINE.md ablations),
* per-pixel sequential compositing -> exclusive cumprod over the chunk
  axis (Hillis-Steele via lane rolls; Mosaic has no native cumprod),
* weighted feature accumulation -> one MXU matmul per chunk,
* backward atomicAdd into global grads (vol_render.h:28-46) -> each
  chunk slot owns its block of the duplicate-gradient buffer,
  deterministic by construction,
* the ``(final − accum)/(1−αG)`` suffix trick of the CUDA backward
  (vol_render.h:383-399) -> an in-chunk inclusive cumsum of
  ``w·(g·feat)`` plus a running prefix, no checkpoint storage.

Data layouts (chosen so no array needs lane padding in HBM):
  dup    [16, cap]        rows: mx my ca cb cc alpha f0..f9
  out    [n_tiles, 8, P]  rows: f0..F-1, then T at row F
  grads  [16, cap]        same rows as dup

Forward early-exits a tile when every pixel's transmittance is below
``T_thresh`` and records the number of chunks it processed in the spare
output row; the backward pass computes ONLY those chunks (the fwd and
bwd transmittance recurrences are identical, so chunks the forward
skipped have exactly-zero gradients — their slots are zero-filled
in-kernel).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import BinnedTiles
from .oracle import ALPHA_CLAMP, DEFAULT_T_THRESH, MIN_RENDER_ALPHA

D_ROWS = 16          # dup/grad row count (multiple of 8 sublanes)
CH_OUT = 8           # default output channel rows (F feats + T + exit
                     # count); widens to 16 when F > 6 (PBR normal
                     # channels etc.) — see _make_core
MAX_F = D_ROWS - 6   # feats capacity: 6 geometry rows + F feats must
                     # fit the dup table


def _excl_cumprod_lanes(x: jax.Array) -> jax.Array:
    """Exclusive cumulative product along axis 1 (lanes)."""
    K = x.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    sh = 1
    while sh < K:
        acc = acc * jnp.where(col >= sh, pltpu.roll(acc, sh, axis=1), 1.0)
        sh *= 2
    return jnp.where(col >= 1, pltpu.roll(acc, 1, axis=1), 1.0)


def _excl_cumprod_mxu(x: jax.Array) -> jax.Array:
    """Exclusive lane cumprod as ONE MXU matmul: exp((log x) @ U_strict).

    Replaces the log2(K) Hillis-Steele roll/mul levels (the serial-VPU
    hot spot of both kernels) with a [P,K]x[K,K] contraction.

    NUMERICS (measured on-chip): the TPU's log carries ~1e-4-class
    absolute error and ~128 of them sum in the matmul, so the chunk
    prefix products come back with up to ~4e-3 relative error on
    unsaturated pixels.  That is why this is used for the BACKWARD
    only by default (grad rel err ~1.7e-3, inside every parity gate)
    while the forward image keeps the exact lane scan; the forward can
    opt in via ``fast_fwd_cumprod`` when a ~1-LSB(8bit) image error is
    acceptable for a ~30%% faster forward.
    """
    K = x.shape[1]
    r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tri = (r < c).astype(jnp.float32)
    s = jax.lax.dot_general(jnp.log(x), tri,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.exp(s)


def _incl_cumsum_mxu(x: jax.Array) -> jax.Array:
    """Inclusive lane cumsum as one MXU matmul: x @ U (r <= c)."""
    K = x.shape[1]
    r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tri = (r <= c).astype(jnp.float32)
    return jax.lax.dot_general(x, tri,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _incl_cumsum_lanes(x: jax.Array) -> jax.Array:
    """Inclusive cumulative sum along axis 1 (lanes)."""
    K = x.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    sh = 1
    while sh < K:
        acc = acc + jnp.where(col >= sh, pltpu.roll(acc, sh, axis=1), 0.0)
        sh *= 2
    return acc


def _update_T(T_col, om, cp_excl, processed):
    """T' = T * prod of om over PROCESSED lanes — exact, transcendental-
    free: the post-lane transmittance q_k = cp_excl_k * om_k is
    monotonically decreasing in k, so the product over the processed
    prefix is simply min over processed lanes of q_k (and 1 when no lane
    was processed).  Replaces an exp-sum-log fallback that (a) ran
    UNCONDITIONALLY every chunk and (b) carried the TPU's 1e-4-class
    transcendental error into saturated pixels' T output."""
    q = jnp.where(processed, cp_excl * om, jnp.inf)
    prod_eff = jnp.minimum(jnp.min(q, axis=1, keepdims=True), 1.0)
    return T_col * prod_eff


def _chunk_weights(d, pixx, pixy, T_col, T_thresh, mxu_scans=False,
                   lane_valid=None):
    """Shared fwd/bwd chunk math.

    d: [D_ROWS, K] chunk slice; pixx/pixy: [P, 1]; T_col: [P, 1].
    ``lane_valid`` [1, K] masks lanes outside the tile's segment in the
    COMPACT layout (boundary windows hold the neighbor tile's rows).
    Returns (G, aG, om, T_run, processed, w) — all [P, K] — matching
    oracle.composite_dense semantics exactly.
    """
    mx, my = d[0:1, :], d[1:2, :]
    ca, cb, cc = d[2:3, :], d[3:4, :], d[4:5, :]
    al = d[5:6, :]
    dx = pixx - mx                       # [P, K]
    dy = pixy - my
    radial = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
    radial = jnp.maximum(radial, 0.0)
    G = jnp.exp(-0.5 * radial)
    a_cl = jnp.minimum(al, ALPHA_CLAMP)
    aG = a_cl * G
    aG = jnp.where(aG < MIN_RENDER_ALPHA, 0.0, aG)
    if lane_valid is not None:
        aG = jnp.where(lane_valid, aG, 0.0)
    om = 1.0 - aG
    cp_excl = (_excl_cumprod_mxu(om) if mxu_scans
               else _excl_cumprod_lanes(om))
    T_run = T_col * cp_excl
    processed = T_run >= T_thresh
    w = jnp.where(processed, aG * T_run, 0.0)
    return dx, dy, radial, G, a_cl, aG, om, cp_excl, T_run, processed, w


def _pix_coords(t, geom_ref, tile_size, n_tiles_w):
    """Camera-plane coordinates of this tile's pixels, as [P, 1] columns."""
    P = tile_size * tile_size
    ty = t // n_tiles_w
    tx = t - ty * n_tiles_w
    pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (pid % tile_size) + tx * tile_size       # global pixel x
    py = (pid // tile_size) + ty * tile_size
    tlx, tly = geom_ref[0], geom_ref[1]
    psx, psy = geom_ref[2], geom_ref[3]
    pixx = tlx + px.astype(jnp.float32) * psx
    pixy = tly + py.astype(jnp.float32) * psy
    return pixx, pixy


def _fwd_kernel(starts_ref, ends_ref, nchunks_ref, geom_ref, dup_ref,
                out_ref, buf, sem, *, tile_size, n_tiles_w, K, F, ch_out,
                T_thresh, fast_cumprod=False, compact=False):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = ends_ref[t]
    nck = nchunks_ref[t]
    P = tile_size * tile_size
    pixx, pixy = _pix_coords(t, geom_ref, tile_size, n_tiles_w)
    # compact layout: walk K-aligned WINDOWS covering [start, end);
    # boundary lanes masked (they hold the neighbor tile's rows)
    base = (start // K) * K if compact else start
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    def dma(slot, i):
        idx = pl.multiple_of(base + i * K, K)
        return pltpu.make_async_copy(dup_ref.at[:, pl.ds(idx, K)],
                                     buf.at[slot], sem.at[slot])

    @pl.when(nck > 0)
    def _():
        dma(0, 0).start()

    def cond(c):
        i, T_col, acc = c
        return (i < nck) & (jnp.max(T_col) >= T_thresh)

    def body(c):
        i, T_col, acc = c
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nck)
        def _():
            dma(jax.lax.rem(i + 1, 2), i + 1).start()

        dma(slot, i).wait()
        d = buf[slot]                                    # [D_ROWS, K]
        lv = None
        if compact:
            row = base + i * K + lane
            lv = (row >= start) & (row < end)
        (_, _, _, _, _, _, om, cp_excl, _, processed, w) = _chunk_weights(
            d, pixx, pixy, T_col, T_thresh, fast_cumprod, lane_valid=lv)
        fe = d[6:6 + F, :]                               # [F, K]
        # acc[F, P] += fe @ w^T   (contraction over K on the MXU)
        acc = acc + jax.lax.dot_general(
            fe, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        T_col = _update_T(T_col, om, cp_excl, processed)
        return i + 1, T_col, acc

    T0 = jnp.ones((P, 1), jnp.float32)
    acc0 = jnp.zeros((F, P), jnp.float32)
    i_fin, T_col, acc = jax.lax.while_loop(cond, body,
                                           (jnp.int32(0), T0, acc0))

    # early exit leaves the next chunk's prefetch in flight — drain it,
    # or the next grid step's wait consumes a stale semaphore signal
    @pl.when(i_fin < nck)
    def _():
        dma(jax.lax.rem(i_fin, 2), i_fin).wait()

    out_ref[0, 0:F, :] = acc
    out_ref[0, F:F + 1, :] = jnp.transpose(T_col)        # [1, P]
    if F + 2 < ch_out:
        out_ref[0, F + 1:ch_out - 1, :] = jnp.zeros(
            (ch_out - F - 2, P), jnp.float32)
    # spare row: chunks actually processed (early exit included) — the
    # backward pass bounds its walk with this (exact int in fp32: < 2^24)
    out_ref[0, ch_out - 1:ch_out, :] = jnp.full(
        (1, P), i_fin.astype(jnp.float32))


def _bwd_kernel(chunk_tile_ref, starts_ref, nchunks_ref, nckeff_ref,
                geom_ref, dup_ref, out_ref, g_ref, grad_ref, T_sc, S_sc,
                *, tile_size, n_tiles_w, K, F, ch_out, T_thresh):
    """One grid step per CHUNK SLOT (not per tile).

    The per-tile design (grid over tiles, manual double-buffered DMA
    loop over chunks) cost ~2.8 us per chunk-iteration nearly
    independent of the body — semaphore waits, VMEM buffer juggling and
    loop mechanics, not arithmetic (see BASELINE.md ablations).  A flat
    grid over chunk slots lets the Pallas pipeline prefetch the dup
    block and drain the grad block automatically (~1.4 us/slot measured
    with this full body).  Tile state (running transmittance column and
    the suffix-trick dot accumulator) lives in VMEM scratch that
    persists across grid steps and resets when ``chunk_tile`` changes —
    slots of one tile are consecutive by construction.
    """
    i = pl.program_id(0)
    t = chunk_tile_ref[i]
    local = i - starts_ref[t] // K
    # walk only the chunks the forward actually processed: the fwd and
    # bwd transmittance recurrences are identical, so chunks the forward
    # early-exited past have exactly-zero gradients
    nck = jnp.minimum(nchunks_ref[t], nckeff_ref[t])
    P = tile_size * tile_size

    is_new = jnp.logical_or(
        i == 0, chunk_tile_ref[jnp.maximum(i - 1, 0)] != t)

    @pl.when(is_new)
    def _():
        T_sc[...] = jnp.ones((P, 1), jnp.float32)
        S_sc[...] = jnp.zeros((P, 1), jnp.float32)

    live = (local >= 0) & (local < nck)

    @pl.when(live)
    def _():
        pixx, pixy = _pix_coords(t, geom_ref, tile_size, n_tiles_w)
        g_all = g_ref[0]                             # [CH_OUT, P]
        o_all = out_ref[0]
        gfe = g_all[0:F, :]                          # [F, P] feats cotangent
        # dot(g, final_feats) and g_T * T_final, per pixel, [P, 1] columns
        dotfinal_row = jnp.sum(gfe * o_all[0:F, :], axis=0, keepdims=True)
        gT_Tf_row = g_all[F:F + 1, :] * o_all[F:F + 1, :]
        two = jnp.concatenate([dotfinal_row, gT_Tf_row], axis=0)  # [2, P]
        twoT = jnp.transpose(two)                    # [P, 2]
        dotfinal = twoT[:, 0:1]
        gT_Tf = twoT[:, 1:2]

        T_col = T_sc[...]
        Sdot = S_sc[...]
        d = dup_ref[...]                             # [D_ROWS, K] block
        (dx, dy, radial, G, a_cl, aG, om, cp_excl, T_run, processed,
         w) = _chunk_weights(d, pixx, pixy, T_col, T_thresh)
        fe = d[6:6 + F, :]
        al = d[5:6, :]

        # gof[p,k] = sum_f g[f,p] fe[f,k]
        gof = jax.lax.dot_general(
            gfe, fe, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [P, K]
        e = w * gof
        accum_dot = Sdot + _incl_cumsum_lanes(e)     # dot(g, accum thru k)
        suffix = dotfinal - accum_dot
        # d loss / d aG (vol_render.h:383-399 trick, fully vectorized)
        om_safe = jnp.maximum(om, 1e-6)
        daG = jnp.where(processed & (aG > 0.0),
                        gof * T_run - (suffix + gT_Tf) / om_safe,
                        0.0)

        # chain rule to per-duplicate grads (reductions over pixels)
        dalpha = jnp.sum(daG * G, axis=0, keepdims=True) \
            * (al < ALPHA_CLAMP)                      # [1, K]
        dG = daG * a_cl
        dr = jnp.where(radial > 0.0, -0.5 * G * dG, 0.0)
        ca, cb, cc = d[2:3, :], d[3:4, :], d[4:5, :]
        dmx = jnp.sum(dr * -(2.0 * ca * dx + 2.0 * cb * dy),
                      axis=0, keepdims=True)
        dmy = jnp.sum(dr * -(2.0 * cb * dx + 2.0 * cc * dy),
                      axis=0, keepdims=True)
        dca = jnp.sum(dr * dx * dx, axis=0, keepdims=True)
        dcb = jnp.sum(dr * 2.0 * dx * dy, axis=0, keepdims=True)
        dcc = jnp.sum(dr * dy * dy, axis=0, keepdims=True)
        dfe = jax.lax.dot_general(
            gfe, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [F, K]

        grad_ref[0:1, :] = dmx
        grad_ref[1:2, :] = dmy
        grad_ref[2:3, :] = dca
        grad_ref[3:4, :] = dcb
        grad_ref[4:5, :] = dcc
        grad_ref[5:6, :] = dalpha
        grad_ref[6:6 + F, :] = dfe
        if 6 + F < D_ROWS:
            grad_ref[6 + F:, :] = jnp.zeros((D_ROWS - 6 - F, K),
                                            jnp.float32)
        T_sc[...] = _update_T(T_col, om, cp_excl, processed)
        S_sc[...] = Sdot + jnp.sum(e, axis=1, keepdims=True)

    # dead slots (padding past a tile's segment, or past the forward's
    # early-exit chunk count): gradients are exactly zero — written here
    # instead of a caller-side mask pass
    @pl.when(jnp.logical_not(live))
    def _():
        grad_ref[...] = jnp.zeros((D_ROWS, K), jnp.float32)


def _bwd_kernel_v2(chunk_tile_ref, starts_ref, nchunks_ref, nckeff_ref,
                   geom_ref, dup_ref, gpack_ref, grad_ref, T_sc, S_sc, D_sc,
                   *, tile_size, n_tiles_w, K, F, ch_out, T_thresh, blk,
                   mxu_scans):
    """Resident-cotangent, multi-chunk backward.

    Deltas from :func:`_bwd_kernel` (kept as the large-image fallback),
    each attacking a measured per-slot fixed cost (BASELINE.md round-3
    profile: 5.0 ms / 1.6 us per slot):

    * the whole per-tile cotangent state lives VMEM-RESIDENT as one
      ``gpack [n_tiles, ch_out, P]`` array (rows 0..F-1 = feature
      cotangents; row ch_out-2 = dot(g, final_feats); row ch_out-1 =
      g_T * T_final, both XLA-precomputed) — no per-slot out/cotangent
      block streams, no per-slot [P,2] transpose (done once per tile
      into scratch on tile change),
    * ``blk`` chunk slots per grid step amortize per-step pipeline
      mechanics; sub-chunks keep the exact per-chunk recurrence,
    * one fused [D_ROWS, K] store per sub-chunk instead of 16 row
      stores,
    * optional MXU scans (one [P,K]x[K,K] matmul replaces the log2(K)
      Hillis-Steele roll levels).
    """
    i = pl.program_id(0)
    P = tile_size * tile_size

    for b in range(blk):
        idx = i * blk + b
        t = chunk_tile_ref[idx]
        local = idx - starts_ref[t] // K
        nck = jnp.minimum(nchunks_ref[t], nckeff_ref[t])

        is_new = jnp.logical_or(
            idx == 0, chunk_tile_ref[jnp.maximum(idx - 1, 0)] != t)

        @pl.when(is_new)
        def _():
            T_sc[...] = jnp.ones((P, 1), jnp.float32)
            S_sc[...] = jnp.zeros((P, 1), jnp.float32)
            D_sc[...] = jnp.transpose(gpack_ref[t, ch_out - 2:ch_out, :])

        live = (local >= 0) & (local < nck)

        @pl.when(live)
        def _():
            pixx, pixy = _pix_coords(t, geom_ref, tile_size, n_tiles_w)
            gfe = gpack_ref[t, 0:F, :]               # [F, P]
            dotfinal = D_sc[:, 0:1]
            gT_Tf = D_sc[:, 1:2]

            T_col = T_sc[...]
            Sdot = S_sc[...]
            d = dup_ref[:, b * K:(b + 1) * K]        # [D_ROWS, K]
            (dx, dy, radial, G, a_cl, aG, om, cp_excl, T_run, processed,
             w) = _chunk_weights(d, pixx, pixy, T_col, T_thresh, mxu_scans)
            fe = d[6:6 + F, :]
            al = d[5:6, :]

            gof = jax.lax.dot_general(
                gfe, fe, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [P, K]
            e = w * gof
            incl = _incl_cumsum_mxu(e) if mxu_scans else \
                _incl_cumsum_lanes(e)
            accum_dot = Sdot + incl
            suffix = dotfinal - accum_dot
            om_safe = jnp.maximum(om, 1e-6)
            daG = jnp.where(processed & (aG > 0.0),
                            gof * T_run - (suffix + gT_Tf) / om_safe,
                            0.0)

            dalpha = jnp.sum(daG * G, axis=0, keepdims=True) \
                * (al < ALPHA_CLAMP)
            dG = daG * a_cl
            dr = jnp.where(radial > 0.0, -0.5 * G * dG, 0.0)
            ca, cb, cc = d[2:3, :], d[3:4, :], d[4:5, :]
            dmx = jnp.sum(dr * -(2.0 * ca * dx + 2.0 * cb * dy),
                          axis=0, keepdims=True)
            dmy = jnp.sum(dr * -(2.0 * cb * dx + 2.0 * cc * dy),
                          axis=0, keepdims=True)
            dca = jnp.sum(dr * dx * dx, axis=0, keepdims=True)
            dcb = jnp.sum(dr * 2.0 * dx * dy, axis=0, keepdims=True)
            dcc = jnp.sum(dr * dy * dy, axis=0, keepdims=True)
            dfe = jax.lax.dot_general(
                gfe, w, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [F, K]

            pad = jnp.zeros((D_ROWS - 6 - F, K), jnp.float32)
            grad_ref[:, b * K:(b + 1) * K] = jnp.concatenate(
                [dmx, dmy, dca, dcb, dcc, dalpha, dfe, pad], axis=0)
            T_sc[...] = _update_T(T_col, om, cp_excl, processed)
            S_sc[...] = Sdot + jnp.sum(e, axis=1, keepdims=True)

        @pl.when(jnp.logical_not(live))
        def _():
            grad_ref[:, b * K:(b + 1) * K] = jnp.zeros((D_ROWS, K),
                                                       jnp.float32)




def _bwd_kernel_v3(step_tile_ref, step_window_ref, starts_ref, ends_ref,
                   wcount_ref, nckeff_ref, geom_ref, dup_ref, gpack_ref,
                   grad_ref, T_sc, S_sc, D_sc, *, tile_size, n_tiles_w,
                   n_tiles, K, F, ch_out, T_thresh, mxu_scans):
    """Compact-layout backward: one grid step per (tile, window) pair.

    The compact table has NO alignment padding: tile t's rows live at
    [starts[t], ends[t]) and adjacent tiles SHARE boundary windows at
    disjoint lanes.  The step list (from binning) is non-decreasing in
    window, so a shared window's two visits are consecutive grid steps
    hitting the SAME output block — Pallas keeps it VMEM-resident, and
    the second visitor merges its lanes into the first's (no adds
    needed: writers own disjoint lanes).  Sentinel steps (tile ==
    n_tiles) zero-fill any tail blocks they open.

    This deletes the padded layout's pos-scatter/offset-fill/row-valid
    machinery from binning and shrinks the pack gather to the compact
    domain — the two serial-engine stages the round-3 profile put at
    ~2.2 ms (BASELINE.md).
    """
    j = pl.program_id(0)
    t = step_tile_ref[j]
    w = step_window_ref[j]
    P = tile_size * tile_size

    prev = jnp.maximum(j - 1, 0)
    first_visit = jnp.logical_or(j == 0, step_window_ref[prev] != w)
    new_tile = jnp.logical_or(j == 0, step_tile_ref[prev] != t)
    known = t < n_tiles
    ts = jnp.where(known, t, 0)
    start = starts_ref[ts]
    end = ends_ref[ts]
    local = w - start // K
    nck = jnp.minimum(wcount_ref[ts], nckeff_ref[ts])
    live = known & (local >= 0) & (local < nck)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    row = w * K + lane
    lane_valid = (row >= start) & (row < end) & known
    mask16 = jnp.broadcast_to(lane_valid, (D_ROWS, K))

    @pl.when(known & new_tile)
    def _():
        T_sc[...] = jnp.ones((P, 1), jnp.float32)
        S_sc[...] = jnp.zeros((P, 1), jnp.float32)
        D_sc[...] = jnp.transpose(gpack_ref[ts, ch_out - 2:ch_out, :])

    @pl.when(live)
    def _():
        pixx, pixy = _pix_coords(ts, geom_ref, tile_size, n_tiles_w)
        gfe = gpack_ref[ts, 0:F, :]
        dotfinal = D_sc[:, 0:1]
        gT_Tf = D_sc[:, 1:2]

        T_col = T_sc[...]
        Sdot = S_sc[...]
        d = dup_ref[...]
        (dx, dy, radial, G, a_cl, aG, om, cp_excl, T_run, processed,
         wgt) = _chunk_weights(d, pixx, pixy, T_col, T_thresh, mxu_scans,
                               lane_valid=lane_valid)
        fe = d[6:6 + F, :]
        al = d[5:6, :]

        gof = jax.lax.dot_general(
            gfe, fe, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        e = wgt * gof
        incl = _incl_cumsum_mxu(e) if mxu_scans else _incl_cumsum_lanes(e)
        accum_dot = Sdot + incl
        suffix = dotfinal - accum_dot
        om_safe = jnp.maximum(om, 1e-6)
        daG = jnp.where(processed & (aG > 0.0),
                        gof * T_run - (suffix + gT_Tf) / om_safe, 0.0)

        dalpha = jnp.sum(daG * G, axis=0, keepdims=True) \
            * (al < ALPHA_CLAMP)
        dG = daG * a_cl
        dr = jnp.where(radial > 0.0, -0.5 * G * dG, 0.0)
        ca, cb, cc = d[2:3, :], d[3:4, :], d[4:5, :]
        dmx = jnp.sum(dr * -(2.0 * ca * dx + 2.0 * cb * dy),
                      axis=0, keepdims=True)
        dmy = jnp.sum(dr * -(2.0 * cb * dx + 2.0 * cc * dy),
                      axis=0, keepdims=True)
        dca = jnp.sum(dr * dx * dx, axis=0, keepdims=True)
        dcb = jnp.sum(dr * 2.0 * dx * dy, axis=0, keepdims=True)
        dcc = jnp.sum(dr * dy * dy, axis=0, keepdims=True)
        dfe = jax.lax.dot_general(
            gfe, wgt, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        pad = jnp.zeros((D_ROWS - 6 - F, K), jnp.float32)
        mine = jnp.concatenate([dmx, dmy, dca, dcb, dcc, dalpha, dfe, pad],
                               axis=0)
        # single-visitor windows (the common case) write without reading
        # the output block back — the read would serialize the output
        # pipeline on every step instead of only at shared boundaries
        @pl.when(first_visit)
        def _():
            grad_ref[...] = jnp.where(mask16, mine, 0.0)

        @pl.when(jnp.logical_not(first_visit))
        def _():
            grad_ref[...] = jnp.where(mask16, mine, grad_ref[...])
        T_sc[...] = _update_T(T_col, om, cp_excl, processed)
        S_sc[...] = Sdot + jnp.sum(e, axis=1, keepdims=True)

    # not-live visitors still own their lanes (early-exited windows have
    # exactly-zero grads) or must zero-initialize a freshly opened block
    @pl.when(jnp.logical_not(live) & first_visit)
    def _():
        grad_ref[...] = jnp.where(mask16, 0.0, 0.0)

    @pl.when(jnp.logical_not(live) & jnp.logical_not(first_visit))
    def _():
        grad_ref[...] = jnp.where(mask16, 0.0, grad_ref[...])


@functools.lru_cache(maxsize=None)
def _make_core_compact(n_tiles: int, n_tiles_w: int, tile_size: int,
                       K: int, F: int, cap: int, n_steps: int,
                       T_thresh: float, interpret: bool,
                       mxu_scans: bool = True,
                       fast_fwd_cumprod: bool = False):
    """custom_vjp kernel pair over the COMPACT (padding-free) layout."""
    P = tile_size * tile_size
    ch_out = 8 if F + 2 <= 8 else 16
    assert n_tiles * ch_out * P * 4 <= _RESIDENT_BUDGET, \
        "compact layout requires the resident-cotangent backward"

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, tile_size=tile_size,
                          n_tiles_w=n_tiles_w, K=K, F=F, ch_out=ch_out,
                          T_thresh=T_thresh, fast_cumprod=fast_fwd_cumprod,
                          compact=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,      # starts, ends, wcount
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # geom
                pl.BlockSpec(memory_space=pl.ANY),       # dup [16, cap]
            ],
            out_specs=pl.BlockSpec((1, ch_out, P), lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, D_ROWS, K), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ]),
        out_shape=jax.ShapeDtypeStruct((n_tiles, ch_out, P), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel_v3, tile_size=tile_size,
                          n_tiles_w=n_tiles_w, n_tiles=n_tiles, K=K, F=F,
                          ch_out=ch_out, T_thresh=T_thresh,
                          mxu_scans=mxu_scans),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            # step_tile, step_window, starts, ends, wcount, nckeff
            num_scalar_prefetch=6,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # geom
                pl.BlockSpec((D_ROWS, K),
                             lambda j, st, sw, *_: (0, sw[j])),   # dup
                pl.BlockSpec(memory_space=pltpu.VMEM),   # gpack resident
            ],
            out_specs=pl.BlockSpec((D_ROWS, K),
                                   lambda j, st, sw, *_: (0, sw[j])),
            scratch_shapes=[
                pltpu.VMEM((P, 1), jnp.float32),
                pltpu.VMEM((P, 1), jnp.float32),
                pltpu.VMEM((P, 2), jnp.float32),
            ]),
        out_shape=jax.ShapeDtypeStruct((D_ROWS, cap), jnp.float32),
        interpret=interpret,
        # shared boundary windows merge via output-block revisiting:
        # strictly sequential
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    @jax.custom_vjp
    def core(dup, step_tile, step_window, starts, ends, wcount, geom):
        return fwd_call(starts, ends, wcount, geom, dup)

    def core_fwd(dup, step_tile, step_window, starts, ends, wcount, geom):
        out = fwd_call(starts, ends, wcount, geom, dup)
        return out, (dup, step_tile, step_window, starts, ends, wcount,
                     geom, out)

    def core_bwd(res, g):
        (dup, step_tile, step_window, starts, ends, wcount, geom,
         out) = res
        nckeff = out[:, ch_out - 1, 0].astype(jnp.int32)
        dotfinal = jnp.sum(g[:, 0:F, :] * out[:, 0:F, :], axis=1)
        gT_Tf = g[:, F, :] * out[:, F, :]
        gpack = g.at[:, ch_out - 2, :].set(dotfinal)
        gpack = gpack.at[:, ch_out - 1, :].set(gT_Tf)
        dgrad = bwd_call(step_tile, step_window, starts, ends, wcount,
                         nckeff, geom, dup, gpack)
        return dgrad, None, None, None, None, None, None

    core.defvjp(core_fwd, core_bwd)
    return core


# resident-gpack bwd needs n_tiles * ch_out * P * 4 bytes of VMEM for the
# cotangent array; beyond this budget fall back to the streaming kernel
_RESIDENT_BUDGET = 9 * 1024 * 1024


@functools.lru_cache(maxsize=None)
def _make_core(n_tiles: int, n_tiles_w: int, tile_size: int, K: int, F: int,
               cap: int, T_thresh: float, interpret: bool,
               blk: int = 1, mxu_scans: bool = True,
               fast_fwd_cumprod: bool = False):
    """Build the custom_vjp'd kernel pair for one static configuration."""
    P = tile_size * tile_size
    # output rows: F feats + T + early-exit count, padded to a sublane
    # multiple; the standard 5-channel render keeps the narrow 8-row
    # buffer, PBR/normal configs (F up to 10) use 16
    ch_out = 8 if F + 2 <= 8 else 16

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, tile_size=tile_size,
                          n_tiles_w=n_tiles_w, K=K, F=F, ch_out=ch_out,
                          T_thresh=T_thresh, fast_cumprod=fast_fwd_cumprod),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,      # starts, ends, nchunks
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # geom [4]
                pl.BlockSpec(memory_space=pl.ANY),       # dup [16, cap]
            ],
            out_specs=pl.BlockSpec((1, ch_out, P), lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, D_ROWS, K), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ]),
        out_shape=jax.ShapeDtypeStruct((n_tiles, ch_out, P), jnp.float32),
        interpret=interpret,
        # tiles are independent: let megacore parts split the grid
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )

    n_slots = cap // K
    resident = n_tiles * ch_out * P * 4 <= _RESIDENT_BUDGET \
        and n_slots % blk == 0
    if resident:
        bwd_call = pl.pallas_call(
            functools.partial(_bwd_kernel_v2, tile_size=tile_size,
                              n_tiles_w=n_tiles_w, K=K, F=F, ch_out=ch_out,
                              T_thresh=T_thresh, blk=blk,
                              mxu_scans=mxu_scans),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,  # chunk_tile, starts, nchunks, nckeff
                grid=(n_slots // blk,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),   # geom
                    pl.BlockSpec((D_ROWS, blk * K),
                                 lambda i, ct, *_: (0, i)),  # dup block
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # gpack resident
                ],
                out_specs=pl.BlockSpec((D_ROWS, blk * K),
                                       lambda i, ct, *_: (0, i)),
                scratch_shapes=[
                    pltpu.VMEM((P, 1), jnp.float32),   # running T
                    pltpu.VMEM((P, 1), jnp.float32),   # suffix-dot acc
                    pltpu.VMEM((P, 2), jnp.float32),   # per-tile columns
                ]),
            out_shape=jax.ShapeDtypeStruct((D_ROWS, cap), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )
    else:
        bwd_call = pl.pallas_call(
            functools.partial(_bwd_kernel, tile_size=tile_size,
                              n_tiles_w=n_tiles_w, K=K, F=F, ch_out=ch_out,
                              T_thresh=T_thresh),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,  # chunk_tile, starts, nchunks, nckeff
                grid=(n_slots,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),   # geom
                    pl.BlockSpec((D_ROWS, K), lambda i, ct, *_: (0, i)),
                    pl.BlockSpec((1, ch_out, P),
                                 lambda i, ct, *_: (ct[i], 0, 0)),  # fwd out
                    pl.BlockSpec((1, ch_out, P),
                                 lambda i, ct, *_: (ct[i], 0, 0)),  # cotan
                ],
                out_specs=pl.BlockSpec((D_ROWS, K),
                                       lambda i, ct, *_: (0, i)),
                scratch_shapes=[
                    pltpu.VMEM((P, 1), jnp.float32),
                    pltpu.VMEM((P, 1), jnp.float32),
                ]),
            out_shape=jax.ShapeDtypeStruct((D_ROWS, cap), jnp.float32),
            interpret=interpret,
            # the tile carries (T_sc/S_sc) persist across grid steps: the
            # slot grid MUST run sequentially, never megacore-split
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )

    @jax.custom_vjp
    def core(dup, chunk_tile, starts, ends, nchunks, geom):
        return fwd_call(starts, ends, nchunks, geom, dup)

    def core_fwd(dup, chunk_tile, starts, ends, nchunks, geom):
        out = fwd_call(starts, ends, nchunks, geom, dup)
        return out, (dup, chunk_tile, starts, nchunks, geom, out)

    def core_bwd(res, g):
        dup, chunk_tile, starts, nchunks, geom, out = res
        nckeff = out[:, ch_out - 1, 0].astype(jnp.int32)
        if resident:
            # gpack: rows 0..F-1 = feature cotangents; row ch_out-2 =
            # dot(g, final feats); row ch_out-1 = g_T * T_final.  The
            # suffix trick needs ONLY these per-tile reductions — the
            # full fwd output never enters the kernel.
            dotfinal = jnp.sum(g[:, 0:F, :] * out[:, 0:F, :], axis=1)
            gT_Tf = g[:, F, :] * out[:, F, :]
            gpack = g.at[:, ch_out - 2, :].set(dotfinal)
            gpack = gpack.at[:, ch_out - 1, :].set(gT_Tf)
            dgrad = bwd_call(chunk_tile, starts, nchunks, nckeff, geom,
                             dup, gpack)
        else:
            dgrad = bwd_call(chunk_tile, starts, nchunks, nckeff, geom,
                             dup, out, g)
        return dgrad, None, None, None, None, None

    core.defvjp(core_fwd, core_bwd)
    return core


def _pack_rows(table, gid, valid):
    """table is [N + 8, 16] with rows N.. all-zero (sentinel block);
    padding slots carry gid == N so they gather zeros — alpha 0 means
    no contribution, no post-gather fixup (a fixup pass was measured to
    DOUBLE the gather cost by breaking fusion).  ``valid`` is unused on
    this path (kept for the signature)."""
    del valid
    return table[gid].T                                         # [16, cap]


def _cumsum_rows_mxu(g: jax.Array) -> jax.Array:
    """Inclusive prefix sum over rows of [cap, C] via two-level MXU
    triangular matmuls in the compact [C, cap] domain.

    ``jnp.cumsum(axis=0)`` on a [cap, 16] array lowers to a reduce-
    window pipeline that re-lays the lane-padded array twice (0.78 ms
    at cap 2^18 in the round-4 trace: fusion.205 + copy.85 + reduce-
    window.190); the transposed view is byte-identical (free) and a
    128-wide inclusive prefix is one upper-triangular 0/1 fp32 matmul
    (products are exact 1.0·v; the summation tree is reassociated,
    same trade the kernels' MXU scans already make).  Group totals get
    a tiny [C, cap/128] cumsum and broadcast back: ~0.2 ms total.
    """
    cap, C = g.shape
    if cap % 128 != 0:
        return jnp.cumsum(g, axis=0)
    ng = cap // 128
    g2 = g.T.reshape(C, ng, 128)                      # free: bytes match
    tri = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
           ).astype(g.dtype)
    intra = jax.lax.dot_general(
        g2, tri, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [C, ng, 128]
    gtot = intra[..., -1]                             # [C, ng]
    gpre_excl = jnp.cumsum(gtot, axis=1) - gtot       # [C, ng] small
    cs = intra + gpre_excl[..., None]
    return cs.reshape(C, cap).T


@jax.custom_vjp
def _pack_seg(table, gid, valid, gid_cum, vjp_gid, vjp_pos):
    return _pack_rows(table, gid, valid)


def _pack_seg_fwd(table, gid, valid, gid_cum, vjp_gid, vjp_pos):
    n = table.shape[0] - 8                   # real Gaussian count
    return (_pack_rows(table, gid, valid),
            (vjp_gid, vjp_pos, gid_cum, n))


def _pack_seg_bwd(res, ddup):
    """Aggregate duplicate-row cotangents back per Gaussian.

    The gather's autodiff transpose is a [cap,16]->[N,16] scatter-add,
    which XLA serializes (~5 ms at 393K rows on v5e — the single
    hottest op of the e2e grad step).  Instead: sort row cotangents by
    Gaussian id (2-operand sort), take a plain inclusive prefix sum,
    and recover each Gaussian's run total as the difference of the
    prefix sums at its run boundaries given by ``gid_cum`` (ONE fast
    row gather: run g's lower boundary IS run g-1's upper boundary —
    ``lo[g] = hi[g-1]`` — so the second boundary gather the round-3
    code ran was redundant; a shift of ``hi`` replaces it, ~0.65 ms at
    the 100K/512² scale.  Empty runs have ``gid_cum[g] == gid_cum[g-1]``
    so ``hi[g] == hi[g-1]`` and the difference is exactly zero — no
    validity mask needed).  Padding rows sort past every valid run
    (sentinel key ``n``), so no boundary read sees them — sound because
    their only analytically nonzero channel (alpha, row 5) is exactly
    the one the forward zeroes for invalid rows.

    A flagged segmented ``associative_scan`` computes the same totals
    without the prefix-difference cancellation, but its log2(cap)
    strided-slice levels made the TPU compile pathological (>15 min at
    cap 2^18); the cumsum form compiles like any other op, and the
    cancellation error (~eps * |prefix| / |run sum|) is orders below
    the fp32 tolerance the gradient-parity tests hold.
    """
    vjp_gid, vjp_pos, gid_cum, n = res
    cap = vjp_gid.shape[0]
    # padding rows already carry the sentinel id n — they sort last.
    # vjp_pos rides the sort as the value operand: the one row-gather
    # below then reads the (possibly larger, alignment-padded) grad
    # buffer directly, so the sort/cumsum/gather domain is the COMPACT
    # row count, not the padded one (round 4: -27%% rows).
    _, pos_s = jax.lax.sort(
        (vjp_gid.astype(jnp.int32), vjp_pos.astype(jnp.int32)),
        num_keys=1, is_stable=True)
    g = ddup.T[pos_s]                                           # [cap, 16]
    cs = _cumsum_rows_mxu(g)
    bound = jnp.clip(gid_cum - 1, 0, cap - 1)
    # gid_cum == 0 (all leading runs empty) would clip bound to row 0 and
    # read a foreign prefix; zero hi there (for later empty runs hi[g] ==
    # hi[g-1] cancels exactly on its own)
    hi = jnp.where((gid_cum > 0)[:, None], cs[bound], 0.0)
    lo = jnp.concatenate(
        [jnp.zeros((1, hi.shape[1]), hi.dtype), hi[:-1]], axis=0)
    dtable = hi - lo
    # cotangent must match the [N + 8, 16] sentinel-padded table
    dtable = jnp.concatenate(
        [dtable, jnp.zeros((8, dtable.shape[1]), dtable.dtype)], axis=0)
    return dtable, None, None, None, None, None


_pack_seg.defvjp(_pack_seg_fwd, _pack_seg_bwd)


def pack_dup(mean2d, conic, alpha, feats, gid, valid, cap: int,
             gid_cum=None, vjp_gid=None, vjp_pos=None):
    """Gather per-duplicate rows into the [16, cap] kernel layout.

    ONE [N, 16] row-gather + transpose instead of 13 separate [cap]
    gathers (~8x cheaper on TPU; random scalar gathers are the slow
    primitive).  Differentiable.  With ``gid_cum`` (from
    ``BinnedTiles.gid_cum``) the backward uses the sort+segment-scan
    aggregation of :func:`_pack_seg_bwd`; without it, the gather's
    autodiff transpose (a deterministic row scatter-add) applies.
    """
    F = feats.shape[-1]
    assert F <= MAX_F
    n = mean2d.shape[0]
    table = jnp.concatenate(
        [mean2d, conic, alpha[:, None], feats,
         jnp.zeros((n, D_ROWS - 6 - F), jnp.float32)], axis=1)  # [N, 16]
    # sentinel block: 8 zero rows (8, not 1 — an odd-sized table
    # deoptimizes the TPU gather, BASELINE.md round-1 negative result)
    table = jnp.concatenate(
        [table, jnp.zeros((8, D_ROWS), jnp.float32)], axis=0)
    # sentinel id for invalid slots (binning already provides it in
    # padded_gid; the where keeps the API honest for any caller) — an
    # INDEX-level mask, unlike the old post-gather alpha fixup which
    # broke gather fusion and doubled its cost
    gid = jnp.where(valid, jnp.minimum(gid, n), n)
    if gid_cum is not None:
        if vjp_gid is None:
            # compact-domain maps not provided: aggregate over the full
            # slot domain (identical to the round-3 behavior)
            vjp_gid = gid
            vjp_pos = jnp.arange(gid.shape[0], dtype=jnp.int32)
        return _pack_seg(table, gid, valid, gid_cum, vjp_gid, vjp_pos)
    return _pack_rows(table, gid, valid)


@functools.partial(
    jax.jit,
    static_argnames=("w", "h", "tile_size", "chunk", "T_thresh", "interpret",
                     "blk", "mxu_scans", "fast_fwd_cumprod"))
def rasterize_tiles_pallas(
    mean2d: jax.Array,
    conic: jax.Array,
    alpha: jax.Array,
    feats: jax.Array,
    bins: BinnedTiles,
    topleft: Tuple,
    pixel_size: Tuple,
    *,
    w: int, h: int, tile_size: int, chunk: int,
    T_thresh: float = DEFAULT_T_THRESH,
    interpret: bool = False,
    blk: int = 1,
    mxu_scans: bool = True,
    fast_fwd_cumprod: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for :func:`gsgen_tpu.ops.rasterize.rasterize_tiles`
    backed by the Pallas kernels.  Returns (img [H, W, F], T [H, W])."""
    n_tiles_w = -(-w // tile_size)
    n_tiles_h = -(-h // tile_size)
    n_tiles = n_tiles_w * n_tiles_h
    P = tile_size * tile_size
    F = feats.shape[-1]
    geom = jnp.stack([jnp.float32(topleft[0]), jnp.float32(topleft[1]),
                      jnp.float32(pixel_size[0]), jnp.float32(pixel_size[1])])

    if bins.step_tile is not None:
        # COMPACT layout (production): no alignment padding; kernels
        # walk K-aligned windows with boundary lane masks
        cap = bins.gid_s.shape[0]
        assert cap % chunk == 0
        valid = jnp.ones((cap,), bool)      # sentinel already in gid_s
        dup = pack_dup(mean2d, conic, alpha, feats, bins.gid_s, valid,
                       cap, gid_cum=bins.gid_cum)
        starts = bins.starts.astype(jnp.int32)
        ends = bins.ends.astype(jnp.int32)
        wcount = (ends + chunk - 1) // chunk - starts // chunk
        core = _make_core_compact(
            n_tiles, n_tiles_w, tile_size, chunk, F, cap,
            int(bins.step_tile.shape[0]), float(T_thresh), interpret,
            mxu_scans=bool(mxu_scans),
            fast_fwd_cumprod=bool(fast_fwd_cumprod))
        out = core(dup, bins.step_tile.astype(jnp.int32),
                   bins.step_window.astype(jnp.int32), starts, ends,
                   wcount.astype(jnp.int32), geom)
    else:
        cap = bins.padded_gid.shape[0]
        assert cap % chunk == 0

        dup = pack_dup(mean2d, conic, alpha, feats, bins.padded_gid,
                       bins.row_valid, cap, gid_cum=bins.gid_cum,
                       vjp_gid=bins.vjp_gid, vjp_pos=bins.vjp_pos)
        counts = bins.ends - bins.starts
        nchunks = (counts + chunk - 1) // chunk
        core = _make_core(n_tiles, n_tiles_w, tile_size, chunk, F, cap,
                          float(T_thresh), interpret, blk=int(blk),
                          mxu_scans=bool(mxu_scans),
                          fast_fwd_cumprod=bool(fast_fwd_cumprod))
        out = core(dup, bins.chunk_tile.astype(jnp.int32),
                   bins.starts.astype(jnp.int32),
                   bins.ends.astype(jnp.int32),
                   nchunks.astype(jnp.int32), geom)    # [n_tiles, 8, P]

    img = out[:, :F, :].reshape(n_tiles_h, n_tiles_w, F,
                                tile_size, tile_size)
    img = img.transpose(0, 3, 1, 4, 2).reshape(
        n_tiles_h * tile_size, n_tiles_w * tile_size, F)[:h, :w]
    T = out[:, F, :].reshape(n_tiles_h, n_tiles_w, tile_size, tile_size)
    T = T.transpose(0, 2, 1, 3).reshape(
        n_tiles_h * tile_size, n_tiles_w * tile_size)[:h, :w]
    return img, T
