"""padded_gid via a shifted-copy Pallas kernel instead of a 1-D scatter.

The binning sub-profile (BASELINE.md round 3) puts the ``pos`` scatter
— placing sorted gaussian ids into the chunk-aligned padded layout —
at 1.46 ms, the single hottest binning op, running at the TPU's serial
scatter-engine rate.  But the placement map is STRUCTURED: padded slot
``s`` of tile ``t`` takes the contiguous compact rows
``[s*K - offset_t, ...)`` where ``offset_t = aligned_start - start_c``
is constant per tile.  A Pallas grid over padded slots copies each
slot's source window with two aligned block loads + one dynamic-shift
``pltpu.roll`` (measured exact and ~0.3 us/step — the probe that
validated the compact layout), masking rows past the tile's segment
end with the sentinel id N.

The id array rides as [8, cap] (sublane-broadcast: Mosaic's minimum
sublane tile) — 8x the bytes of the 1-D form but block-streamed at
full HBM rate instead of scatter-engine rate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(floor_ref, shift_ref, ends_ref, tile_ref, a_ref, b_ref,
            out_ref, *, K, sentinel):
    i = pl.program_id(0)
    two = jnp.concatenate([a_ref[...], b_ref[...]], axis=1)   # [8, 2K]
    rolled = pltpu.roll(two, -shift_ref[i], axis=1)[:, :K]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    row = i * K + lane
    valid = row < ends_ref[tile_ref[i]]
    out_ref[...] = jnp.where(valid, rolled, sentinel)


@functools.lru_cache(maxsize=None)
def _make_call(cap: int, cap_padded: int, K: int, sentinel: int,
               interpret: bool):
    n_slots = cap_padded // K
    return pl.pallas_call(
        functools.partial(_kernel, K=K, sentinel=sentinel),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,     # floor, shift, ends, chunk_tile
            grid=(n_slots,),
            in_specs=[
                pl.BlockSpec((8, K), lambda i, fl, *_: (0, fl[i])),
                pl.BlockSpec((8, K), lambda i, fl, *_: (0, fl[i] + 1)),
            ],
            out_specs=pl.BlockSpec((8, K), lambda i, fl, *_: (0, i))),
        out_shape=jax.ShapeDtypeStruct((8, cap_padded), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


def repack_gid(gid_s: jax.Array, chunk_tile: jax.Array,
               offset_t: jax.Array, ends: jax.Array, cap_padded: int,
               K: int, sentinel: int) -> jax.Array:
    """[cap] sorted ids -> [cap_padded] chunk-aligned layout.

    gid_s: compact sorted gaussian ids; chunk_tile: owning tile per
    padded slot; offset_t: aligned_start - start_c per tile; ends:
    padded segment ends.  Exact replacement for the pos scatter.
    """
    cap = gid_s.shape[0]
    n_slots = cap_padded // K
    # [8, cap + K]: sublane broadcast + one sentinel chunk so the
    # floor+1 block index never leaves the array
    gid8 = jnp.broadcast_to(gid_s[None, :], (8, cap))
    gid8 = jnp.concatenate(
        [gid8, jnp.full((8, K), sentinel, jnp.int32)], axis=1)

    slot = jnp.arange(n_slots, dtype=jnp.int32)
    src0 = jnp.clip(slot * K - offset_t[chunk_tile], 0, cap - 1)
    floor = src0 // K
    shift = src0 - floor * K

    interpret = jax.default_backend() == "cpu"
    call = _make_call(cap, cap_padded, K, sentinel, interpret)
    out = call(floor.astype(jnp.int32), shift.astype(jnp.int32),
               ends.astype(jnp.int32), chunk_tile.astype(jnp.int32),
               gid8, gid8)
    return out[0]
