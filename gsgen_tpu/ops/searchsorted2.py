"""Two-level searchsorted for many queries into a large sorted array.

``jnp.searchsorted`` lowers to a full log2(n) bisection: each step is a
device gather of all Q query probes (the binning edges call — 1025
queries into the 262K sorted tile keys — spends 0.28 ms across an
18-iteration while loop in the round-4 trace).  Two levels cut it:

1. bisect a 256-strided SUBSAMPLE (log2(n/256) steps over a tiny
   array),
2. fetch each query's 2x256 candidate window with one aligned row
   gather from the [n/256, 256] view and finish with a broadcast
   compare + popcount — one vector op instead of 8 more bisection
   rounds.

Exact for all inputs (including duplicates and out-of-range queries):
the subsample bisection brackets the true rank inside the fetched
window by construction; the compare counts the remainder.  Role in the
pipeline: computes the per-tile segment edges of the sorted duplicate
table — the TPU replacement for the reference CUDA extension's
per-key tile-range identification after its radix sort
(gs/src/include/aabb_culling.h:235-241 in gsgen3d/gsgen).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_G = 256     # subsample stride / window granule


def searchsorted2(sorted_arr: jax.Array, queries: jax.Array,
                  side: str = "left") -> jax.Array:
    """Ranks of ``queries`` in 1-D non-decreasing ``sorted_arr``.

    Drop-in for ``jnp.searchsorted(sorted_arr, queries, side=side)``
    (int32 result).  Falls back to the stock bisection when the array
    is small or not granule-divisible.
    """
    n = n_orig = sorted_arr.shape[0]
    if n < 4 * _G:
        return jnp.searchsorted(sorted_arr, queries,
                                side=side).astype(jnp.int32)
    if n % _G != 0:
        # pad with the dtype maximum: never counted for any query that
        # a rank into the original array can come from (ranks > n are
        # impossible because every real element is <= the pad value)
        pad = n % _G
        top = (jnp.iinfo(sorted_arr.dtype).max
               if jnp.issubdtype(sorted_arr.dtype, jnp.integer)
               else jnp.inf)
        sorted_arr = jnp.concatenate(
            [sorted_arr,
             jnp.full((_G - pad,), top, sorted_arr.dtype)])
        n = sorted_arr.shape[0]
    nb = n // _G
    sub = sorted_arr[::_G]                                  # [nb]
    # rank among subsamples brackets the true rank:
    #   side left : #{sub < q}  -> true rank in (G*(r-1), G*r]
    #   side right: #{sub <= q} -> same bracket for the <=-count
    r = jnp.searchsorted(sub, queries, side=side).astype(jnp.int32)
    w0 = jnp.clip(r - 1, 0, nb - 2)                         # window row
    win = sorted_arr.reshape(nb, _G)
    rows = jnp.concatenate([win[w0], win[w0 + 1]], axis=-1)  # [Q, 2G]
    if side == "left":
        cnt = jnp.sum(rows < queries[..., None], axis=-1)
    else:
        cnt = jnp.sum(rows <= queries[..., None], axis=-1)
    # clamp to the UNPADDED length: on the padded path a query equal to
    # the dtype maximum with side="right" also counts pad elements
    # (rows <= q), which would return ranks > n_orig (ADVICE r4)
    return jnp.minimum(w0 * _G + cnt, n_orig).astype(jnp.int32)
