"""Microbench: pack-VJP gradient-aggregation variants (round-4 attack).

Current (_pack_seg_bwd): sort(gid, iota) -> perm row-gather [cap,16] ->
cumsum axis0 -> TWO [N,16] boundary row-gathers.
Trace attribution at cap=360448: gather 1.63 + transpose 0.66 +
boundaries 1.30 + sort 0.37 ms.

Variants:
  A. hi-shift: lo[g] = hi[g-1] (one boundary gather instead of two)
  B. sort-with-values: 17-operand sort carries the 16 grad rows through
     the sort directly — no perm gather, no [16,cap]->[cap,16] transpose
  C. A+B combined
"""

import time

import jax
import jax.numpy as jnp

CAP = 360448
N = 100_000
ITERS = 50


def time_chain(fn, *args, iters=ITERS):
    @jax.jit
    def many(*a):
        def step(i, c):
            r = fn(*[x + c * 1e-30 if isinstance(x, jax.Array)
                     and jnp.issubdtype(x.dtype, jnp.floating) else x
                     for x in a])
            leaves = [l for l in jax.tree_util.tree_leaves(r)
                      if jnp.issubdtype(l.dtype, jnp.floating)]
            return c + sum(jnp.sum(l) * 1e-30 for l in leaves)
        return jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))
    jax.block_until_ready(many(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(many(*args))
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # realistic gid: ~2.4 dups per gaussian, sorted-by-tile order
    # (random-ish), sentinel N on ~27% padding rows
    gid = jax.random.randint(k1, (CAP,), 0, N).astype(jnp.int32)
    pad = jax.random.uniform(k2, (CAP,)) < 0.27
    gid = jnp.where(pad, N, gid)
    ddup = jax.random.uniform(k3, (16, CAP), jnp.float32)
    counts = jnp.bincount(jnp.minimum(gid, N), length=N + 1)[:N]
    gid_cum = jnp.cumsum(counts).astype(jnp.int32)
    gid, ddup, gid_cum = jax.block_until_ready((gid, ddup, gid_cum))

    def cur(ddup, gid, gid_cum):
        cap = gid.shape[0]
        _, perm = jax.lax.sort(
            (gid, jnp.arange(cap, dtype=jnp.int32)), num_keys=1,
            is_stable=True)
        g = ddup.T[perm]
        cs = jnp.cumsum(g, axis=0)
        bound = jnp.clip(gid_cum - 1, 0, cap - 1)
        prev = jnp.concatenate([jnp.zeros((1,), gid_cum.dtype),
                                gid_cum[:-1]])
        hi = cs[bound]
        lo = jnp.where((prev > 0)[:, None],
                       cs[jnp.clip(prev - 1, 0, cap - 1)], 0.0)
        return jnp.where((gid_cum > prev)[:, None], hi - lo, 0.0)

    def var_a(ddup, gid, gid_cum):
        cap = gid.shape[0]
        _, perm = jax.lax.sort(
            (gid, jnp.arange(cap, dtype=jnp.int32)), num_keys=1,
            is_stable=True)
        g = ddup.T[perm]
        cs = jnp.cumsum(g, axis=0)
        bound = jnp.clip(gid_cum - 1, 0, cap - 1)
        hi = cs[bound]
        lo = jnp.concatenate([jnp.zeros((1, 16), jnp.float32), hi[:-1]],
                             axis=0)
        return hi - lo

    def var_b(ddup, gid, gid_cum):
        cap = gid.shape[0]
        srt = jax.lax.sort((gid,) + tuple(ddup[i] for i in range(16)),
                           num_keys=1, is_stable=True)
        g = jnp.stack(srt[1:], axis=1)              # [cap, 16]
        cs = jnp.cumsum(g, axis=0)
        bound = jnp.clip(gid_cum - 1, 0, cap - 1)
        prev = jnp.concatenate([jnp.zeros((1,), gid_cum.dtype),
                                gid_cum[:-1]])
        hi = cs[bound]
        lo = jnp.where((prev > 0)[:, None],
                       cs[jnp.clip(prev - 1, 0, cap - 1)], 0.0)
        return jnp.where((gid_cum > prev)[:, None], hi - lo, 0.0)

    def var_c(ddup, gid, gid_cum):
        cap = gid.shape[0]
        srt = jax.lax.sort((gid,) + tuple(ddup[i] for i in range(16)),
                           num_keys=1, is_stable=True)
        g = jnp.stack(srt[1:], axis=1)
        cs = jnp.cumsum(g, axis=0)
        bound = jnp.clip(gid_cum - 1, 0, cap - 1)
        hi = cs[bound]
        lo = jnp.concatenate([jnp.zeros((1, 16), jnp.float32), hi[:-1]],
                             axis=0)
        return hi - lo

    # correctness first (CPU-sane shapes ok on chip too)
    r0 = jax.jit(cur)(ddup, gid, gid_cum)
    for nm, f in [("A", var_a), ("B", var_b), ("C", var_c)]:
        r = jax.jit(f)(ddup, gid, gid_cum)
        err = float(jnp.max(jnp.abs(r - r0)))
        print(f"variant {nm}: max abs diff vs current = {err:.2e}")

    for nm, f in [("current", cur), ("A", var_a), ("B", var_b),
                  ("C", var_c)]:
        t = time_chain(f, ddup, gid, gid_cum)
        print(f"{nm}: {t*1e3:.3f} ms")

    # component probes
    iota = jnp.arange(CAP, dtype=jnp.int32)
    t = time_chain(lambda g: jax.lax.sort((g, iota), num_keys=1,
                                          is_stable=True)[1], gid)
    print(f"sort 2-op: {t*1e3:.3f} ms")
    t = time_chain(lambda g, d: jax.lax.sort(
        (g,) + tuple(d[i] for i in range(16)), num_keys=1,
        is_stable=True)[1], gid, ddup)
    print(f"sort 17-op: {t*1e3:.3f} ms")
    t = time_chain(lambda d: jnp.stack([d[i] for i in range(16)],
                                       axis=1), ddup)
    print(f"stack 16x[cap] -> [cap,16]: {t*1e3:.3f} ms")
    t = time_chain(lambda d: jnp.cumsum(d.T, axis=0), ddup)
    print(f"transpose+cumsum [cap,16]: {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
