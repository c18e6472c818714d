"""Microbench round-4b: can sort-with-values beat the perm gather?

Production (_pack_seg_bwd): 2-op sort over the COMPACT domain (262144)
-> perm row-gather reads the PADDED grad buffer [cap,16] (fusion.204,
1.19 ms — the gather+transpose-fused 4.5 ns/row form) -> MXU prefix ->
boundary gather.

Variant D: 17-operand sort over the PADDED domain (360448) carries the
16 grad rows as values — no gather at all (the rows are free slices of
the backward kernel's [16, cap_padded] output), stack the sorted 1-D
arrays back to [16, cap] (compact layout, no lane padding) and run the
MXU prefix there; boundaries read through the free [cap,16] transpose.
The round-4 negative result rejected sort-with-values when the restack
target was the lane-padded [cap,16]; the [16,cap] stack + MXU prefix
changes both costs.
"""

import time

import jax
import jax.numpy as jnp

CAP_PAD = 360448       # padded duplicate domain
CAP_C = 262144         # compact domain
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


def cumsum16(g16):
    """Inclusive prefix over axis 1 of [16, cap]: MXU triangular form."""
    C, cap = g16.shape
    ng = cap // 128
    g2 = g16.reshape(C, ng, 128)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
           ).astype(g16.dtype)
    intra = jax.lax.dot_general(
        g2, tri, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    gtot = intra[..., -1]
    gpre = jnp.cumsum(gtot, axis=1) - gtot
    return (intra + gpre[..., None]).reshape(C, cap)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # compact rows with gid; padded position = r + per-tile offset.
    gid_c = jnp.sort(jax.random.randint(k1, (CAP_C,), 0, N)
                     ).astype(jnp.int32)     # any order works for timing
    gid_c = jax.random.permutation(k1, gid_c)
    n_valid = int(0.93 * CAP_C)
    riota = jnp.arange(CAP_C, dtype=jnp.int32)
    gid_c = jnp.where(riota < n_valid, gid_c, N)
    # monotone inflation compact -> padded position
    vjp_pos = jnp.minimum(
        riota + (riota // 256) * 96, CAP_PAD - 1).astype(jnp.int32)
    ddup = jax.random.uniform(k3, (16, CAP_PAD), jnp.float32)
    # padded-domain gid (sentinel on padding rows): inverse map
    gid_pad = jnp.full((CAP_PAD,), N, jnp.int32).at[vjp_pos].set(
        jnp.where(riota < n_valid, gid_c, N))
    counts = jnp.bincount(jnp.minimum(gid_c, N), length=N + 1)[:N]
    gid_cum = jnp.cumsum(counts).astype(jnp.int32)
    gid_c, gid_pad, vjp_pos, ddup, gid_cum = jax.block_until_ready(
        (gid_c, gid_pad, vjp_pos, ddup, gid_cum))

    def v0_production(ddup, gid_c, vjp_pos, gid_cum):
        _, pos_s = jax.lax.sort((gid_c, vjp_pos), num_keys=1,
                                is_stable=True)
        g = ddup.T[pos_s]                              # [CAP_C, 16]
        cs = cumsum16(g.T.reshape(16, CAP_C)).reshape(
            16, CAP_C).T
        bound = jnp.clip(gid_cum - 1, 0, CAP_C - 1)
        hi = jnp.where((gid_cum > 0)[:, None], cs[bound], 0.0)
        lo = jnp.concatenate(
            [jnp.zeros((1, 16), jnp.float32), hi[:-1]], axis=0)
        return hi - lo

    def vd_sort_values(ddup, gid_pad, gid_cum):
        srt = jax.lax.sort(
            (gid_pad,) + tuple(ddup[i] for i in range(16)),
            num_keys=1, is_stable=True)
        g16 = jnp.stack(srt[1:], axis=0)               # [16, CAP_PAD]
        cs = cumsum16(g16).T                           # [CAP_PAD, 16]
        bound = jnp.clip(gid_cum - 1, 0, CAP_PAD - 1)
        hi = jnp.where((gid_cum > 0)[:, None], cs[bound], 0.0)
        lo = jnp.concatenate(
            [jnp.zeros((1, 16), jnp.float32), hi[:-1]], axis=0)
        return hi - lo

    r0 = jax.jit(v0_production)(ddup, gid_c, vjp_pos, gid_cum)
    rd = jax.jit(vd_sort_values)(ddup, gid_pad, gid_cum)
    err = float(jnp.max(jnp.abs(r0 - rd)))
    print(f"VD vs V0 max abs diff = {err:.2e}")

    t0 = time_chain(v0_production, ddup, gid_c, vjp_pos, gid_cum)
    print(f"V0 production (sort2 + gather + mxu prefix): {t0*1e3:.3f} ms")
    td = time_chain(vd_sort_values, ddup, gid_pad, gid_cum)
    print(f"VD sort-with-values (padded, no gather):     {td*1e3:.3f} ms")


if __name__ == "__main__":
    main()
