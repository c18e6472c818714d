"""Probe: per-grid-step cost of a chunk-grid rasterizer skeleton.

Current kernels: grid over 1024 tiles, manual double-buffered DMA loop
over chunks (~2.8 us per chunk-iteration, mechanics-dominated).
Alternative: grid over ALL chunk slots with auto-pipelined BlockSpecs
(dup block [16,K] in, grad block [16,K] out), per-pixel carries in
scratch persisting across grid steps.  This probe times a skeleton with
the real per-chunk body (weights + moment reductions + stores) but
fake carry semantics, at the profiling scene's scale: 3072 chunk slots,
P=256, K=128.
"""

import time
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, K, F = 256, 128, 5
N_SLOTS = 3072
D_ROWS, CH_OUT = 16, 8


def kernel(chunk_tile_ref, dup_ref, out_ref, g_ref, grad_ref, T_col, Sdot,
           *, T_thresh):
    i = pl.program_id(0)
    t = chunk_tile_ref[i]
    is_new = jnp.logical_or(i == 0, chunk_tile_ref[jnp.maximum(i - 1, 0)] != t)

    @pl.when(is_new)
    def _():
        T_col[...] = jnp.ones((P, 1), jnp.float32)
        Sdot[...] = jnp.zeros((P, 1), jnp.float32)

    @pl.when(t >= 0)
    def _():
        d = dup_ref[...]                     # [D_ROWS, K] auto-DMA'd block
        g_all = g_ref[0]
        gfe = g_all[0:F, :]
        dotfinal = jnp.transpose(
            jnp.sum(gfe * out_ref[0, 0:F, :], axis=0, keepdims=True))
        pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        pixx = pid.astype(jnp.float32) * 1e-3
        pixy = pixx * 0.5
        mx, my = d[0:1, :], d[1:2, :]
        ca, cb, cc = d[2:3, :], d[3:4, :], d[4:5, :]
        al = d[5:6, :]
        dx = pixx - mx
        dy = pixy - my
        radial = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
        radial = jnp.maximum(radial, 0.0)
        G = jnp.exp(-0.5 * radial)
        a_cl = jnp.minimum(al, 0.99)
        aG = a_cl * G
        aG = jnp.where(aG < 1.0 / 255.0, 0.0, aG)
        om = 1.0 - aG
        col = jax.lax.broadcasted_iota(jnp.int32, (P, K), 1)
        acc = om
        sh = 1
        while sh < K:
            acc = acc * jnp.where(col >= sh, pltpu.roll(acc, sh, axis=1), 1.0)
            sh *= 2
        cp_excl = jnp.where(col >= 1, pltpu.roll(acc, 1, axis=1), 1.0)
        T_run = T_col[...] * cp_excl
        processed = T_run >= T_thresh
        w = jnp.where(processed, aG * T_run, 0.0)
        fe = d[6:6 + F, :]
        gof = jax.lax.dot_general(
            gfe, fe, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        e = w * gof
        daG = jnp.where(processed & (aG > 0.0),
                        gof * T_run - (dotfinal - Sdot[...] - e)
                        / jnp.maximum(om, 1e-6), 0.0)
        dalpha = jnp.sum(daG * G, axis=0, keepdims=True) * (al < 0.99)
        dG = daG * a_cl
        dr = jnp.where(radial > 0.0, -0.5 * G * dG, 0.0)
        dmx = jnp.sum(dr * -(2.0 * ca * dx + 2.0 * cb * dy),
                      axis=0, keepdims=True)
        dmy = jnp.sum(dr * -(2.0 * cb * dx + 2.0 * cc * dy),
                      axis=0, keepdims=True)
        dca = jnp.sum(dr * dx * dx, axis=0, keepdims=True)
        dcb = jnp.sum(dr * 2.0 * dx * dy, axis=0, keepdims=True)
        dcc = jnp.sum(dr * dy * dy, axis=0, keepdims=True)
        dfe = jax.lax.dot_general(
            gfe, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        grad_ref[0:1, :] = dmx
        grad_ref[1:2, :] = dmy
        grad_ref[2:3, :] = dca
        grad_ref[3:4, :] = dcb
        grad_ref[4:5, :] = dcc
        grad_ref[5:6, :] = dalpha
        grad_ref[6:6 + F, :] = dfe
        grad_ref[6 + F:, :] = jnp.zeros((D_ROWS - 6 - F, K), jnp.float32)
        T_col[...] = T_run[:, -1:] * om[:, -1:]
        Sdot[...] = Sdot[...] + jnp.sum(e, axis=1, keepdims=True)

    @pl.when(t < 0)
    def _():
        grad_ref[...] = jnp.zeros((D_ROWS, K), jnp.float32)


def main():
    n_tiles = 1024
    call = pl.pallas_call(
        functools.partial(kernel, T_thresh=1e-4),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N_SLOTS,),
            in_specs=[
                pl.BlockSpec((D_ROWS, K), lambda i, ct: (0, i)),
                pl.BlockSpec((1, CH_OUT, P),
                             lambda i, ct: (jnp.maximum(ct[i], 0), 0, 0)),
                pl.BlockSpec((1, CH_OUT, P),
                             lambda i, ct: (jnp.maximum(ct[i], 0), 0, 0)),
            ],
            out_specs=pl.BlockSpec((D_ROWS, K), lambda i, ct: (0, i)),
            scratch_shapes=[
                pltpu.VMEM((P, 1), jnp.float32),
                pltpu.VMEM((P, 1), jnp.float32),
            ]),
        out_shape=jax.ShapeDtypeStruct((D_ROWS, N_SLOTS * K), jnp.float32),
    )

    key = jax.random.PRNGKey(0)
    dup = jax.random.uniform(key, (D_ROWS, N_SLOTS * K), jnp.float32,
                             minval=0.1, maxval=0.9)
    out = jax.random.uniform(key, (n_tiles, CH_OUT, P), jnp.float32)
    g = jax.random.uniform(key, (n_tiles, CH_OUT, P), jnp.float32)
    # ~2.4 slots per tile for the first 2413, then padding (-1)
    ct = jnp.concatenate([
        jnp.repeat(jnp.arange(n_tiles, dtype=jnp.int32),
                   2413 // n_tiles + 1)[:2413],
        jnp.full((N_SLOTS - 2413,), -1, jnp.int32)])

    @jax.jit
    def many(k, dup):
        def body(i, c):
            r = call(ct, dup + c * 1e-30, out, g)
            return c + r[0, 0] * 1e-20
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    def timed(k):
        kj = jnp.int32(k)
        float(many(kj, dup))
        t0 = time.perf_counter()
        float(many(kj, dup))
        return time.perf_counter() - t0

    dt = (timed(32) - timed(8)) / 24
    print(f"chunk-grid bwd skeleton: {dt*1e3:.2f} ms for {N_SLOTS} slots "
          f"({dt/N_SLOTS*1e6:.2f} us/slot)", flush=True)


if __name__ == "__main__":
    main()
