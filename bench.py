"""Benchmark harness: rays/s (fwd+bwd) on the production render path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json configs[1] scaled to the available chip): a
100K-Gaussian scene rendered at 512x512 — forward + backward through
the full pipeline (projection -> culling -> binning -> fused Pallas
tile compositing), per-Gaussian gradients materialized.  Iterations are
chained inside ONE jit dispatch so the number is device time, not the
per-call latency of the remote-TPU tunnel.  rays/s = pixels rendered
(with gradients) per second.

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
anchor is the round-1 first measurement (XLA-backend rasterizer,
per-call timing) so the ratio tracks progress across rounds.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# Round-1 first on-chip measurement (XLA backend, per-call timing).
BASELINE_RAYS_PER_S = 446_977.0


def main():
    n_gauss = int(os.environ.get("BENCH_N", 100_000))
    reso = int(os.environ.get("BENCH_RESO", 512))
    iters = int(os.environ.get("BENCH_ITERS", 50))

    from gsgen_tpu.models.scene import RenderConfig, render_view
    from gsgen_tpu.models.init import InitConfig, initialize
    from gsgen_tpu.ops.camera import CameraIntrinsics

    # dup_cap 2^18: the workload produces 244,098 tile duplicates (measured),
    # so 2^18 = 262,144 is the smallest sufficient power-of-two bucket — the
    # same bucketing policy the Trainer's host-feedback capacity loop uses.
    # chunk 128 is the Mosaic lane-alignment floor (last-dim DMA slices must
    # be 128-aligned) and measured fastest: 29.8 ms/frame vs 44.4 ms at
    # (2^19, 256).
    # BENCH_FAST_FWD=1: MXU forward cumprod (~4e-3 image error, exact
    # grads unchanged; training-neutral — quality gate reads 30.12 dB vs
    # 29.75 with the exact scan, BASELINE.md round 5)
    rcfg = RenderConfig(dup_cap=1 << 18, chunk=128,
                        fast_fwd_cumprod=bool(
                            int(os.environ.get("BENCH_FAST_FWD", "0"))))
    intr = CameraIntrinsics.from_reso(reso)

    @jax.jit
    def build(key):
        return initialize(key, InitConfig(num_points=n_gauss, svec_val=0.01,
                                          mean_std=0.6), rcfg)

    state = jax.block_until_ready(build(jax.random.PRNGKey(0)))
    c2w = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.5]], jnp.float32)
    bg = jnp.ones((3,), jnp.float32)

    def loss(params):
        out = render_view(params, state.active, c2w, intr, rcfg, bg)
        return (jnp.mean(out["rgb"]) + jnp.mean(out["depth"])
                + jnp.mean(out["T"]))

    grad = jax.grad(loss)

    @jax.jit
    def many(params):
        def body(i, carry):
            g = grad(jax.tree_util.tree_map(
                lambda p: p + carry * 1e-20, params))
            return carry + jnp.sum(g.mean) * 1e-20
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    # sync via scalar FETCH, not block_until_ready: through the remote-
    # TPU tunnel block_until_ready can return early (observed round 4:
    # one flake timed 50 chained grad steps at 1.3 ms total); float()
    # forces the device round trip.
    float(many(state.params))                     # compile + warm
    t0 = time.perf_counter()
    float(many(state.params))
    dt = (time.perf_counter() - t0) / iters

    rays_per_s = reso * reso / dt
    print(json.dumps({
        "metric": "rays_per_s_fwd_bwd_100k_512",
        "value": rays_per_s,
        "unit": "rays/s/chip",
        "vs_baseline": rays_per_s / BASELINE_RAYS_PER_S,
    }))


if __name__ == "__main__":
    main()
