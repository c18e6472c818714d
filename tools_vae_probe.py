"""VAE encode roofline probe (VERDICT r4 item 3): is the 88+107 ms
fwd+bwd VAE stage at 4x512² near its MXU floor, or fixable?

Measures standalone encode fwd and fwd+grad at fp32 vs bf16, pulls the
FLOP count from XLA cost analysis, and prints achieved TFLOP/s against
the v5e peaks (~197 bf16 / ~49 fp32 dense MXU).
"""

import json
import time

import jax
import jax.numpy as jnp

import numpy as np

from gsgen_tpu.guidance.vae import SD_VAE, AutoencoderKL

B, RESO, ITERS = 4, 512, 8


def timeit(fn, *args):
    """Chained-in-jit timing: a python dispatch loop through the axon
    tunnel is latency-contaminated even with async dispatch (measured
    ~190 ms for a 1.3 ms conv); iterations must chain inside ONE jit
    with a carry dependence (BASELINE.md methodology)."""
    @jax.jit
    def many(*a):
        def body(i, c):
            pert = jax.tree_util.tree_map(
                lambda x: x + (c * 1e-20).astype(x.dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(
                    x.dtype, jnp.floating) else x, a[0])
        # perturb only the FIRST arg (image or params) via the carry
            r = fn(pert, *a[1:])
            leaf = jax.tree_util.tree_leaves(r)[0]
            return c + leaf.ravel()[0].astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    float(many(*args))          # compile+warm
    t0 = time.perf_counter()
    float(many(*args))          # scalar fetch = true sync
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    vae = AutoencoderKL(SD_VAE)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (B, RESO, RESO, 3))
    params = vae.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, 64, 64, 3)), None,
                      method=AutoencoderKL.encode)
    for dtype in ("bfloat16", None):
        dt = jnp.dtype(dtype) if dtype else None

        def enc(p, x):
            if dt is not None:
                cast = lambda v: (v.astype(dt) if jnp.issubdtype(
                    v.dtype, jnp.floating) else v)
                p = jax.tree_util.tree_map(cast, p)
                x = x.astype(dt)
            z = vae.apply(p, x, None, method=AutoencoderKL.encode)
            return z.astype(jnp.float32)

        fwd = jax.jit(enc)
        g = jax.jit(jax.grad(
            lambda x, p: jnp.sum(enc(p, x) ** 2), argnums=0))

        t_fwd = timeit(fwd, params, imgs)
        t_bwd = timeit(g, imgs, params)      # fwd+bwd to the image

        c_f = fwd.lower(params, imgs).compile().cost_analysis()
        c_g = g.lower(imgs, params).compile().cost_analysis()
        fl_f = float(c_f.get("flops", 0.0))
        fl_g = float(c_g.get("flops", 0.0))
        print(json.dumps({
            "dtype": dtype or "float32",
            "fwd_ms": round(t_fwd, 1),
            "fwd_tflops": round(fl_f / t_fwd / 1e9, 1),
            "fwdbwd_ms": round(t_bwd, 1),
            "fwdbwd_tflops": round(fl_g / t_bwd / 1e9, 1),
            "fwd_gflop": round(fl_f / 1e9, 1),
            "fwdbwd_gflop": round(fl_g / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
