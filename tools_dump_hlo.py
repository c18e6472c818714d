"""Dump compiled HLO of the bench grad step and print the definitions of
named fusions (to map trace op names -> pipeline stages)."""

import re
import sys

import jax
import jax.numpy as jnp

N, RESO, CAP, CHUNK, ITERS = 100_000, 512, 1 << 18, 128, 20


def main():
    from gsgen_tpu.models.init import InitConfig, initialize
    from gsgen_tpu.models.scene import RenderConfig, render_view
    from gsgen_tpu.ops.camera import CameraIntrinsics

    rcfg = RenderConfig(dup_cap=CAP, chunk=CHUNK)
    intr = CameraIntrinsics.from_reso(RESO)
    state = jax.block_until_ready(jax.jit(lambda k: initialize(
        k, InitConfig(num_points=N, svec_val=0.01, mean_std=0.6),
        rcfg))(jax.random.PRNGKey(0)))
    c2w = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.5]],
                    jnp.float32)
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
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    lowered = many.lower(state.params)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/bench_hlo.txt", "w") as f:
        f.write(txt)
    print("HLO written to /tmp/bench_hlo.txt,", len(txt), "chars")

    names = sys.argv[1:]
    for nm in names:
        # print the root + a few lines around the fusion definition and
        # its called computation name
        pat = re.compile(rf"^\s*%?{re.escape(nm)} = .*$", re.M)
        m = pat.search(txt)
        if not m:
            print(f"--- {nm}: NOT FOUND")
            continue
        line = m.group(0)
        print(f"--- {nm}:")
        print(line[:2000])


if __name__ == "__main__":
    main()
