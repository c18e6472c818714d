"""Capture a jax.profiler trace of the e2e grad step and print the
top ops by self time (parsed from the trace-viewer JSON the profiler
writes).  Companion to tools_profile_stages.py: stage proxies tell you
which STAGE is hot, this tells you which XLA op inside it.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

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

    jax.block_until_ready(many(state.params))
    logdir = "/tmp/gsgen_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        jax.block_until_ready(many(state.params))
        time.sleep(0.2)

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace.json.gz found; files:",
              glob.glob(f"{logdir}/**/*", recursive=True))
        sys.exit(1)
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    # device lanes: pid names containing "TPU" / "/device:"
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dur = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pn = pid_name.get(e["pid"], "")
        tn = tid_name.get((e["pid"], e.get("tid")), "")
        if "TPU" not in pn and "TPU" not in tn and "device" not in pn.lower():
            continue
        # XLA op lanes are named like "XLA Ops" / "Steps"; keep op lanes
        if "op" not in tn.lower() and "xla" not in tn.lower():
            continue
        name = e["name"]
        d = float(e.get("dur", 0.0))
        dur[name] += d
        cnt[name] += 1
        total += d
    print(f"total device op time: {total/1e3/ITERS:.3f} ms/iter "
          f"over {ITERS} iters")
    top = sorted(dur.items(), key=lambda kv: -kv[1])[:45]
    for name, d in top:
        print(f"{d/1e3/ITERS:8.3f} ms  x{cnt[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
