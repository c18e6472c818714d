"""Trace the FULL jitted train step at production counts (VERDICT r4
item 2): 512², 65K-Gaussian capacity, batch 4, mock-scene guidance —
the c2f soak's phase-2 configuration that measured 98.8 ms/step while
its 4 rendered frames account for only ~40 ms.

Prints three layers of attribution:

1. wall/step in the steady state (async dispatch, like the soak),
2. total DEVICE op time per step from a jax.profiler trace,
3. the top device ops by self time (the gap hunters).

plus a host-side split (pose sampling / sched build / dispatch call)
so host-vs-device responsibility is unambiguous.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools_trace_step.py
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

N_STEPS_TRACE = 10
N_STEPS_WALL = 40


def build_trainer(n_gauss=65536, reso=512, batch=4, dup_cap=1 << 18):
    import jax

    from gsgen_tpu.data.cameras import CameraSamplerConfig
    from gsgen_tpu.guidance.mock import MockGuidance
    from gsgen_tpu.models.background import BackgroundConfig
    from gsgen_tpu.models.density import DensifyConfig, PruneConfig
    from gsgen_tpu.models.init import InitConfig, initialize
    from gsgen_tpu.models.scene import RenderConfig
    from gsgen_tpu.ops.camera import CameraIntrinsics
    from gsgen_tpu.training.trainer import Trainer, TrainerConfig

    rcfg = RenderConfig(dup_cap=dup_cap, chunk=128)
    # target: the 16K fine scene the c2f soak optimizes against (its
    # render runs INSIDE the step: rgb_only fwd x batch)
    tcfg = RenderConfig(dup_cap=1 << 15, chunk=128)
    target = initialize(jax.random.PRNGKey(7),
                        InitConfig(num_points=16384, svec_val=0.004,
                                   mean_std=0.5), tcfg)
    trainer = Trainer(
        cfg=TrainerConfig(max_steps=15000, batch_size=batch, grad_accum=1,
                          auto_dup_bucket=False),
        rcfg=rcfg,
        init_cfg=InitConfig(num_points=n_gauss, capacity=n_gauss,
                            svec_val=0.008, mean_std=0.5),
        bg_cfg=BackgroundConfig(type="random"),
        data_cfg=CameraSamplerConfig(
            batch_size=batch, max_steps=15000, reso=(reso,),
            camera_distance=(1.5, 2.5)),
        guidance=MockGuidance(mode="scene", target_scene=target.params,
                              target_active=target.active,
                              intr=CameraIntrinsics.from_reso(reso),
                              rcfg=tcfg),
        dcfg=DensifyConfig(enabled=False),
        pcfg=PruneConfig(enabled=False),
    )
    return trainer


def main():
    import jax

    trainer = build_trainer()
    # warm/compile
    t0 = time.perf_counter()
    trainer.train_step(0)
    float(trainer.state.scene.params.mean[0, 0])   # true sync (tunnel)
    print(f"compile+first step: {time.perf_counter() - t0:.1f} s",
          flush=True)

    # ---- layer 1: steady-state wall/step (async dispatch, soak-like)
    trainer.train_step(1)
    float(trainer.state.scene.params.mean[0, 0])
    t0 = time.perf_counter()
    for s in range(2, 2 + N_STEPS_WALL):
        trainer.train_step(s)
    float(trainer.state.scene.params.mean[0, 0])
    wall = (time.perf_counter() - t0) / N_STEPS_WALL
    print(f"wall/step (steady, {N_STEPS_WALL} steps): {wall*1e3:.1f} ms",
          flush=True)

    # ---- host-side split
    t0 = time.perf_counter()
    for _ in range(20):
        trainer.data.get_batch()
    t_batch = (time.perf_counter() - t0) / 20
    t0 = time.perf_counter()
    for s in range(20):
        trainer.sched_scalars(s)
    t_sched = (time.perf_counter() - t0) / 20
    print(f"host: get_batch {t_batch*1e3:.2f} ms x grad_accum, "
          f"sched_scalars {t_sched*1e3:.2f} ms", flush=True)

    # ---- layers 2+3: device trace of N steps
    logdir = "/tmp/gsgen_trace_step"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for s in range(100, 100 + N_STEPS_TRACE):
            trainer.train_step(s)
        float(trainer.state.scene.params.mean[0, 0])
        time.sleep(0.2)

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace found:", glob.glob(f"{logdir}/**/*",
                                           recursive=True)[:20])
        sys.exit(1)
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dur, cnt = defaultdict(float), defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pn = pid_name.get(e["pid"], "")
        tn = tid_name.get((e["pid"], e.get("tid")), "")
        if "TPU" not in pn and "TPU" not in tn and "device" not in pn.lower():
            continue
        if "op" not in tn.lower() and "xla" not in tn.lower():
            continue
        name = e["name"]
        d = float(e.get("dur", 0.0))
        dur[name] += d
        cnt[name] += 1
        total += d
    print(f"\ntotal device op time: {total/1e3/N_STEPS_TRACE:.2f} ms/step "
          f"over {N_STEPS_TRACE} traced steps")
    print(f"unaccounted (wall - device): "
          f"{wall*1e3 - total/1e3/N_STEPS_TRACE:.1f} ms/step\n")
    top = sorted(dur.items(), key=lambda kv: -kv[1])[:60]
    for name, d in top:
        print(f"{d/1e3/N_STEPS_TRACE:8.3f} ms  x{cnt[name]:4d}  {name[:115]}")


if __name__ == "__main__":
    main()
