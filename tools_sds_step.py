"""Measure + trace the PRODUCTION SDS train step (VERDICT r4 item 3):
SD-2.1-shape UNet + VAE (random weights, real shapes, bf16) inside the
jitted step at 512², batch 4, 65K-Gaussian capacity — the reference's
conf/base.yaml regime where the step is UNet-bound.

Prints wall/step and the top device ops with source attribution so the
UNet/VAE/render split is explicit.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools_sds_step.py
       [--trace] [--batch 4] [--reso 512] [--dtype bfloat16]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build(batch, reso, n_gauss, dtype, preset="sd21"):
    import jax

    from gsgen_tpu.data.cameras import CameraSamplerConfig
    from gsgen_tpu.guidance.sd_unet import (SD21, SDUNetBackbone)
    from gsgen_tpu.guidance.sds import SDSConfig, SDSGuidance
    from gsgen_tpu.models.background import BackgroundConfig
    from gsgen_tpu.models.density import DensifyConfig, PruneConfig
    from gsgen_tpu.models.init import InitConfig
    from gsgen_tpu.models.scene import RenderConfig
    from gsgen_tpu.prompt.processors import (PromptProcessor,
                                             PromptProcessorConfig)
    from gsgen_tpu.training.trainer import Trainer, TrainerConfig

    rcfg = RenderConfig(dup_cap=1 << 18, chunk=128)
    backbone = SDUNetBackbone(SD21, latent_size=reso // 8, use_vae=True,
                              compute_dtype=dtype)
    guidance = SDSGuidance(SDSConfig(), backbone)
    pp = PromptProcessor(PromptProcessorConfig(prompt="a corgi"))
    trainer = Trainer(
        cfg=TrainerConfig(max_steps=15000, batch_size=batch, grad_accum=1,
                          auto_dup_bucket=False),
        rcfg=rcfg,
        init_cfg=InitConfig(num_points=n_gauss, capacity=n_gauss,
                            svec_val=0.008, mean_std=0.5),
        bg_cfg=BackgroundConfig(type="random"),
        data_cfg=CameraSamplerConfig(batch_size=batch, max_steps=15000,
                                     reso=(reso,),
                                     camera_distance=(1.5, 2.5)),
        guidance=guidance,
        prompt_processor=pp,
        dcfg=DensifyConfig(enabled=False),
        pcfg=PruneConfig(enabled=False),
    )
    return trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reso", type=int, default=512)
    ap.add_argument("--gauss", type=int, default=65536)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()
    import jax

    trainer = build(args.batch, args.reso, args.gauss, args.dtype)
    t0 = time.perf_counter()
    trainer.train_step(0)
    float(trainer.state.scene.params.mean[0, 0])
    print(f"compile+first step: {time.perf_counter() - t0:.1f} s",
          flush=True)
    trainer.train_step(1)
    float(trainer.state.scene.params.mean[0, 0])
    t0 = time.perf_counter()
    for s in range(2, 2 + args.steps):
        trainer.train_step(s)
    float(trainer.state.scene.params.mean[0, 0])
    wall = (time.perf_counter() - t0) / args.steps
    print(json.dumps({"wall_ms_per_step": round(wall * 1e3, 1),
                      "steps_per_s": round(1.0 / wall, 2),
                      "batch": args.batch, "reso": args.reso,
                      "dtype": args.dtype}), flush=True)

    if not args.trace:
        return
    logdir = "/tmp/gsgen_trace_sds"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for s in range(100, 105):
            trainer.train_step(s)
        float(trainer.state.scene.params.mean[0, 0])
        time.sleep(0.2)
    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dur, cnt, src = defaultdict(float), defaultdict(int), {}
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
        dur[name] += float(e.get("dur", 0.0))
        cnt[name] += 1
        a = e.get("args", {})
        if name not in src:
            src[name] = (a.get("tf_op", "") + " " + a.get("source", ""))[:90]
    # stage grouping by tf_op path
    groups = defaultdict(float)
    for name, d in dur.items():
        s = src.get(name, "")
        if "AutoencoderKL" in s:
            g = ("vae_bwd" if "transpose" in s else "vae_fwd")
        elif "UNet2DConditionModel" in s or "flash_attention" in name:
            g = "unet"
        elif ("rasterize" in s or "binning" in s or "scene.py" in s
              or "projection" in s or "pallas" in s):
            g = "render"
        elif name.startswith("jit_train_step"):
            continue                      # parent envelope, not self time
        else:
            g = "other"
        groups[g] += d
    print(json.dumps({k: round(v / 1e3 / 5, 1)
                      for k, v in sorted(groups.items())}), flush=True)
    top = sorted(dur.items(), key=lambda kv: -kv[1])[:50]
    for name, d in top:
        print(f"{d/1e3/5:8.3f} ms x{cnt[name]//5:3d}  {name[:40]:40s} "
              f"{src.get(name, '')}")


if __name__ == "__main__":
    main()
