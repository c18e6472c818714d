"""On-chip VSD long-run stability soak (round-4 VERDICT #6).

The round-3 2000-step soak used mock SDS; this runs the same length
with the VSD path — LoRA parameters TRAINING inside the jitted step,
camera conditioning live, tiny random backbone weights — to exercise
the trainable-guidance optimizer branch at length on hardware.
Checks: every loss finite, LoRA params actually move throughout,
steps/s reported.

Usage:  JAX_COMPILATION_CACHE_DIR=... python tools_vsd_soak.py [steps]
"""

import json
import sys
import time

import numpy as np


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    import jax

    from gsgen_tpu.config import build_trainer, load_config

    cfg = load_config("configs/smoke.yaml", [
        "guidance.type=vsd", "guidance.backbone=sd_unet",
        "guidance.backbone_preset=tiny", "guidance.lora_rank=4",
        f"trainer.max_steps={n_steps}", "trainer.batch_size=4",
        "init.num_points=1024", "init.capacity=8192",
        "data.reso=[256]", "renderer.dup_cap=32768",
        'prompt.prompt="a corgi"', "trainer.loss={vsd: 1.0, lora: 1.0}",
        "renderer.densify.enabled=true", "renderer.densify.warm_up=200",
        "renderer.densify.end=1500", "renderer.densify.period=250",
        "renderer.densify.mean2d_thresh=0.0002",
        "renderer.densify.use_legacy=false",
        "renderer.prune.enabled=true", "renderer.prune.warm_up=200",
        "renderer.prune.end=1500", "renderer.prune.period=500",
        "renderer.prune.alpha_thresh=0.005",
    ])
    trainer = build_trainer(cfg, logger=None)

    gp0 = jax.tree_util.tree_map(np.asarray, trainer.state.gp)
    times = np.zeros(n_steps)
    losses = {}
    lora_deltas = {}
    t_start = time.perf_counter()
    for s in range(n_steps):
        t0 = time.perf_counter()
        m = trainer.train_step(s)
        trainer.density_step(s)
        times[s] = time.perf_counter() - t0
        if s % 200 == 0 or s == n_steps - 1:
            losses[s] = {k: round(float(v), 6) for k, v in m.items()
                         if k.startswith("loss")}
            assert all(np.isfinite(list(losses[s].values()))), (s, losses[s])
            delta = sum(
                float(np.abs(np.asarray(leaf) - np.asarray(l0)).sum())
                for leaf, l0 in zip(
                    jax.tree_util.tree_leaves(trainer.state.gp),
                    jax.tree_util.tree_leaves(gp0)))
            lora_deltas[s] = round(delta, 6)
    total = time.perf_counter() - t_start

    print(json.dumps({"total_s": round(total, 1),
                      "steps_per_s": round(n_steps / total, 2),
                      "median_ms": round(float(np.median(times)) * 1e3, 1)}))
    print(json.dumps({"losses": losses}))
    print(json.dumps({"lora_param_total_drift": lora_deltas}))
    moved = [d for s, d in lora_deltas.items() if s > 0 and d > 0]
    assert moved, "LoRA params never moved — trainable branch dead"
    print("VSD soak ok")


if __name__ == "__main__":
    main()
