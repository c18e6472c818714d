"""On-chip c2f-curriculum end-to-end measurement (round-4 VERDICT #5).

Runs the reference's production trajectory shape (conf/data/c2f.yaml +
conf/base.yaml densify window): reso 64 -> 256 -> 512 at steps
2000/4000, densify live, mock guidance, 4500 steps — and reports
steps/s per phase, dup-bucket growth events, and recompile stalls with
compile-ahead on.  This is the trajectory the round-3 VERDICT flagged
as unmeasured (the 64² phase is duplicate-bound per frame).

Usage:  JAX_COMPILATION_CACHE_DIR=... python tools_c2f_soak.py [steps]
"""

import json
import sys
import time

import numpy as np


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4500
    import jax

    from gsgen_tpu.data.cameras import CameraSamplerConfig
    from gsgen_tpu.guidance.mock import MockGuidance
    from gsgen_tpu.models.background import BackgroundConfig
    from gsgen_tpu.models.density import DensifyConfig, PruneConfig
    from gsgen_tpu.models.init import InitConfig
    from gsgen_tpu.models.scene import RenderConfig
    from gsgen_tpu.training.trainer import Trainer, TrainerConfig

    milestones = (2000, 4000)
    resos = (64, 256, 512)
    # multi-view photometric target with FINE structure (16K thin
    # gaussians): the render can always improve, so mean2d grads — and
    # with them densify — stay alive for the whole run (a constant-color
    # target converges in ~100 steps and densify then sees zero stats)
    from gsgen_tpu.models.init import initialize
    from gsgen_tpu.ops.camera import CameraIntrinsics
    rcfg = RenderConfig(dup_cap=1 << 15, chunk=128)
    target = initialize(jax.random.PRNGKey(7),
                        InitConfig(num_points=16384, svec_val=0.004,
                                   mean_std=0.5), rcfg)
    trainer = Trainer(
        cfg=TrainerConfig(max_steps=n_steps, batch_size=4, grad_accum=1,
                          # mock steps are ~50 ms: the serialized
                          # prewarm queue (2-3 x ~35 s compiles)
                          # needs ~2K steps of lead here
                          reso_prewarm_lead=1200),
        rcfg=rcfg,
        init_cfg=InitConfig(num_points=4096, capacity=65536,
                            svec_val=0.02, mean_std=0.6),
        bg_cfg=BackgroundConfig(type="random"),
        data_cfg=CameraSamplerConfig(
            batch_size=4, max_steps=n_steps, reso=resos,
            reso_milestones=milestones, camera_distance=(1.5, 2.5)),
        guidance=MockGuidance(mode="scene", target_scene=target.params,
                              target_active=target.active,
                              intr=CameraIntrinsics.from_reso(resos[0]),
                              rcfg=rcfg),
        # aggressive-but-plausible thresholds so the run reaches the
        # 30-50K range the reference's production prompts see
        dcfg=DensifyConfig(enabled=True, warm_up=500, end=4200,
                           period=500, mean2d_thresh=0.000001,
                           split_thresh=0.01, use_legacy=False),
        pcfg=PruneConfig(enabled=True, warm_up=500, end=4200, period=1000,
                         alpha_thresh=0.005),
    )

    phase_of = lambda s: sum(s >= m for m in milestones)  # noqa: E731
    times = np.zeros(n_steps)
    stalls = []       # (step, seconds) for steps > 1 s
    n_active = {}
    buckets = [(0, trainer.dup_bucket)]
    t_start = time.perf_counter()
    loss = None
    for s in range(n_steps):
        t0 = time.perf_counter()
        m = trainer.train_step(s)
        trainer.density_step(s)
        if s % 250 == 0 or s == n_steps - 1:
            from gsgen_tpu.models.scene import num_active
            loss = float(m["loss_total"])     # host sync, sparse
            n_active[s] = int(num_active(trainer.state.scene))
            assert np.isfinite(loss), (s, loss)
        dt = time.perf_counter() - t0
        times[s] = dt
        if dt > 1.0:
            stalls.append((s, round(dt, 2)))
        if trainer.dup_bucket != buckets[-1][1]:
            buckets.append((s, trainer.dup_bucket))
    total = time.perf_counter() - t_start

    print(json.dumps({"total_s": round(total, 1),
                      "overall_steps_per_s": round(n_steps / total, 2)}))
    for ph in range(len(resos)):
        lo = 0 if ph == 0 else milestones[ph - 1]
        hi = milestones[ph] if ph < len(milestones) else n_steps
        seg = times[lo:hi]
        if not len(seg):
            continue
        print(json.dumps({
            "phase": ph, "reso": resos[ph], "steps": [lo, hi],
            "median_ms": round(float(np.median(seg)) * 1e3, 1),
            "mean_ms": round(float(np.mean(seg)) * 1e3, 1),
            "steps_per_s_median": round(1.0 / float(np.median(seg)), 1),
            "phase_wall_s": round(float(np.sum(seg)), 1)}))
    print(json.dumps({"stalls_over_1s": stalls[:20],
                      "n_stalls": len(stalls),
                      "stall_total_s": round(sum(d for _, d in stalls), 1)}))
    print(json.dumps({"bucket_growths": buckets,
                      "gaussians_at": n_active,
                      "final_loss": loss,
                      "compile_log": trainer.compile_log}))


if __name__ == "__main__":
    main()
