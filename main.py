"""CLI entry point: train a text-to-3D Gaussian scene.

Usage (reference README.md:41 equivalent):
    python main.py --config configs/base.yaml prompt.prompt="a corgi"
    python main.py --config configs/base.yaml ckpt=path/to/step_2000
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/base.yaml")
    ap.add_argument("--no-log", action="store_true",
                    help="disable run dir / tensorboard")
    ap.add_argument("--steps", type=int, default=None,
                    help="override number of steps to run")
    ap.add_argument("--tune-only", action="store_true",
                    help="skip training; run only the upsample "
                         "fine-tune on a resumed ckpt (reference "
                         "main.py upsample_tune_only mode)")
    ap.add_argument("overrides", nargs="*",
                    help="dotted config overrides, e.g. trainer.max_steps=100")
    args = ap.parse_args(argv)

    from gsgen_tpu.config import build_trainer, load_config
    from gsgen_tpu.io.logging import RunLogger

    overrides = [o for o in args.overrides if "=" in o]
    ckpt = None
    for o in list(overrides):
        if o.startswith("ckpt="):
            ckpt = o.split("=", 1)[1]
            overrides.remove(o)
    cfg = load_config(args.config, overrides)

    logger = None
    if not args.no_log:
        name = cfg.get("prompt", {}).get("prompt", "run")
        logger = RunLogger(name=name)
        logger.save_config(cfg)
        logger.snapshot_code()
        print(f"run dir: {logger.dir}")

    trainer = build_trainer(cfg, logger=logger)
    if ckpt:
        step = trainer.load(ckpt)
        print(f"resumed from {ckpt} at step {step}")

    def cb(step, metrics):
        if step % trainer.cfg.log_period == 0:
            loss = metrics.get("loss_total")
            n = metrics.get("num_gaussians", "")
            print(f"step {step:6d} | loss {float(loss):.5f} | {n}")

    up_d = dict(cfg.get("upsample_tune") or {})
    tune_enabled = up_d.pop("enabled", False)
    if not (tune_enabled and args.tune_only):
        trainer.fit(args.steps, callback=cb)

    # post-training upsample fine-tune (reference
    # tune_with_upsample_model, trainer.py:736-857; conf/upsample_tune)
    if tune_enabled:
        from gsgen_tpu.training.upsample import (UpsampleTuneConfig,
                                                 tune_with_upsample)
        import dataclasses as _dc
        known = {f.name for f in _dc.fields(UpsampleTuneConfig)}
        ucfg = UpsampleTuneConfig(
            **{k: v for k, v in up_d.items() if k in known})
        uid = cfg.get("prompt", {}).get("prompt", "run").replace(" ", "_")
        print("upsample fine-tune...")
        tune_with_upsample(trainer, ucfg, cache_uid=uid)

    # final checkpoint + asset export into the run dir (reference
    # utils/export.py: ply/splat/mesh)
    if logger is not None:
        from gsgen_tpu.io.checkpoint import save_checkpoint
        step_final = int(trainer.state.step)
        save_checkpoint(logger.ckpt_dir, step_final, trainer.state)
        exp = cfg.get("export") or {}
        types = exp.get("types", ["ply", "splat"])
        if types:
            from gsgen_tpu.io import export as ex
            scene = trainer.state.scene
            base = logger.dir / "exports"
            base.mkdir(exist_ok=True)
            for t in types:
                path = base / f"scene.{t if t != 'mesh' else 'obj'}"
                if t == "ply":
                    ex.to_ply(scene.params, scene.active, path)
                elif t == "splat":
                    ex.to_splat(scene.params, scene.active, path,
                                trainer.rcfg)
                elif t == "mesh":
                    ex.to_mesh(scene.params, scene.active, trainer.rcfg,
                               path)
            print(f"exports: {base}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
