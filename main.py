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

    trainer.fit(args.steps, callback=cb)
    return 0


if __name__ == "__main__":
    sys.exit(main())
