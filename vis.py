"""Serve a trained checkpoint in the web viewer (reference vis.py).

Usage: python vis.py <ckpt_dir_or_step_dir> [--port 8090] [--config configs/base.yaml]
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--port", type=int, default=8090)
    ap.add_argument("--config", default="configs/base.yaml")
    args = ap.parse_args()

    from gsgen_tpu.config import build_trainer, load_config
    from gsgen_tpu.io.viewer import SceneViewer

    cfg = load_config(args.config)
    trainer = build_trainer(cfg)
    step = trainer.load(args.ckpt)
    print(f"loaded step {step}")
    SceneViewer(trainer.state.scene, trainer.rcfg, port=args.port).serve()


if __name__ == "__main__":
    main()
