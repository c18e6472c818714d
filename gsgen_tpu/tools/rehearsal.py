"""Real-weight end-to-end rehearsal: the reference's
``python main.py --config-name=base prompt.prompt='a corgi'`` moment
(/root/reference/main.py:10-33) wired so the driver can run it the day
SD-2.1 + CLIP weights land on disk.

Usage (real weights):
    python -m gsgen_tpu.tools.rehearsal \
        --sd /assets/stable-diffusion-2-1-base \
        --clip /assets/clip-vit-large-patch14 \
        --prompt "a corgi" --steps 50 --out runs/rehearsal

``--sd`` is a diffusers-layout dir (unet/ + vae/ safetensors); --clip a
transformers CLIP text-encoder dir.  Without weights, ``--mock`` runs
the SAME code path (config assembly -> SDS guidance -> jitted train
step -> eval image) on the tiny random-weight preset — the smoke test
`tests/test_tools.py::test_rehearsal_mock` drives it that way.

Assertions: every loss finite, gradient norms finite and nonzero,
Gaussian count sane; writes eval images + a scalars.jsonl to --out.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def build_rehearsal_config(prompt: str, steps: int, sd_path=None,
                           clip_path=None, mock: bool = False,
                           reso: int = 512, num_points: int = 4096,
                           capacity: int = 65536, batch_size: int = 4,
                           dtype: str = "bfloat16"):
    """Assemble the production config (configs/base.yaml semantics) with
    real or mock score-network weights."""
    from ..config import load_config
    overrides = [
        f"trainer.max_steps={steps}",
        f"trainer.batch_size={batch_size}",
        f"init.num_points={num_points}",
        f"init.capacity={capacity}",
        f"data.reso=[{reso}]",
        "renderer.chunk=128",
    ]
    cfg = load_config(Path(__file__).parents[2] / "configs" / "base.yaml",
                      overrides)
    cfg["prompt"]["prompt"] = prompt
    g = cfg["guidance"]
    if mock:
        # same guidance class + SDS math, tiny random-weight UNet
        g["backbone"] = "sd_unet"
        g["backbone_preset"] = "tiny"
    else:
        assert sd_path, "--sd required (or --mock)"
        g["backbone"] = "sd_unet"
        g["backbone_preset"] = "sd21"
        g["weights_path"] = str(sd_path)
        g["backbone_dtype"] = dtype
        if clip_path:
            cfg["prompt"]["model_id"] = str(clip_path)
    return cfg


def run(cfg, out_dir, eval_every: int = 25, eval_reso: int = 256,
        log=print):
    from ..config import build_trainer
    from ..ops.camera import CameraIntrinsics
    from ..training.evaluation import eval_image

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    trainer = build_trainer(cfg)
    steps = cfg["trainer"]["max_steps"]
    scalars_f = (out_dir / "scalars.jsonl").open("w")

    losses = []
    for s in range(steps):
        m = trainer.train_step(s)
        trainer.density_step(s)
        loss = float(m["loss_total"])
        gnorm = float(m.get("grad_norm", np.nan))
        losses.append(loss)
        assert np.isfinite(loss), f"non-finite loss at step {s}: {loss}"
        if np.isfinite(gnorm):
            assert gnorm > 0.0, f"zero grad norm at step {s}"
        scalars_f.write(json.dumps(
            {"step": s, "loss": loss, "grad_norm": gnorm,
             "n_gauss": int(m.get("num_gaussians", -1))}) + "\n")
        if s % 10 == 0:
            log(f"step {s:5d} | loss {loss:.5f}")
        if eval_every and (s + 1) % eval_every == 0:
            img = eval_image(trainer.state.scene,
                             CameraIntrinsics.from_reso(eval_reso),
                             trainer.rcfg, np.random.default_rng(s))
            try:
                import imageio.v2 as imageio
                imageio.imwrite(out_dir / f"eval_{s + 1:05d}.png",
                                (np.clip(img, 0, 1) * 255).astype(np.uint8))
            except ImportError:
                np.save(out_dir / f"eval_{s + 1:05d}.npy", img)
    scalars_f.close()
    log(f"rehearsal done: {steps} steps, final loss {losses[-1]:.5f}, "
        f"outputs in {out_dir}")
    return losses


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sd", default=None,
                    help="diffusers-layout SD-2.1 dir (unet/ + vae/)")
    ap.add_argument("--clip", default=None,
                    help="transformers CLIP text-encoder dir")
    ap.add_argument("--prompt", default="a corgi")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--reso", type=int, default=512)
    ap.add_argument("--out", default="runs/rehearsal")
    ap.add_argument("--mock", action="store_true",
                    help="tiny random-weight backbone (smoke test)")
    args = ap.parse_args(argv)
    cfg = build_rehearsal_config(args.prompt, args.steps, args.sd,
                                 args.clip, mock=args.mock, reso=args.reso)
    run(cfg, args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
