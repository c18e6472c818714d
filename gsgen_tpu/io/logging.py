"""Run directories + TensorBoard/console logging.

The reference logs through a tensorboard SummaryWriter patched into
wandb (trainer.py:194-222 in gsgen3d/gsgen) with run naming
``N|HHMMSS|date|prompt``.  wandb needs network; here TensorBoard (local
files) is primary, with the same run-dir layout
(checkpoints/<prompt>/<date>/<time>/{logs,ckpts,eval}).
"""

from __future__ import annotations

import datetime
import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np


class RunLogger:
    def __init__(self, root="checkpoints", name: str = "run",
                 use_tensorboard: bool = True, use_wandb: bool = False,
                 wandb_kwargs: Optional[Dict] = None):
        now = datetime.datetime.now()
        safe = name.replace(" ", "_")[:80]
        self.dir = (Path(root) / safe / now.strftime("%Y-%m-%d")
                    / now.strftime("%H%M%S"))
        self.ckpt_dir = self.dir / "ckpts"
        self.eval_dir = self.dir / "eval"
        self.log_dir = self.dir / "logs"
        for d in (self.ckpt_dir, self.eval_dir, self.log_dir):
            d.mkdir(parents=True, exist_ok=True)
        self._scalars_file = open(self.dir / "scalars.jsonl", "a")
        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(log_dir=str(self.log_dir))
            except Exception:
                self.tb = None
        # optional remote experiment tracking — the reference syncs TB to
        # wandb (trainer.py:194-221); wandb isn't installed in the
        # zero-egress environment, so this is an import-gated adapter
        # that activates wherever the package (and network) exist
        self.wandb = None
        if use_wandb:
            try:
                import wandb
                self.wandb = wandb.init(
                    name=name, dir=str(self.dir),
                    **(wandb_kwargs or {}))
            except Exception:
                self.wandb = None

    def log_scalars(self, step: int, scalars: Dict[str, float]):
        rec = {"step": step, **{k: float(v) for k, v in scalars.items()}}
        self._scalars_file.write(json.dumps(rec) + "\n")
        self._scalars_file.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), step)
        if self.wandb is not None:
            self.wandb.log({k: float(v) for k, v in scalars.items()},
                           step=step)

    def log_image(self, step: int, name: str, img: np.ndarray):
        """img [H, W, 3] float in [0, 1]; also saved as png under eval/."""
        import imageio.v2 as imageio
        path = self.eval_dir / f"{name.replace('/', '_')}_{step:06d}.png"
        imageio.imwrite(path, (np.clip(img, 0, 1) * 255).astype(np.uint8))
        if self.tb is not None:
            self.tb.add_image(name, np.moveaxis(np.clip(img, 0, 1), -1, 0),
                              step)

    def log_video(self, step: int, name: str, frames: np.ndarray,
                  fps: int = 15, fmt: str = "mp4"):
        """frames [T, H, W, 3] float in [0, 1] -> eval/<name>_<step>.mp4/gif
        (trainer.py:519-574 eval_video_step)."""
        import imageio.v2 as imageio
        u8 = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
        safe = name.replace("/", "_")
        path = self.eval_dir / f"{safe}_{step:06d}.{fmt}"
        try:
            if fmt == "gif":
                imageio.mimwrite(path, u8, duration=1000.0 / fps, loop=0)
            else:
                imageio.mimwrite(path, u8, fps=fps)
        except Exception:
            # ffmpeg unavailable -> fall back to gif
            path = self.eval_dir / f"{safe}_{step:06d}.gif"
            imageio.mimwrite(path, u8, duration=1000.0 / fps, loop=0)
        return str(path)

    def save_config(self, blob: Dict):
        (self.dir / "config.json").write_text(
            json.dumps(blob, indent=2, default=str))

    def snapshot_code(self, repo_root="."):
        """Archive the git-tracked sources into the run dir for exact
        reproducibility (reference save_code_snapshot, trainer.py:268-283)."""
        import subprocess
        try:
            files = subprocess.run(
                ["git", "ls-files"], cwd=repo_root, check=True,
                capture_output=True, text=True).stdout.splitlines()
            import tarfile
            with tarfile.open(self.dir / "code_snapshot.tar.gz", "w:gz") as t:
                for f in files:
                    p = Path(repo_root) / f
                    if p.exists():
                        t.add(p, arcname=f)
            return str(self.dir / "code_snapshot.tar.gz")
        except Exception as e:       # not a git repo etc — non-fatal
            (self.dir / "code_snapshot_skipped.txt").write_text(str(e))
            return None

    def close(self):
        self._scalars_file.close()
        if self.tb is not None:
            self.tb.close()
