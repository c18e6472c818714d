"""The reference's headline user journey through main.py, end to end at
tiny scale: train (SDS, real guidance class, tiny SD-shape backbone)
-> eval images/videos + guidance samples -> checkpoint -> upsample
fine-tune -> ply/splat/mesh export — all artifacts land in the run dir
(reference trainer.py:576-857 + main.py semantics).  The full-scale
on-chip version of this trajectory is the flagship run recorded in
BASELINE.md."""

import sys

import numpy as np


def test_main_full_journey(tmp_path, monkeypatch):
    # xdist workers don't put the repo root on sys.path: load main.py
    # by explicit path
    import importlib.util
    import pathlib
    root = pathlib.Path(__file__).parents[1]
    spec = importlib.util.spec_from_file_location("gsgen_main",
                                                  root / "main.py")
    main_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(main_mod)

    cfg = tmp_path / "journey.yaml"
    cfg.write_text("""
include: [base, upsample_tune/base]
init: {num_points: 64, capacity: 128}
renderer: {dup_cap: 16384, chunk: 128}
trainer:
  batch_size: 1
  max_steps: 12
  log_period: 5
  eval_image_period: 5
  eval_video_period: 10
  save_period: 10
  guidance_eval_period: 5
  guidance_eval_steps: 2
data: {reso: [32], reso_milestones: []}
guidance: {type: sds, backbone: sd_unet, backbone_preset: tiny}
upsample_tune:
  enabled: true
  num_poses: 2
  batch_size: 2
  epoch: 1
  reso: 64
  use_cache: false
export: {types: [ply, splat, mesh]}
""")
    # configs root must resolve for the include: run from the repo root
    monkeypatch.chdir(__import__("pathlib").Path(__file__).parents[1])
    monkeypatch.setattr("gsgen_tpu.io.logging.RunLogger.snapshot_code",
                        lambda self, repo_root=".": None)

    import gsgen_tpu.io.logging as logging_mod
    made = {}
    orig = logging_mod.RunLogger.__init__

    def patched(self, root="checkpoints", name="run", **kw):
        orig(self, root=str(tmp_path / "runs"), name=name, **kw)
        made["dir"] = self.dir
    monkeypatch.setattr(logging_mod.RunLogger, "__init__", patched)

    assert main_mod.main(["--config", str(cfg)]) == 0
    run = made["dir"]
    names = {p.name for p in run.rglob("*")}
    for want in ("scene.ply", "scene.splat", "scene.obj",
                 "eval_image_000005.png", "eval_orbit_000010.gif",
                 "eval_guidance_sample_000005.png", "scalars.jsonl"):
        assert want in names, (want, sorted(names))
    assert (run / "ckpts" / "step_12").exists()   # final save after tune
    # resume: a second invocation from the mid-run ckpt continues
    assert main_mod.main(["--config", str(cfg), "--steps", "2",
                          f"ckpt={run / 'ckpts' / 'step_10'}",
                          "upsample_tune.enabled=false"]) == 0
