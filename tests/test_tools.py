"""Sweep expansion, Adan optimizer, web viewer render path."""

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from gsgen_tpu.training.adan import adan_init, adan_update
from gsgen_tpu.utils.sweep import generate_sweep_configs


def test_sweep_expansion(tmp_path):
    spec = {
        "joint_fields": ["trainer.max_steps", "trainer.batch_size"],
        "trainer.max_steps": [100, 200],
        "trainer.batch_size": [2, 4],
        "init.num_points": [256, 1024],
    }
    paths = generate_sweep_configs("configs/smoke.yaml", spec,
                                   out_dir=str(tmp_path))
    assert len(paths) == 4          # 2 cross x 2 joint
    cfgs = [yaml.safe_load(open(p)) for p in paths]
    seen = {(c["trainer"]["max_steps"], c["trainer"]["batch_size"],
             c["init"]["num_points"]) for c in cfgs}
    assert seen == {(100, 2, 256), (200, 4, 256), (100, 2, 1024),
                    (200, 4, 1024)}


def test_adan_converges_quadratic():
    # minimize ||x - 3||^2 (anneal lr to kill the terminal oscillation)
    p = {"x": jnp.zeros(4)}
    st = adan_init(p)

    @jax.jit
    def step(p, st, lr):
        g = {"x": 2.0 * (p["x"] - 3.0)}
        return adan_update(g, st, p, lr)

    for i in range(300):
        p, st = step(p, st, 0.1 if i < 200 else 0.005)
    np.testing.assert_allclose(np.asarray(p["x"]), 3.0, atol=0.05)


def test_viewer_render():
    from gsgen_tpu.io.viewer import SceneViewer
    from gsgen_tpu.models.init import InitConfig, initialize
    from gsgen_tpu.models.scene import RenderConfig
    rcfg = RenderConfig(dup_cap=4096, chunk=64, tile_size=8)
    state = initialize(jax.random.PRNGKey(0),
                       InitConfig(num_points=64, svec_val=0.05), rcfg)
    v = SceneViewer(state, rcfg)
    jpeg = v.render(azimuth=30, elevation=20, distance=2.5, reso=64)
    assert jpeg[:2] == b"\xff\xd8"     # JPEG magic
    assert len(jpeg) > 500


def test_viewer_http_roundtrip():
    import urllib.request
    from gsgen_tpu.io.viewer import SceneViewer
    from gsgen_tpu.models.init import InitConfig, initialize
    from gsgen_tpu.models.scene import RenderConfig
    rcfg = RenderConfig(dup_cap=4096, chunk=64, tile_size=8)
    state = initialize(jax.random.PRNGKey(0),
                       InitConfig(num_points=32, svec_val=0.05), rcfg)
    v = SceneViewer(state, rcfg, port=18491)
    v.serve(blocking=False)
    try:
        html = urllib.request.urlopen(
            "http://localhost:18491/", timeout=30).read()
        assert b"gsgen-tpu viewer" in html
        img = urllib.request.urlopen(
            "http://localhost:18491/render?azimuth=0&elevation=20"
            "&distance=2.5&reso=64", timeout=60).read()
        assert img[:2] == b"\xff\xd8"
        # multi-client: concurrent renders from several threads
        # serialize on the device lock and all succeed
        import concurrent.futures as cf
        import json as _json
        def fetch(az):
            return urllib.request.urlopen(
                f"http://localhost:18491/render?azimuth={az}"
                "&elevation=10&distance=2.5&reso=64", timeout=60).read()
        with cf.ThreadPoolExecutor(4) as ex:
            outs = list(ex.map(fetch, [0, 45, 90, 135]))
        assert all(o[:2] == b"\xff\xd8" for o in outs)
        # live-training attachment + stats endpoint
        v.update_state(state, step=123)
        stats = _json.loads(urllib.request.urlopen(
            "http://localhost:18491/stats", timeout=30).read())
        assert stats["step"] == 123 and stats["num_gaussians"] == 32
    finally:
        v.httpd.shutdown()


def test_rehearsal_mock(tmp_path):
    """The real-weight rehearsal code path (config assembly -> SDS with
    an sd_unet backbone -> jitted steps -> eval image) on the tiny
    random-weight preset — what runs the day SD-2.1 weights land."""
    import json

    import numpy as np

    from gsgen_tpu.tools.rehearsal import build_rehearsal_config, run

    cfg = build_rehearsal_config("a corgi", steps=2, mock=True, reso=32,
                                 num_points=32, capacity=64, batch_size=1)
    # shrink heavy knobs for CPU (the point is config-assembly drift,
    # not scale — pinned in the FAST tier per the round-3 verdict)
    cfg["renderer"]["dup_cap"] = 2048
    cfg["renderer"]["chunk"] = 32
    cfg["renderer"]["densify"]["enabled"] = False
    losses = run(cfg, tmp_path, eval_every=2, eval_reso=32,
                 log=lambda *a: None)
    assert len(losses) == 2 and all(np.isfinite(losses))
    lines = [json.loads(l) for l in
             (tmp_path / "scalars.jsonl").read_text().splitlines()]
    assert len(lines) == 2
    evals = list(tmp_path.glob("eval_*"))
    assert evals, "no eval image written"


def test_sweep_scheduler(tmp_path):
    """Slot scheduler launches each config exactly once and reaps."""
    import json
    import sys
    from gsgen_tpu.utils import sweep as sw

    # subprocess stub: instead of real training, each 'config' is a
    # marker file the child writes — scheduling logic is what's under test
    paths = [str(tmp_path / f"{i}.yaml") for i in range(3)]
    for p in paths:
        open(p, "w").write("{}")
    import subprocess
    real_popen = subprocess.Popen
    launched = []

    def fake_popen(args, env=None):
        launched.append(env.get("SLOT_ID", "?"))
        return real_popen([sys.executable, "-c", "pass"])
    subprocess.Popen = fake_popen
    try:
        res = sw.run_sweep_scheduled(
            paths, slots=[{"SLOT_ID": "a"}, {"SLOT_ID": "b"}], poll_s=0.05)
    finally:
        subprocess.Popen = real_popen
    assert len(res) == 3
    assert all(r["returncode"] == 0 for r in res)
    assert set(launched) <= {"a", "b"} and len(launched) == 3
