"""Training stack: optimizer, schedules, density control, end-to-end loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsgen_tpu.data.cameras import CameraPoseProvider, CameraSamplerConfig
from gsgen_tpu.guidance.mock import MockGuidance
from gsgen_tpu.models.background import BackgroundConfig
from gsgen_tpu.models.density import (DensifyConfig, PruneConfig, densify,
                                      prune, should_run)
from gsgen_tpu.models.init import InitConfig, initialize
from gsgen_tpu.models.scene import RenderConfig, num_active
from gsgen_tpu.training.optimizer import (adam_init, adam_update,
                                          mask_state_rows)
from gsgen_tpu.training.trainer import Trainer, TrainerConfig
from gsgen_tpu.utils.schedule import C, make_lr_schedule

RCFG = RenderConfig(dup_cap=8192, chunk=64)


def test_C_schedule():
    assert C(0.5, 100) == 0.5
    assert C([0.98, 0.5, 100], 0) == 0.98
    assert C([0.98, 0.5, 100], 50) == pytest.approx(0.74)
    assert C([0.98, 0.5, 100], 200) == 0.5
    assert C([10, 1.0, 2.0, 20], 15) == pytest.approx(1.5)
    # fractional end_step scales by max_steps
    assert C([0, 0.0, 1.0, 0.5], 50, max_steps=200) == pytest.approx(0.5)
    # sqrt interp starts at v1 and decays toward v0
    assert C([0, 2.0, 4.0, 100, "sqrt"], 0) == 4.0
    assert C([0, 2.0, 4.0, 100, "sqrt"], 100) == 2.0
    # alternative flips between values
    assert C([0, 1.0, 9.0, 10, "alternative"], 5) == 1.0
    assert C([0, 1.0, 9.0, 10, "alternative"], 15) == 9.0


def test_lr_schedules():
    fn = make_lr_schedule([0.005, 3e-5, 1000, "exp"])
    assert fn(0) == pytest.approx(0.005)
    assert fn(1000) == pytest.approx(3e-5, rel=1e-5)
    assert fn(500) == pytest.approx(np.exp((np.log(0.005) + np.log(3e-5)) / 2))
    assert make_lr_schedule(0.01)(123) == 0.01


def test_adam_matches_torch_semantics():
    # hand-check one step: g constant => p1 = p0 - lr * g/|g| (approx)
    p = {"x": jnp.array([1.0, 2.0])}
    g = {"x": jnp.array([0.5, -0.5])}
    st = adam_init(p)
    p1, st = adam_update(g, st, p, 0.1)
    np.testing.assert_allclose(np.asarray(p1["x"]), [0.9, 2.1], atol=1e-6)
    # second step keeps moving the same way
    p2, st = adam_update(g, st, p1, 0.1)
    assert p2["x"][0] < p1["x"][0] and p2["x"][1] > p1["x"][1]


def test_mask_state_rows():
    p = {"a": jnp.ones((4, 3)), "b": jnp.ones((2,))}
    st = adam_init(p)
    st = st._replace(mu={"a": jnp.ones((4, 3)), "b": jnp.ones((2,))})
    keep = jnp.array([True, False, True, False])
    st2 = mask_state_rows(st, keep)
    np.testing.assert_allclose(np.asarray(st2.mu["a"][1]), 0.0)
    np.testing.assert_allclose(np.asarray(st2.mu["a"][0]), 1.0)
    np.testing.assert_allclose(np.asarray(st2.mu["b"]), 1.0)  # untouched


def test_should_run():
    assert should_run(2000, True, 2000, 9999, 1000)
    assert not should_run(1999, True, 2000, 9999, 1000)
    assert not should_run(10000, True, 2000, 9999, 1000)
    assert not should_run(2500, True, 2000, 9999, 1000)


def test_densify_clone_split_capacity():
    state = initialize(jax.random.PRNGKey(0),
                       InitConfig(num_points=32, capacity=128, svec_val=0.05),
                       RCFG)
    # force every gaussian hot: large grad stats
    state = state._replace(grad_accum=jnp.ones(128) * 10.0,
                           grad_cnt=jnp.ones(128))
    opt = adam_init(state.params)
    cfg = DensifyConfig(mean2d_thresh=0.01, split_thresh=0.01, use_legacy=True)
    s2, opt2, info = densify(state, opt, cfg, RCFG, jax.random.PRNGKey(1))
    # legacy: svec 0.05 > thresh 0.01 -> all split in 2, source REMOVED
    # (gs/gaussian_splatting.py:879-885 copies only ~split_mask rows),
    # so net growth per split is +1: 32 -> 64
    assert int(info["num_split"]) == 64        # 2 copies x 32 sources
    assert int(info["num_clone"]) == 0
    assert int(num_active(s2)) == 64
    assert int(num_active(s2)) <= 128          # capacity respected
    # stats reset
    assert float(jnp.sum(s2.grad_accum)) == 0.0


def test_densify_growth_parity():
    """Net growth == num_clone + num_split (legacy, 2 copies - source) and
    num_clone + (n_splits-1)*n_split_sources (official) — the reference's
    count dynamics (gs/gaussian_splatting.py:841-845 legacy,
    :601-613 official)."""
    def mk(svec_val):
        state = initialize(jax.random.PRNGKey(0),
                           InitConfig(num_points=32, capacity=512,
                                      svec_val=svec_val), RCFG)
        return state._replace(grad_accum=jnp.ones(512) * 10.0,
                              grad_cnt=jnp.ones(512))

    # mixed scene: 16 big (split) + 16 small (clone)
    state = mk(0.05)
    raw_small = state.params.svec.at[:16].set(
        state.params.svec[0] * 0.0 - 6.0)   # exp(-6) ~ 0.0025 < thresh
    state = state._replace(params=state.params._replace(svec=raw_small))
    opt = adam_init(state.params)

    # legacy: net = num_clone + num_split_sources (= num_split/2)
    cfg = DensifyConfig(mean2d_thresh=0.01, split_thresh=0.01,
                        use_legacy=True)
    s2, _, info = densify(state, opt, cfg, RCFG, jax.random.PRNGKey(1))
    n_clone, n_split = int(info["num_clone"]), int(info["num_split"])
    assert n_clone == 16 and n_split == 32
    assert int(num_active(s2)) == 32 + n_clone + n_split - 16

    # official n_splits=2: same arithmetic via the official branch
    cfg = DensifyConfig(mean2d_thresh=0.01, split_thresh=0.01,
                        use_legacy=False, type="official", n_splits=2)
    s3, _, info = densify(state, opt, cfg, RCFG, jax.random.PRNGKey(1))
    n_clone, n_split = int(info["num_clone"]), int(info["num_split"])
    assert n_clone == 16 and n_split == 32
    assert int(num_active(s3)) == 32 + n_clone + (n_split - 16)


def test_prune_by_alpha():
    state = initialize(jax.random.PRNGKey(0),
                       InitConfig(num_points=32, capacity=32, alpha_val=0.8),
                       RCFG)
    # make half the gaussians transparent
    raw = state.params.alpha.at[:16].set(-10.0)
    state = state._replace(params=state.params._replace(alpha=raw))
    opt = adam_init(state.params)
    cfg = PruneConfig(enabled=True, alpha_thresh=0.5, radii2d_thresh=0.0)
    s2, opt2, info = prune(state, opt, cfg, RCFG, 0.0, 0.5)
    assert int(info["num_pruned_alpha"]) == 16
    assert int(num_active(s2)) == 16


def test_pose_provider_curriculum():
    cfg = CameraSamplerConfig(batch_size=2, max_steps=100, reso=(32, 64),
                              reso_milestones=(50,), azimuth_warmup=0.5,
                              stratified_on_azimuth=False)
    p = CameraPoseProvider(cfg, seed=0)
    p.update(0)
    assert p.reso == 32
    assert p.azimuth_bound[1] == pytest.approx(0.0, abs=1e-2)
    p.update(60)
    assert p.reso == 64
    assert p.azimuth_bound[1] > 100
    b = p.get_batch()
    assert b["c2w"].shape == (2, 3, 4)
    # camera looks at ~origin: center + lookat*dist ~ 0
    look = b["c2w"][:, :, 2] * b["camera_distance"][:, None]
    np.testing.assert_allclose(b["c2w"][:, :, 3] + look, 0.0, atol=0.3)


def test_trainer_end_to_end_loss_decreases():
    tcfg = TrainerConfig(max_steps=60, batch_size=2, grad_accum=1,
                         lr=dict(mean=0.01, svec=0.01, qvec=0.003,
                                 color=0.05, alpha=0.01, bg=0.003))
    trainer = Trainer(
        cfg=tcfg, rcfg=RCFG,
        init_cfg=InitConfig(num_points=128, capacity=256, svec_val=0.05,
                            mean_std=0.4),
        bg_cfg=BackgroundConfig(type="fixed", color=(1.0, 1.0, 1.0)),
        data_cfg=CameraSamplerConfig(batch_size=2, max_steps=60, reso=(24,),
                                     camera_distance=(2.0, 2.5)),
        guidance=MockGuidance(mode="constant_color", color=(0.9, 0.2, 0.1)),
        dcfg=DensifyConfig(enabled=False),
        pcfg=PruneConfig(enabled=False),
    )
    losses = []
    for s in range(30):
        m = trainer.train_step(s)
        losses.append(float(m["loss_total"]))
    # per-view loss is noisy; compare window means
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses
    assert np.isfinite(losses).all()


def test_trainer_grad_accum():
    tcfg = TrainerConfig(max_steps=10, batch_size=1, grad_accum=2)
    trainer = Trainer(
        cfg=tcfg, rcfg=RCFG,
        init_cfg=InitConfig(num_points=32, capacity=32, svec_val=0.05),
        bg_cfg=BackgroundConfig(type="fixed"),
        data_cfg=CameraSamplerConfig(batch_size=1, max_steps=10, reso=(16,)),
        guidance=MockGuidance(),
        dcfg=DensifyConfig(enabled=False), pcfg=PruneConfig(enabled=False))
    m = trainer.train_step(0)
    assert np.isfinite(float(m["loss_total"]))
    # densify stats accumulated over both micro-batches
    assert float(jnp.max(trainer.state.scene.grad_cnt)) >= 2.0


def test_dup_bucket_adjustment():
    tcfg = TrainerConfig(max_steps=10, batch_size=1, dup_bucket_min=1 << 10)
    trainer = Trainer(
        cfg=tcfg, rcfg=RCFG,
        init_cfg=InitConfig(num_points=16, capacity=16),
        bg_cfg=BackgroundConfig(type="fixed"),
        data_cfg=CameraSamplerConfig(batch_size=1, max_steps=10, reso=(16,)),
        guidance=MockGuidance(),
        dcfg=DensifyConfig(enabled=False), pcfg=PruneConfig(enabled=False))
    cap0 = trainer.dup_bucket
    # near-overflow grows immediately
    trainer._adjust_dup_bucket(int(0.9 * cap0))
    assert trainer.dup_bucket == cap0 * 2
    # persistent undersubscription shrinks after 20 feedback events
    for _ in range(19):
        trainer._adjust_dup_bucket(10)
    assert trainer.dup_bucket == cap0 * 2
    trainer._adjust_dup_bucket(10)
    assert trainer.dup_bucket == cap0
    # a busy frame resets the shrink streak
    for _ in range(10):
        trainer._adjust_dup_bucket(10)
    trainer._adjust_dup_bucket(int(0.5 * cap0))
    for _ in range(19):
        trainer._adjust_dup_bucket(10)
    assert trainer.dup_bucket == cap0


def test_profiling_trace_and_field_stats(tmp_path):
    from gsgen_tpu.utils.profiling import annotate, field_stats, trace
    from gsgen_tpu.io.logging import RunLogger

    with trace(str(tmp_path / "prof")):
        with annotate("probe"):
            jnp.sum(jnp.ones((64, 64))).block_until_ready()
    assert list((tmp_path / "prof").rglob("*"))   # trace artifacts written

    stats = field_stats({"mean": jnp.arange(4.0), "alpha": jnp.ones(3),
                         "specular": None})
    assert stats["fields/mean/max"] == 3.0
    assert stats["fields/alpha/rms"] == pytest.approx(1.0)
    assert not any("specular" in k for k in stats)

    # trainer wiring: profile window + field stats land in scalars.jsonl
    import json
    logger = RunLogger(root=str(tmp_path / "runs"), name="t",
                       use_tensorboard=False)
    tcfg = TrainerConfig(max_steps=3, batch_size=1, profile_steps=(1, 2),
                         field_stats_period=1, eval_image_period=0,
                         eval_video_period=0, save_period=0)
    trainer = Trainer(
        cfg=tcfg, rcfg=RCFG,
        init_cfg=InitConfig(num_points=32, capacity=32, svec_val=0.05),
        bg_cfg=BackgroundConfig(type="fixed"),
        data_cfg=CameraSamplerConfig(batch_size=1, max_steps=3, reso=(16,)),
        guidance=MockGuidance(),
        dcfg=DensifyConfig(enabled=False), pcfg=PruneConfig(enabled=False),
        logger=logger)
    trainer.fit(n_steps=2)
    lines = [json.loads(l) for l in
             open(logger.dir / "scalars.jsonl").read().splitlines()]
    assert any("fields/mean/rms" in rec for rec in lines)
    assert (logger.dir / "profile").exists()


def test_fit_resumed_stops_at_max_steps_total():
    """fit() on a resumed trainer continues to cfg.max_steps TOTAL
    (reference train_loop: range(self.step, cfg.max_steps)), not for
    another full trajectory; fit(n) still means n MORE steps."""
    tr = Trainer(
        cfg=TrainerConfig(max_steps=7, batch_size=1),
        rcfg=RCFG,
        init_cfg=InitConfig(num_points=32, capacity=32, svec_val=0.05),
        bg_cfg=BackgroundConfig(type="fixed"),
        data_cfg=CameraSamplerConfig(batch_size=1, max_steps=7, reso=(16,)),
        guidance=MockGuidance(),
        dcfg=DensifyConfig(enabled=False), pcfg=PruneConfig(enabled=False))
    tr.fit(3)
    assert int(tr.state.step) == 3
    tr.fit()                      # to max_steps total
    assert int(tr.state.step) == 7
    tr.fit()                      # already there: no-op
    assert int(tr.state.step) == 7
    tr.fit(2)                     # explicit n always runs n more
    assert int(tr.state.step) == 9
