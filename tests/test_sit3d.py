"""Image-to-3D pipeline, aux point guidance, upsample tune."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsgen_tpu.data.cameras import (CameraSamplerConfig,
                                    SingleViewCameraPoseProvider)
from gsgen_tpu.guidance.mock import MockGuidance
from gsgen_tpu.guidance.point_e_aux import (MockPointDiffusion,
                                            PointEAuxConfig,
                                            PointEAuxGuidance)
from gsgen_tpu.models.background import BackgroundConfig
from gsgen_tpu.models.density import DensifyConfig, PruneConfig
from gsgen_tpu.models.init import InitConfig
from gsgen_tpu.models.scene import RenderConfig, num_active
from gsgen_tpu.ops.camera import CameraIntrinsics
from gsgen_tpu.training.sit3d import (ImageTarget, image_initialize,
                                      lift_to_3d)
from gsgen_tpu.training.trainer import Trainer, TrainerConfig, LossConfig

RCFG = RenderConfig(dup_cap=8192, chunk=64, tile_size=8)
INTR = CameraIntrinsics.from_reso(32)
C2W = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.0]], jnp.float32)


def make_target():
    # circular foreground, depth = distance to camera plane
    yy, xx = jnp.meshgrid(jnp.arange(32), jnp.arange(32), indexing="ij")
    mask = ((xx - 16) ** 2 + (yy - 16) ** 2) < 100
    img = jnp.where(mask[..., None], jnp.array([0.8, 0.2, 0.2]), 1.0)
    depth = jnp.full((32, 32), 2.0)
    return ImageTarget(image=img, depth=depth, mask=mask)


def test_lift_to_3d_geometry():
    depth = jnp.full((32, 32), 2.0)
    pts = lift_to_3d(depth, INTR, C2W)
    # center pixel goes through lookat: z distance ~ depth from camera
    center = pts[16, 16]
    cam = C2W[:3, 3]
    np.testing.assert_allclose(float(jnp.linalg.norm(center - cam)), 2.0,
                               rtol=0.05)


def test_image_initialize_and_mask():
    t = make_target()
    state, gmask = image_initialize(
        jax.random.PRNGKey(0), InitConfig(num_points=64, capacity=256,
                                          svec_val=0.05, mean_std=0.5),
        RCFG, t, INTR, C2W)
    assert int(num_active(state)) == 128        # front 64 + back 64
    assert gmask is not None and int(gmask.sum()) == 64
    assert bool(jnp.isfinite(state.params.mean).all())


def test_single_view_sampler():
    p = SingleViewCameraPoseProvider(
        CameraSamplerConfig(batch_size=4, max_steps=10, reso=(32,)),
        original_view_prob=1.0)
    b = p.get_batch()
    assert (b["is_original"] == 1.0).all()
    p2 = SingleViewCameraPoseProvider(
        CameraSamplerConfig(batch_size=4, max_steps=10, reso=(32,)),
        original_view_prob=0.0)
    assert (p2.get_batch()["is_original"] == 0.0).all()


def test_sit3d_training_reduces_image_loss():
    t = make_target()
    state, gmask = image_initialize(
        jax.random.PRNGKey(0), InitConfig(num_points=48, capacity=128,
                                          svec_val=0.08, mean_std=0.5),
        RCFG, t, INTR, C2W)
    tr = Trainer(
        cfg=TrainerConfig(max_steps=30, batch_size=2,
                          loss=LossConfig(sds=0.01, image=10.0, depth=0.1),
                          lr=dict(mean=0.005, svec=0.01, qvec=0.003,
                                  color=0.1, alpha=0.01, bg=0.003),
                          eval_image_period=0, eval_video_period=0,
                          save_period=0),
        rcfg=RCFG,
        init_cfg=InitConfig(num_points=8, capacity=128),
        bg_cfg=BackgroundConfig(type="fixed"),
        data_cfg=CameraSamplerConfig(batch_size=2, max_steps=30, reso=(32,)),
        guidance=MockGuidance(),
        dcfg=DensifyConfig(enabled=False), pcfg=PruneConfig(enabled=False),
        image_target=t, grad_mask=gmask, mask_steps=(0, 10))
    tr.state = tr.state._replace(scene=state)   # use the image init
    tr.data = SingleViewCameraPoseProvider(
        CameraSamplerConfig(batch_size=2, max_steps=30, reso=(32,)),
        original_view_prob=0.7)
    losses = []
    for s in range(20):
        m = tr.train_step(s)
        losses.append(float(m["loss_image"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # masked front points did not move during the mask window
    front = np.asarray(state.params.mean)[:48]
    now = np.asarray(tr.state.scene.params.mean)[:48]
    # mask window ended at step 10, so they may move after; rerun fresh
    # trainer with window covering everything to assert freezing
    tr2 = Trainer(
        cfg=tr.cfg, rcfg=RCFG, init_cfg=InitConfig(num_points=8, capacity=128),
        bg_cfg=BackgroundConfig(type="fixed"),
        data_cfg=CameraSamplerConfig(batch_size=2, max_steps=30, reso=(32,)),
        guidance=MockGuidance(), dcfg=DensifyConfig(enabled=False),
        pcfg=PruneConfig(enabled=False), image_target=t, grad_mask=gmask,
        mask_steps=(0, 1000))
    tr2.state = tr2.state._replace(scene=state)
    tr2.data = tr.data
    for s in range(5):
        tr2.train_step(s)
    frozen = np.asarray(tr2.state.scene.params.mean)[:48]
    np.testing.assert_allclose(frozen, front, atol=1e-7)


def test_point_e_aux_guidance():
    g = PointEAuxGuidance(PointEAuxConfig(num_points=64))
    key = jax.random.PRNGKey(0)
    mean = jax.random.normal(key, (200, 3)) * 0.4
    color = jax.random.uniform(key, (200, 3))
    active = jnp.arange(200) < 150

    def loss(mean):
        return g.loss(g.params, mean, color, active, None,
                      jax.random.PRNGKey(1))["loss_aux"]

    v, grad = jax.value_and_grad(loss)(mean)
    assert np.isfinite(float(v))
    assert bool(jnp.isfinite(grad).all())
    # only gradients for (active, FPS-selected) points are nonzero
    assert float(jnp.abs(grad[150:]).max()) == 0.0


def test_upsample_tune():
    from gsgen_tpu.training.upsample import (UpsampleTuneConfig,
                                             tune_with_upsample)
    tr = Trainer(
        cfg=TrainerConfig(max_steps=10, batch_size=2, eval_image_period=0,
                          eval_video_period=0, save_period=0),
        rcfg=RCFG,
        init_cfg=InitConfig(num_points=64, capacity=64, svec_val=0.06,
                            mean_std=0.4),
        bg_cfg=BackgroundConfig(type="fixed"),
        data_cfg=CameraSamplerConfig(batch_size=2, max_steps=10, reso=(32,)),
        guidance=MockGuidance(),
        dcfg=DensifyConfig(enabled=False), pcfg=PruneConfig(enabled=False))
    losses = tune_with_upsample(
        tr, UpsampleTuneConfig(num_poses=4, batch_size=2, reso=64, epoch=3,
                               use_cache=False))
    assert np.isfinite(losses).all()
    # targets are upsampled self-renders, so the loss starts near its
    # floor — just require it doesn't blow up
    assert np.mean(losses[-2:]) < np.mean(losses[:2]) * 2.0


def test_make_it_3d_clip_loss():
    from gsgen_tpu.guidance.make_it_3d import (MakeIt3DConfig,
                                               MakeIt3DGuidance)
    t = make_target()
    g = MakeIt3DGuidance(MakeIt3DConfig(backbone_latent_size=8,
                                        guidance_scale=7.5),
                         ref_image=t.image)
    # identical image -> clip loss ~ 0; different image -> larger
    same = jnp.stack([t.image, t.image])
    diff = jnp.stack([1.0 - t.image, t.image])
    is_orig = jnp.array([0.0, 1.0])
    l_same = float(g.clip_ref_loss(same, is_orig))
    l_diff = float(g.clip_ref_loss(diff, is_orig))
    assert l_same < 1e-5
    assert l_diff > l_same
