"""IF-II-style diffusion upsampler + upsample-tune config wiring
(reference guidance/deep_floyd.py:353-389, trainer.py:736-857)."""

import numpy as np
import jax
import jax.numpy as jnp

from gsgen_tpu.data.cameras import CameraSamplerConfig
from gsgen_tpu.guidance.mock import MockGuidance
from gsgen_tpu.guidance.upsampler import (DiffusionUpsampler, TINY_SR,
                                          UpsamplerConfig)
from gsgen_tpu.models.background import BackgroundConfig
from gsgen_tpu.models.density import DensifyConfig, PruneConfig
from gsgen_tpu.models.init import InitConfig
from gsgen_tpu.models.scene import RenderConfig, num_active
from gsgen_tpu.training.trainer import Trainer, TrainerConfig

RCFG = RenderConfig(dup_cap=4096, chunk=64)


def test_diffusion_upsampler_shapes():
    up = DiffusionUpsampler(UpsamplerConfig(reso=32, num_steps=3))
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    text2 = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 1024)) * 0.1
    out = up.upsample_images(up.params, rgb, text2, jax.random.PRNGKey(2))
    assert out.shape == (2, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_upsampler_noise_level_conditioning():
    """The timestep-type class embedding must reach the output."""
    up = DiffusionUpsampler(UpsamplerConfig(reso=16, num_steps=1))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 6))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 4, 1024))
    a = up.unet.apply(up.params, x, t, ctx,
                      class_labels=jnp.array([0], jnp.int32))
    b = up.unet.apply(up.params, x, t, ctx,
                      class_labels=jnp.array([500], jnp.int32))
    assert float(jnp.abs(a - b).max()) > 1e-6


def _make_trainer(guidance=None, prompt_processor=None):
    return Trainer(
        cfg=TrainerConfig(max_steps=10, batch_size=2, eval_image_period=0,
                          eval_video_period=0, save_period=0),
        rcfg=RCFG,
        init_cfg=InitConfig(num_points=64, capacity=128, svec_val=0.06,
                            mean_std=0.4),
        bg_cfg=BackgroundConfig(type="fixed"),
        data_cfg=CameraSamplerConfig(batch_size=2, max_steps=10, reso=(32,)),
        guidance=guidance or MockGuidance(),
        prompt_processor=prompt_processor,
        dcfg=DensifyConfig(enabled=False), pcfg=PruneConfig(enabled=False))


def test_tune_with_diffusion_upsampler_and_sds():
    """Full loop: diffusion upsampler targets + SDS weight + compactness
    densify all active at once."""
    from gsgen_tpu.guidance.diffusion import MockUNet
    from gsgen_tpu.guidance.sds import SDSConfig, SDSGuidance
    from gsgen_tpu.prompt.processors import (PromptProcessor,
                                             PromptProcessorConfig)
    from gsgen_tpu.training.upsample import (UpsampleTuneConfig,
                                             make_diffusion_upsampler,
                                             tune_with_upsample)
    pp = PromptProcessor(PromptProcessorConfig(use_cache=False))
    g = SDSGuidance(SDSConfig(), MockUNet(latent_size=8))
    tr = _make_trainer(guidance=g, prompt_processor=pp)
    n0 = int(num_active(tr.state.scene))
    fn = make_diffusion_upsampler(tr, reso=32, num_steps=2)
    losses = tune_with_upsample(
        tr, UpsampleTuneConfig(num_poses=4, batch_size=2, reso=32, epoch=2,
                               use_cache=False, sds_weight=0.01,
                               densify_compactness=True),
        upsample_fn=fn)
    assert np.isfinite(losses).all()
    # compactness densify actually added gaussians
    assert int(num_active(tr.state.scene)) > n0
