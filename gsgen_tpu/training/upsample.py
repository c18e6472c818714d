"""Post-training upsample fine-tune (reference tune_with_upsample_model).

Port of trainer.py:736-857 in gsgen3d/gsgen: render ``num_poses`` views
at 64², upsample them with a super-resolution diffusion model (the
reference uses DeepFloyd IF-II-L, guidance/deep_floyd.py:353-389),
cache, then fine-tune the scene on the upsampled images with SSIM+L2,
optionally + SDS (``upsample_tune.loss.sds``, trainer.py:816-831) and
an up-front compactness densify (``upsample_tune.densify``,
trainer.py:800-803).

The upsampler is pluggable: ``upsample_fn(rgb [B,64,64,3], key, batch)
-> [B, reso, reso, 3]``.  ``make_diffusion_upsampler`` builds the
IF-II-style one (:mod:`gsgen_tpu.guidance.upsampler`); the default
bicubic upsampler keeps the loop runnable without IF-II weights (zero
egress).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import RenderConfig, num_active, render_batch
from ..ops.camera import CameraIntrinsics
from .losses import image_loss


@dataclasses.dataclass
class UpsampleTuneConfig:
    """conf/upsample_tune/base.yaml equivalents."""

    num_poses: int = 64
    batch_size: int = 4
    reso: int = 256
    epoch: int = 10
    lr: float = 0.005
    rgb_weight: float = 1.0
    sds_weight: float = 0.0
    use_cache: bool = True
    cache_dir: str = "tmp/upsample_cache"
    densify_compactness: bool = False


def bicubic_upsample(rgb, key, reso: int):
    B = rgb.shape[0]
    return jax.image.resize(rgb, (B, reso, reso, 3), "cubic")


def make_diffusion_upsampler(trainer, reso: int,
                             weights_path: Optional[str] = None,
                             num_steps: int = 50,
                             guidance_scale: float = 4.0):
    """IF-II-style ``upsample_fn`` bound to the trainer's prompt
    embedding (view-dependent conditioning per batch, reference
    deep_floyd.py:366-374)."""
    from ..guidance.upsampler import (DiffusionUpsampler, IF2_PIXEL,
                                      TINY_SR, UpsamplerConfig)
    up = DiffusionUpsampler(
        UpsamplerConfig(reso=reso, num_steps=num_steps,
                        guidance_scale=guidance_scale),
        unet_cfg=IF2_PIXEL if weights_path else TINY_SR)
    if weights_path:
        up.load_weights(weights_path)
    embedding = trainer.prompt_processor()

    def fn(rgb, key, batch):
        text2 = embedding.get_text_embedding(
            jnp.asarray(batch["elevation"]), jnp.asarray(batch["azimuth"]),
            jnp.asarray(batch["camera_distance"]), True)
        return up.upsample_images(up.params, rgb, text2, key)

    return fn


def tune_with_upsample(trainer, cfg: UpsampleTuneConfig,
                       upsample_fn: Optional[Callable] = None,
                       cache_uid: Optional[str] = None):
    """Run the upsample fine-tune on a trained ``Trainer``.

    Mirrors the reference flow: pose set at final curriculum -> render
    64² -> upsample (cached) -> optional compactness densify ->
    fine-tune on image loss (+ SDS when ``sds_weight > 0``).
    """
    upsample_fn = upsample_fn or (
        lambda rgb, key, batch: bicubic_upsample(rgb, key, cfg.reso))
    data = trainer.data
    data.update(trainer.cfg.max_steps)
    total = (cfg.num_poses // cfg.batch_size) * cfg.batch_size
    batches = [data.get_batch(cfg.batch_size)
               for _ in range(total // cfg.batch_size)]

    lo_intr = CameraIntrinsics.from_reso(64)
    hi_intr = CameraIntrinsics.from_reso(cfg.reso)
    scene = trainer.state.scene
    key = jax.random.PRNGKey(0)

    cache = None
    if cfg.use_cache and cache_uid:
        cache = Path(cfg.cache_dir) / f"{cache_uid}.npy"
    if cache is not None and cache.exists():
        upsampled = jnp.asarray(np.load(cache))
    else:
        ups = []
        for b in batches:
            out = render_batch(
                scene.params, scene.active, jnp.asarray(b["c2w"]), lo_intr,
                trainer.rcfg, jnp.ones((cfg.batch_size, 3)), rgb_only=True)
            key, k = jax.random.split(key)
            ups.append(np.asarray(upsample_fn(out["rgb"], k, b)))
        upsampled = jnp.asarray(np.concatenate(ups))
        if cache is not None:
            cache.parent.mkdir(parents=True, exist_ok=True)
            np.save(cache, np.asarray(upsampled))

    # up-front compactness densify (reference densify_by_compatness(3),
    # trainer.py:800-803)
    if cfg.densify_compactness:
        from ..models.density import (DensifyConfig, densify_compactness,
                                      reset_densify_stats)
        scene, _, dinfo = densify_compactness(
            scene, trainer.state.opt, DensifyConfig(), trainer.rcfg, K=3)
        scene = reset_densify_stats(scene)
        trainer.state = trainer.state._replace(scene=scene)

    # SDS term reuses the trainer's guidance + prompt stack
    # (trainer.py:816-831); resolved outside the jit so a zero weight
    # never pays for the UNet
    guidance = trainer.guidance if cfg.sds_weight > 0.0 else None
    embedding = (trainer.prompt_processor()
                 if guidance is not None
                 and trainer.prompt_processor is not None else None)
    gfrozen = (getattr(guidance, "frozen_params",
                       getattr(guidance, "params", {}))
               if guidance is not None else None)
    sds_sched = None
    if guidance is not None and hasattr(guidance, "sched_scalars"):
        s = guidance.sched_scalars(trainer.cfg.max_steps,
                                   trainer.cfg.max_steps)
        sds_sched = {k: (jnp.int32(v) if isinstance(v, int)
                         else jnp.float32(v)) for k, v in s.items()}

    # fine-tune on the upsampled targets
    from .optimizer import adam_init, adam_update

    params = scene.params
    opt = adam_init(params)

    @jax.jit
    def step(params, opt, batch, targets, key):
        def loss_fn(p):
            out = render_batch(p, scene.active, batch["c2w"], hi_intr,
                               trainer.rcfg,
                               jnp.ones((batch["c2w"].shape[0], 3)),
                               rgb_only=True)
            per = jax.vmap(lambda a, b: image_loss(a, b, 0.2, "l2"))(
                out["rgb"], targets)
            loss = cfg.rgb_weight * jnp.mean(per)
            if guidance is not None:
                g = guidance.loss(
                    {"frozen": gfrozen,
                     "train": getattr(guidance, "trainable_params", {})},
                    out["rgb"], embedding, batch["elevation"],
                    batch["azimuth"], batch["camera_distance"], key,
                    sds_sched, c2ws=batch["c2w"])
                loss = loss + cfg.sds_weight * (
                    g.get("loss_sds", 0.0) + g.get("loss_vsd", 0.0))
            return loss
        loss, g = jax.value_and_grad(loss_fn)(params)
        params, opt = adam_update(g, opt, params, cfg.lr)
        return params, opt, loss

    losses = []
    for e in range(cfg.epoch):
        for i, b in enumerate(batches):
            tgt = upsampled[i * cfg.batch_size:(i + 1) * cfg.batch_size]
            bj = {k: jnp.asarray(v) for k, v in b.items()
                  if k in ("c2w", "elevation", "azimuth", "camera_distance")}
            key, k = jax.random.split(key)
            params, opt, loss = step(params, opt, bj, tgt, k)
            losses.append(float(loss))
    trainer.state = trainer.state._replace(
        scene=scene._replace(params=params))
    return losses
