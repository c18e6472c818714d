"""Post-training upsample fine-tune (reference tune_with_upsample_model).

Port of trainer.py:736-857 in gsgen3d/gsgen: render ``num_poses`` views
at 64², upsample them with a super-resolution diffusion model (the
reference uses DeepFloyd IF-II-L, guidance/deep_floyd.py:353-389),
cache, then fine-tune the scene on the upsampled images with
SSIM+L2 (optionally + SDS).

The upsampler is pluggable: ``upsample_fn(rgb [B,64,64,3], key) ->
[B, reso, reso, 3]``.  The default bicubic upsampler keeps the loop
runnable without IF-II weights (zero egress); a diffusion upsampler
drops in unchanged.
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


def tune_with_upsample(trainer, cfg: UpsampleTuneConfig,
                       upsample_fn: Optional[Callable] = None,
                       cache_uid: Optional[str] = None):
    """Run the upsample fine-tune on a trained ``Trainer``.

    Mirrors the reference flow: pose set at final curriculum -> render
    64² -> upsample (cached) -> fine-tune on image loss.
    """
    upsample_fn = upsample_fn or (
        lambda rgb, key: bicubic_upsample(rgb, key, cfg.reso))
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
            ups.append(np.asarray(upsample_fn(out["rgb"], k)))
        upsampled = jnp.asarray(np.concatenate(ups))
        if cache is not None:
            cache.parent.mkdir(parents=True, exist_ok=True)
            np.save(cache, np.asarray(upsampled))

    # fine-tune on the upsampled targets
    from .optimizer import adam_init, adam_update

    params = scene.params
    opt = adam_init(params)

    @jax.jit
    def step(params, opt, c2ws, targets):
        def loss_fn(p):
            out = render_batch(p, scene.active, c2ws, hi_intr, trainer.rcfg,
                               jnp.ones((c2ws.shape[0], 3)), rgb_only=True)
            per = jax.vmap(lambda a, b: image_loss(a, b, 0.2, "l2"))(
                out["rgb"], targets)
            return jnp.mean(per)
        loss, g = jax.value_and_grad(loss_fn)(params)
        params, opt = adam_update(g, opt, params, cfg.lr)
        return params, opt, loss

    losses = []
    for e in range(cfg.epoch):
        for i, b in enumerate(batches):
            tgt = upsampled[i * cfg.batch_size:(i + 1) * cfg.batch_size]
            params, opt, loss = step(params, opt, jnp.asarray(b["c2w"]), tgt)
            losses.append(float(loss))
    trainer.state = trainer.state._replace(
        scene=scene._replace(params=params))
    return losses
