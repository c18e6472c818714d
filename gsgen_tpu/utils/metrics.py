"""Quality metrics: PSNR / SSIM / LPIPS (reference utils/metrics.py:10-41).

LPIPS is the AlexNet variant (torchmetrics
LearnedPerceptualImagePatchSimilarity default): frozen AlexNet
features at the five ReLU taps, channel-unit-normalized, squared
difference, learned non-negative 1x1 "lin" weights, spatial mean,
summed over taps.  Weights load from locally-provisioned files (a
torchvision AlexNet state dict + the lpips ``alex.pth`` lin weights) —
zero egress, same asset story as every other pretrained backbone here.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..training.losses import ssim as _ssim


def psnr(pred, target):
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def ssim(pred, target):
    return _ssim(pred, target)


# ---- LPIPS (AlexNet) ----

# lpips.ScalingLayer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature config: (out_ch, kernel, stride, pad, maxpool_before)
_ALEX = [(64, 11, 4, 2, False), (192, 5, 1, 2, True),
         (384, 3, 1, 1, True), (256, 3, 1, 1, False),
         (256, 3, 1, 1, False)]


def init_lpips_params(key=None) -> Dict:
    """Random-weight LPIPS parameter tree (testing / shape template)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    params = {"conv": [], "lin": []}
    in_ch = 3
    for i, (out_ch, k, s, p, mp) in enumerate(_ALEX):
        key, k1, k2 = jax.random.split(key, 3)
        params["conv"].append({
            "w": jax.random.normal(k1, (k, k, in_ch, out_ch)) * 0.05,
            "b": jnp.zeros((out_ch,))})
        params["lin"].append(
            jnp.abs(jax.random.normal(k2, (out_ch,))) * 0.1)
        in_ch = out_ch
    return params


def load_lpips_params(alexnet_path: str, lin_path: str) -> Dict:
    """Build the LPIPS tree from a torchvision AlexNet state dict
    (``features.{0,3,6,8,10}.weight/bias``) and the lpips package's
    ``alex.pth`` lin weights (``lin{i}.model.1.weight`` [C,1,1,1])."""
    import torch
    for p in (alexnet_path, lin_path):
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"LPIPS weights not found at {p!r}; provision a "
                "torchvision AlexNet state dict + lpips alex.pth "
                "locally (no network egress).")
    alex = torch.load(alexnet_path, map_location="cpu", weights_only=True)
    lin = torch.load(lin_path, map_location="cpu", weights_only=True)
    params = {"conv": [], "lin": []}
    for i, fidx in enumerate([0, 3, 6, 8, 10]):
        w = alex[f"features.{fidx}.weight"].numpy()   # [O,I,kh,kw]
        b = alex[f"features.{fidx}.bias"].numpy()
        params["conv"].append({"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                               "b": jnp.asarray(b)})
        lw = lin[f"lin{i}.model.1.weight"].numpy().reshape(-1)  # [C,1,1,1]
        params["lin"].append(jnp.asarray(lw))
    return params


def _alex_features(params, x):
    """x [B,H,W,3] in [-1,1] -> list of 5 tap activations (NHWC)."""
    h = (x - _SHIFT) / _SCALE
    taps = []
    for (out_ch, k, s, p, mp), conv in zip(_ALEX, params["conv"]):
        if mp:
            h = -jax.lax.reduce_window(
                -h, jnp.inf, jax.lax.min, (1, 3, 3, 1), (1, 2, 2, 1),
                "VALID")
        h = jax.lax.conv_general_dilated(
            h, conv["w"], (s, s), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + conv["b"]
        h = jax.nn.relu(h)
        taps.append(h)
    return taps


def lpips(pred, target, params: Optional[Dict] = None,
          weights_path: Optional[str] = None):
    """LPIPS distance; inputs [H,W,3] or [B,H,W,3] in [0,1].

    Pass ``params`` (from :func:`load_lpips_params` /
    :func:`init_lpips_params`) or ``weights_path`` as
    ``"<alexnet.pth>:<alex_lins.pth>"``.
    """
    if params is None:
        if not weights_path:
            raise FileNotFoundError(
                "LPIPS needs weights: pass params or weights_path="
                "'<alexnet.pth>:<lpips_alex.pth>' (local assets).")
        params = load_lpips_params(*weights_path.split(":"))
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    a = _alex_features(params, pred * 2.0 - 1.0)
    b = _alex_features(params, target * 2.0 - 1.0)
    total = 0.0
    for fa, fb, lw in zip(a, b, params["lin"]):
        na = fa / jnp.maximum(
            jnp.linalg.norm(fa, axis=-1, keepdims=True), 1e-10)
        nb = fb / jnp.maximum(
            jnp.linalg.norm(fb, axis=-1, keepdims=True), 1e-10)
        d = (na - nb) ** 2
        total = total + jnp.mean(jnp.sum(d * lw, axis=-1), axis=(1, 2))
    return jnp.squeeze(total)


class Metrics:
    """Bundle mirroring reference utils/metrics.py Metrics; LPIPS is
    included when weights (or params) are supplied."""

    def __init__(self, lpips_params: Optional[Dict] = None,
                 lpips_weights_path: Optional[str] = None):
        self.lpips_params = lpips_params
        if lpips_params is None and lpips_weights_path:
            self.lpips_params = load_lpips_params(
                *lpips_weights_path.split(":"))

    def __call__(self, pred, target):
        out = {"psnr": psnr(pred, target), "ssim": ssim(pred, target)}
        if self.lpips_params is not None:
            out["lpips"] = lpips(pred, target, self.lpips_params)
        return out
