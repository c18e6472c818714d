"""Point-E auxiliary guidance: SDS directly on the Gaussian point cloud.

Port of guidance/point_e.py:26-235 in gsgen3d/gsgen over a pluggable
point-diffusion eps-predictor (the reference loads OpenAI's point-e
transformer; its checkpoints are assets here):

* FPS-subsample 1024 active Gaussians, pack (xyz, rgb) as 6 channels,
* scale channels by 2 and bias rgb by -1 (diffusion_cfg channel_scales
  / channel_biases, :36-50) so rgb in [0,1] maps to [-1, 1],
* eps-prediction with CFG (cond text / uncond), w(t) weighting,
* reparam SDS loss on (mean[, color]); ``mean_only`` detaches color,
* weight scheduled off after warm-up via the trainer's C() spec
  (conf/base.yaml:46 aux_guidance: [2000, 0.01, 0, 2001]).

``MockPointDiffusion`` is a tiny permutation-equivariant eps net for
tests/benches; a real point-e transformer (loaded from local weights)
plugs in through the same (params, x [B,C,N], t, cond) interface.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..utils.ops import farthest_point_sampling
from .diffusion import NoiseSchedule, scaled_linear_schedule

CHANNEL_SCALES = jnp.array([2.0] * 6)
CHANNEL_BIASES = jnp.array([0.0, 0.0, 0.0, -1.0, -1.0, -1.0])


class MockPointDiffusion:
    """Tiny permutation-equivariant eps-predictor (pointwise MLP +
    global context), text-conditioned via a mean-pooled embedding."""

    def __init__(self, key=None, channels: int = 6, hidden: int = 64,
                 text_dim: int = 1024):
        key = key if key is not None else jax.random.PRNGKey(7)
        ks = jax.random.split(key, 4)
        s = 0.1
        self.params = {
            "w_in": jax.random.normal(ks[0], (channels + 1, hidden)) * s,
            "w_ctx": jax.random.normal(ks[1], (hidden, hidden)) * s,
            "w_txt": jax.random.normal(ks[2], (text_dim, hidden)) * s,
            "w_out": jax.random.normal(ks[3], (hidden, channels)) * s,
        }

    def predict_noise(self, params, x, t, text_emb):
        """x [B, C, N]; t [B]; text_emb [B, L, D] or None -> eps [B, C, N]."""
        B, C, N = x.shape
        h = jnp.concatenate(
            [x, jnp.broadcast_to((t / 1000.0)[:, None, None], (B, 1, N))], 1)
        h = jnp.einsum("bcn,ch->bhn", h, params["w_in"])
        ctx = jnp.mean(h, axis=2) @ params["w_ctx"]          # [B, hidden]
        if text_emb is not None:
            ctx = ctx + jnp.mean(text_emb, axis=1) @ params["w_txt"]
        h = jax.nn.gelu(h + ctx[:, :, None])
        return jnp.einsum("bhn,hc->bcn", h, params["w_out"])


@dataclasses.dataclass
class PointEAuxConfig:
    """conf/auxiliary defaults (conf/base.yaml:176-186)."""

    guidance_scale: float = 3.0
    weighting_strategy: str = "sds"
    num_points: int = 1024
    mean_only: bool = True
    normalize: bool = True


class PointEAuxGuidance:
    """The aux_guidance_step model (trainer.py:458-466)."""

    def __init__(self, cfg: PointEAuxConfig, model=None,
                 schedule: Optional[NoiseSchedule] = None):
        self.cfg = cfg
        self.model = model or MockPointDiffusion()
        self.schedule = schedule or scaled_linear_schedule(1024)
        self.params = self.model.params

    def loss(self, params, mean, color, active, text_emb, key
             ) -> Dict[str, jax.Array]:
        """SDS on the cloud; differentiable wrt mean (and color unless
        mean_only).  ``mean`` [M, 3] raw positions; ``color`` [M, 3]
        activated rgb; ``active`` [M] mask."""
        cfg = self.cfg
        k_fps, k_t, k_n = jax.random.split(key, 3)
        idx = farthest_point_sampling(jax.lax.stop_gradient(mean),
                                      cfg.num_points, mask=active)
        xyz = mean[idx]
        rgb = color[idx]
        if cfg.normalize:
            scale = jax.lax.stop_gradient(
                jnp.max(jnp.linalg.norm(xyz, axis=-1)))
            xyz = xyz / jnp.maximum(scale, 1e-6) * 0.5
        if cfg.mean_only:
            rgb = jax.lax.stop_gradient(rgb)

        x = jnp.concatenate([xyz, rgb], axis=-1).T[None]     # [1, 6, P]
        x = x * CHANNEL_SCALES[None, :, None] + CHANNEL_BIASES[None, :, None]

        T = self.schedule.num_train_timesteps
        t = jax.random.randint(k_t, (1,), 0, T)
        noise = jax.random.normal(k_n, x.shape)
        x_t = self.schedule.add_noise(x, noise, t)

        x2 = jnp.concatenate([x_t, x_t], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        emb = (jnp.stack([text_emb, jnp.zeros_like(text_emb)])
               if text_emb is not None else None)
        eps = jax.lax.stop_gradient(
            self.model.predict_noise(params, x2, t2, emb))
        cond, uncond = eps[:1], eps[1:]
        eps_hat = uncond + cfg.guidance_scale * (cond - uncond)

        ac = self.schedule.alphas_cumprod[t].reshape(-1, 1, 1)
        if cfg.weighting_strategy == "sds":
            w = 1.0 - ac
        elif cfg.weighting_strategy == "uniform":
            w = 1.0
        else:
            w = ac ** 0.5 * (1.0 - ac)
        grad = jnp.nan_to_num(w * (eps_hat[:, :6] - noise))
        target = jax.lax.stop_gradient(x - grad)
        return {"loss_aux": 0.5 * jnp.sum((x - target) ** 2)}
