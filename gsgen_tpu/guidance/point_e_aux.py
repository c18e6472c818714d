"""Point-E auxiliary guidance: SDS directly on the Gaussian point cloud.

Port of guidance/point_e.py:26-235 in gsgen3d/gsgen over the flax
point-e transformer (:mod:`gsgen_tpu.guidance.point_e`):

* FPS-subsample 1024 active Gaussians, pack (xyz, rgb) as 6 channels,
* repeat the cloud ``batch_size`` times with independent t / noise
  (reference forward_text, :170-186),
* scale channels by 2 and bias rgb by -1 (the reference's
  diffusion_cfg override, :36-50) so rgb in [0,1] maps to [-1, 1],
* cosine noise schedule, 1024 steps (point_e BASE_DIFFUSION_CONFIG),
* eps-prediction with CFG (CLIP text-vec cond / zero-vec uncond), the
  variance half of the 12-channel output dropped (:209 ``[:, :6]``),
* w(t) weighting, reparam SDS loss on (mean[, color]); ``mean_only``
  detaches color,
* weight scheduled off after warm-up via the trainer's C() spec
  (conf/base.yaml:46 aux_guidance: [2000, 0.01, 0, 2001]).

The conditioning text-vec comes precomputed (``cond_vec`` — the
projected CLIP ViT-L/14 embedding of the prompt, see
prompt/clip.py CLIPTextModelWithProjection); when absent, the prompt
processor's sequence embedding is mean-pooled as a mock-compatible
seam.  ``MockPointDiffusion`` stays for tests/benches; the real
transformer plugs in through the same (params, x [B,C,N], t, cond)
interface.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..utils.ops import farthest_point_sampling
from .diffusion import NoiseSchedule, cosine_schedule

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
            if text_emb.ndim == 3:
                text_emb = jnp.mean(text_emb, axis=1)
            ctx = ctx + text_emb @ params["w_txt"]
        h = jax.nn.gelu(h + ctx[:, :, None])
        return jnp.einsum("bhn,hc->bcn", h, params["w_out"])


@dataclasses.dataclass
class PointEAuxConfig:
    """conf/auxiliary/point_e.yaml defaults (conf/base.yaml:176-190)."""

    guidance_scale: float = 100.0
    weighting_strategy: str = "sds"
    num_points: int = 1024
    batch_size: int = 4
    min_step_percent: float = 0.02
    max_step_percent: float = 0.98
    mean_only: bool = True
    normalize: bool = False
    # "mock" | "tiny" | "base40M-textvec" (+ optional local weights)
    base_name: str = "mock"
    weights_path: Optional[str] = None


def build_point_e_model(cfg: PointEAuxConfig):
    """Model factory for the aux guidance backbone."""
    if cfg.base_name == "mock":
        return MockPointDiffusion()
    from .point_e import (BASE40M_TEXTVEC, TINY_POINT_E, PointEModel)
    pe_cfg = (BASE40M_TEXTVEC if cfg.base_name == "base40M-textvec"
              else TINY_POINT_E)
    pe_cfg = dataclasses.replace(pe_cfg, n_ctx=cfg.num_points)
    model = PointEModel(pe_cfg)
    if cfg.weights_path:
        model.load_weights(cfg.weights_path)
    return model


class PointEAuxGuidance:
    """The aux_guidance_step model (trainer.py:458-466)."""

    def __init__(self, cfg: PointEAuxConfig, model=None,
                 schedule: Optional[NoiseSchedule] = None,
                 cond_vec: Optional[jax.Array] = None):
        self.cfg = cfg
        self.model = model or build_point_e_model(cfg)
        self.schedule = schedule or cosine_schedule(1024)
        self.params = self.model.params
        self.cond_vec = cond_vec        # [F] projected CLIP text-vec

    def loss(self, params, mean, color, active, text_emb, key
             ) -> Dict[str, jax.Array]:
        """SDS on the cloud; differentiable wrt mean (and color unless
        mean_only).  ``mean`` [M, 3] raw positions; ``color`` [M, 3]
        activated rgb; ``active`` [M] mask."""
        cfg = self.cfg
        B = cfg.batch_size
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

        x1 = jnp.concatenate([xyz, rgb], axis=-1).T[None]    # [1, 6, P]
        x1 = x1 * CHANNEL_SCALES[None, :, None] \
            + CHANNEL_BIASES[None, :, None]
        x = jnp.broadcast_to(x1, (B,) + x1.shape[1:])        # [B, 6, P]

        T = self.schedule.num_train_timesteps
        t = jax.random.randint(k_t, (B,), int(T * cfg.min_step_percent),
                               int(T * cfg.max_step_percent))
        noise = jax.random.normal(k_n, x.shape)
        x_t = self.schedule.add_noise(x, noise, t)

        x2 = jnp.concatenate([x_t, x_t], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        if self.cond_vec is not None:
            cond = jnp.broadcast_to(self.cond_vec,
                                    (B,) + self.cond_vec.shape)
            emb = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
        elif text_emb is not None:
            cond = jnp.broadcast_to(text_emb, (B,) + text_emb.shape)
            emb = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
        else:
            emb = None
        eps = jax.lax.stop_gradient(
            self.model.predict_noise(params, x2, t2, emb))
        cond_eps, uncond_eps = eps[:B], eps[B:]
        eps_hat = uncond_eps + cfg.guidance_scale * (cond_eps - uncond_eps)

        ac = self.schedule.alphas_cumprod[t].reshape(-1, 1, 1)
        if cfg.weighting_strategy == "sds":
            w = 1.0 - ac
        elif cfg.weighting_strategy == "uniform":
            w = 1.0
        else:
            w = ac ** 0.5 * (1.0 - ac)
        grad = jnp.nan_to_num(w * (eps_hat[:, :6] - noise))
        target = jax.lax.stop_gradient(x - grad)
        return {"loss_aux": 0.5 * jnp.sum((x - target) ** 2) / B}
