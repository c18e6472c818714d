"""MXU-friendly GroupNorm (drop-in for flax ``nn.GroupNorm``).

The diffusion stack's device profile at 4x512² (round-5 SDS step
trace) put ~128 ms of the VAE encoder's 195 ms fwd+bwd in NON-conv
ops: elementwise loop fusions, data-formatting copies, and 72+
materialized broadcasts per pass — all downstream of how XLA lowers
``nn.GroupNorm``'s reshape-to-groups form on (8,128)-tiled layouts
(the group split of the 128-lane channel dim forces relayouts, and
per-group stats broadcast back as full [B,H,W,C] materializations).
The convs themselves run at ~240 TF/s (chained-timing microbench) —
the norms were the binding cost.

This formulation never reshapes the channel dim:

1. per-(batch, group) sums of x and x² via ONE [BHW, C] x [C, G]
   dot_general against a 0/1 group-membership matrix (MXU; f32
   accumulation; same E[x²] − E[x]² variance flax computes),
2. expand stats back to per-CHANNEL rows via the transpose matmul
   ([B, G] x [G, C] — tiny),
3. apply as a single fused-multiply-add in the input dtype:
   ``y = x * scale_c + offset_c`` with scale_c = rinv*gamma and
   offset_c = beta − mu*rinv*gamma precomputed per (B, C) row —
   which XLA fuses into the neighboring conv/activation.

Parameter tree matches ``nn.GroupNorm`` (``scale``/``bias`` of shape
[C]), so torch state-dict conversion (convert.py) is unchanged.
Reference context: the VAE/UNet this feeds mirror diffusers'
AutoencoderKL / UNet2DConditionModel used by gsgen3d/gsgen
guidance/stable_diffusion.py:74-89.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

# escape hatch: GSGEN_MXU_GROUPNORM=0 falls back to flax nn.GroupNorm
_USE_MXU = os.environ.get("GSGEN_MXU_GROUPNORM", "1") != "0"


def group_norm_mxu(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                   num_groups: int, epsilon: float) -> jax.Array:
    """GroupNorm over the last (channel) axis of NHWC-like ``x``."""
    C = x.shape[-1]
    G = num_groups
    assert C % G == 0, (C, G)
    B = x.shape[0]
    xf = x.reshape(B, -1, C)
    # 0/1 membership [C, G]: channel c belongs to group c // (C/G).
    # f32 operands keep the contraction exact (counts < 2^24 — the same
    # trade ops/expansion_rank.py documents for Mosaic's MXU).
    grp = jnp.arange(C, dtype=jnp.int32) // (C // G)
    M = (grp[:, None] == jnp.arange(G, dtype=jnp.int32)[None, :]
         ).astype(jnp.float32)
    # per-channel sums over the spatial axis: a lane-aligned reduce (C
    # stays on lanes — no relayout), accumulated in f32; then the tiny
    # [B, C] x [C, G] group matmul.  The group reduction never touches
    # the [B, P, C] tensor a second time.
    s1c = jnp.sum(xf, axis=1, dtype=jnp.float32)          # [B, C]
    s2c = jnp.sum(xf * xf, axis=1, dtype=jnp.float32)     # [B, C]
    s1 = s1c @ M                                          # [B, G]
    s2 = s2c @ M
    n = xf.shape[1] * (C // G)
    mu = s1 / n                                           # [B, G]
    var = jnp.maximum(s2 / n - mu * mu, 0.0)
    rinv = jax.lax.rsqrt(var + epsilon)
    # per-channel rows [B, C] (tiny matmuls)
    mu_c = mu @ M.T
    rinv_c = rinv @ M.T
    g32 = gamma.astype(jnp.float32)
    scale_c = (rinv_c * g32[None, :])
    off_c = beta.astype(jnp.float32)[None, :] - mu_c * scale_c
    shape = (B,) + (1,) * (x.ndim - 2) + (C,)
    y = (x * scale_c.astype(x.dtype).reshape(shape)
         + off_c.astype(x.dtype).reshape(shape))
    return y


class GroupNorm(nn.Module):
    """Drop-in for ``nn.GroupNorm(num_groups, epsilon)`` (scale+bias)."""

    num_groups: int = 32
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        if not _USE_MXU:
            # flax reference form (escape hatch); params stay OURS so
            # the tree is identical either way
            y = nn.GroupNorm(num_groups=self.num_groups,
                             epsilon=self.epsilon, use_scale=False,
                             use_bias=False)(x)
            shape = (1,) * (x.ndim - 1) + (C,)
            return (y * scale.astype(y.dtype).reshape(shape)
                    + bias.astype(y.dtype).reshape(shape))
        return group_norm_mxu(x, scale, bias, self.num_groups, self.epsilon)
