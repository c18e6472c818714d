"""Point-E point-cloud diffusion transformer in flax.

The reference runs OpenAI's ``base40M-textvec`` CLIP-conditioned point
diffusion transformer as a 3D-prior guidance model (reference
guidance/point_e.py:26-235, point_e/models/transformer.py:135-290,
point_e/models/configs.py:29-41).  This reimplements that exact
architecture with a parameter tree in 1:1 bijection with the torch
state_dict so provisioned checkpoints load through the mechanical
rename in :mod:`gsgen_tpu.guidance.convert`:

* pre-LN transformer over ``n_ctx`` point tokens (+1 time token, +1
  CLIP token), width 512 / 12 layers / 8 heads for base40M,
* fused qkv projection (``attn.c_qkv``/``attn.c_proj``), the
  double-sqrt scaling trick (q and k each scaled by
  ``1/sqrt(sqrt(head_dim))`` — transformer.py:76-84),
* GELU MLP ``c_fc``/``c_proj`` with 4x width,
* time conditioning: sinusoidal embedding -> ``time_embed`` MLP,
  prepended as a token (``time_token_cond=True``),
* CLIP text-vec conditioning: the (projected, pooled) CLIP embedding
  scaled by ``sqrt(dim)`` -> ``clip_embed`` linear, prepended as a
  token (``token_cond=True``); a zero vector is the uncond branch
  (point_e pretrained_clip zero-fills None texts),
* ``output_proj`` zero-initialized; output = (eps, variance) over 6
  channels each — guidance uses ``out[:, :6]``.

The reference wraps blocks in activation checkpointing
(transformer.py:46); here the model only ever runs under
``stop_gradient`` (guidance is frozen) so no remat is needed.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def point_e_timestep_embedding(t, dim, max_period=10000.0):
    """point_e.models.util.timestep_embedding: [cos | sin] halves
    (note: opposite order to diffusers)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


@dataclasses.dataclass(frozen=True)
class PointEConfig:
    """Mirrors point_e MODEL_CONFIGS entries."""

    input_channels: int = 6
    output_channels: int = 12
    n_ctx: int = 1024
    width: int = 512
    layers: int = 12
    heads: int = 8
    clip_feature_dim: int = 768     # ViT-L/14 projected text embedding
    time_token_cond: bool = True
    token_cond: bool = True
    cond_drop_prob: float = 0.1


# point_e/models/configs.py:29-41
BASE40M_TEXTVEC = PointEConfig()
TINY_POINT_E = PointEConfig(n_ctx=32, width=32, layers=2, heads=2,
                            clip_feature_dim=16)

# image-conditioned base family (point_e/models/configs.py:53-88,
# name=CLIPImageGridPointDiffusionTransformer): conditioning is the CLIP
# ViT-L/14 GRID (width 1024, 16x16 = 256 patch tokens), clip_feature_dim
# here = the grid token dim
BASE40M_IMAGE = PointEConfig(clip_feature_dim=1024)
BASE300M = PointEConfig(width=1024, layers=24, heads=16,
                        clip_feature_dim=1024)
BASE1B = PointEConfig(width=2048, layers=24, heads=32,
                      clip_feature_dim=1024)
TINY_POINT_E_GRID = PointEConfig(n_ctx=32, width=32, layers=2, heads=2,
                                 clip_feature_dim=16)


class PointEMLP(nn.Module):
    width: int

    def setup(self):
        self.c_fc = nn.Dense(self.width * 4)
        self.c_proj = nn.Dense(self.width)

    def __call__(self, x):
        return self.c_proj(jax.nn.gelu(self.c_fc(x), approximate=True))


class PointEAttention(nn.Module):
    width: int
    heads: int

    def setup(self):
        self.c_qkv = nn.Dense(self.width * 3)
        self.c_proj = nn.Dense(self.width)

    def __call__(self, x):
        B, L, _ = x.shape
        H = self.heads
        ch = self.width // H
        qkv = self.c_qkv(x).reshape(B, L, H, 3 * ch)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        attn = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhts,bshc->bthc", attn.astype(v.dtype), v)
        return self.c_proj(out.reshape(B, L, self.width))


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int

    def setup(self):
        self.attn = PointEAttention(self.width, self.heads)
        self.ln_1 = nn.LayerNorm()
        self.mlp = PointEMLP(self.width)
        self.ln_2 = nn.LayerNorm()

    def __call__(self, x):
        x = x + self.attn(self.ln_1(x))
        x = x + self.mlp(self.ln_2(x))
        return x


class PointEBackbone(nn.Module):
    width: int
    heads: int
    layers: int

    def setup(self):
        self.resblocks = [
            ResidualAttentionBlock(self.width, self.heads)
            for _ in range(self.layers)]

    def __call__(self, x):
        for blk in self.resblocks:
            x = blk(x)
        return x


class PointDiffusionTransformer(nn.Module):
    """CLIPImagePointDiffusionTransformer (textvec conditioning)."""

    cfg: PointEConfig

    def setup(self):
        c = self.cfg
        self.time_embed = PointEMLP(c.width)
        self.clip_embed = nn.Dense(c.width)
        self.ln_pre = nn.LayerNorm()
        self.backbone = PointEBackbone(c.width, c.heads, c.layers)
        self.ln_post = nn.LayerNorm()
        self.input_proj = nn.Dense(c.width)
        self.output_proj = nn.Dense(
            c.output_channels, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros)

    def __call__(self, x, t, clip_out=None):
        """x [B, C, N] channels-first like the torch model; t [B];
        clip_out [B, F] projected CLIP embedding (zeros = uncond)."""
        c = self.cfg
        t_embed = self.time_embed(
            point_e_timestep_embedding(t, c.width))
        if clip_out is None:
            clip_out = jnp.zeros((x.shape[0], c.clip_feature_dim))
        # unit-variance rescale (transformer.py:282)
        clip_embed = self.clip_embed(
            math.sqrt(clip_out.shape[-1]) * clip_out)

        h = self.input_proj(jnp.swapaxes(x, 1, 2))   # NCL -> NLC
        extra = []
        if c.token_cond:
            extra.append(clip_embed[:, None])
        else:
            h = h + clip_embed[:, None]
        if c.time_token_cond:
            extra.append(t_embed[:, None])
        else:
            h = h + t_embed[:, None]
        n_extra = len(extra)
        if n_extra:
            h = jnp.concatenate(extra + [h], axis=1)
        h = self.ln_pre(h)
        h = self.backbone(h)
        h = self.ln_post(h)
        if n_extra:
            h = h[:, n_extra:]
        h = self.output_proj(h)
        return jnp.swapaxes(h, 1, 2)                 # NLC -> NCL


class PointEModel:
    """Backbone wrapper with the aux-guidance eps interface."""

    def __init__(self, cfg: PointEConfig = TINY_POINT_E,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg
        self.module = PointDiffusionTransformer(cfg)
        key = key if key is not None else jax.random.PRNGKey(0)
        x = jnp.zeros((1, cfg.input_channels, cfg.n_ctx))
        self.params = self.module.init(key, x, jnp.zeros((1,)),
                                       jnp.zeros((1, cfg.clip_feature_dim)))

    def load_weights(self, path_or_state):
        """Fill from a point-e checkpoint (safetensors path or a torch
        state_dict).  The frozen CLIP tower inside the torch module
        (``clip.*`` keys) is external here — the text vector arrives
        precomputed — so those keys are dropped."""
        from .convert import load_safetensors, torch_state_to_flax
        state = (load_safetensors(path_or_state)
                 if isinstance(path_or_state, str) else path_or_state)
        state = {k: v for k, v in state.items()
                 if not k.startswith("clip.")}
        self.params = torch_state_to_flax(state, self.params)
        return self

    def apply(self, params, x, t, cond=None, **_):
        """Sampler-facing eval: [B, C, N] x, [B] t, [B, F] cond."""
        return self.module.apply(params, x, t, cond)

    def predict_noise(self, params, x, t, cond):
        """x [B, C, N]; t [B]; cond [B, F] CLIP text-vec (or [B, L, D]
        sequence, mean-pooled+projected is NOT applied — sequences are
        only valid for the mock; pass vectors here) -> [B, C_out, N]."""
        if cond is not None and cond.ndim == 3:
            # mean-pool a sequence embedding down to a vector seam;
            # real runs should pass the CLIP projected vector
            cond = jnp.mean(cond, axis=1)
            if cond.shape[-1] != self.cfg.clip_feature_dim:
                cond = None
        return self.module.apply(params, x, t, cond)


class PointDiffusionTransformerGrid(nn.Module):
    """CLIPImageGridPointDiffusionTransformer (point_e transformer.py:
    290-355): conditioning is the full CLIP ViT patch grid — LayerNorm +
    Linear projected (torch ``nn.Sequential`` -> keys clip_embed.{0,1}),
    ALL L tokens prepended after the time token; unlike the textvec
    model there is NO sqrt(dim) rescale and the uncond CFG branch is an
    all-zero grid (sampler.py:133-135)."""

    cfg: PointEConfig

    def setup(self):
        c = self.cfg
        self.time_embed = PointEMLP(c.width)
        self.clip_embed_0 = nn.LayerNorm()
        self.clip_embed_1 = nn.Dense(c.width)
        self.ln_pre = nn.LayerNorm()
        self.backbone = PointEBackbone(c.width, c.heads, c.layers)
        self.ln_post = nn.LayerNorm()
        self.input_proj = nn.Dense(c.width)
        self.output_proj = nn.Dense(
            c.output_channels, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros)

    def __call__(self, x, t, embeddings):
        """x [B, C, N]; t [B]; embeddings [B, L, D] grid tokens (zeros =
        uncond).  Token order matches _forward_with_cond with
        cond=[(t_embed, True), (clip_embed, True)] (transformer.py:354)."""
        c = self.cfg
        t_embed = self.time_embed(
            point_e_timestep_embedding(t, c.width))
        clip_tok = self.clip_embed_1(self.clip_embed_0(embeddings))
        h = self.input_proj(jnp.swapaxes(x, 1, 2))   # NCL -> NLC
        h = jnp.concatenate([t_embed[:, None], clip_tok, h], axis=1)
        h = self.ln_pre(h)
        h = self.backbone(h)
        h = self.ln_post(h)
        h = h[:, 1 + clip_tok.shape[1]:]
        h = self.output_proj(h)
        return jnp.swapaxes(h, 1, 2)                 # NLC -> NCL


class PointEImageGridModel:
    """Image-grid-conditioned base model wrapper (base40M/base300M/
    base1B equivalents) with the sampler-facing ``apply`` seam; ``cond``
    is the [B, L, D] CLIP grid from
    :meth:`gsgen_tpu.prompt.clip_vision.CLIPImageGridEncoder`."""

    def __init__(self, cfg: PointEConfig = TINY_POINT_E_GRID,
                 key: Optional[jax.Array] = None, grid_tokens: int = 256):
        self.cfg = cfg
        self.grid_tokens = grid_tokens
        self.module = PointDiffusionTransformerGrid(cfg)
        key = key if key is not None else jax.random.PRNGKey(0)
        x = jnp.zeros((1, cfg.input_channels, cfg.n_ctx))
        emb = jnp.zeros((1, grid_tokens, cfg.clip_feature_dim))
        self.params = self.module.init(key, x, jnp.zeros((1,)), emb)

    def load_weights(self, path_or_state):
        from .convert import load_safetensors, torch_state_to_flax
        state = (load_safetensors(path_or_state)
                 if isinstance(path_or_state, str) else path_or_state)
        state = {k: v for k, v in state.items()
                 if not k.startswith("clip.")}
        self.params = torch_state_to_flax(state, self.params)
        return self

    def apply(self, params, x, t, cond=None, **_):
        if cond is None:
            cond = jnp.zeros((x.shape[0], self.grid_tokens,
                              self.cfg.clip_feature_dim))
        return self.module.apply(params, x, t, cond)


# ---------------------------------------------------------------------------
# Upsample stage (1024 -> 3072 points)
# ---------------------------------------------------------------------------

# point-e channel normalization (point_e/diffusion/configs.py:17-18):
# model space = scale * raw + bias; xyz doubled, colors [0,255] -> [-1,1]
POINT_E_CHANNEL_SCALES = (2.0, 2.0, 2.0,
                          0.007843137255, 0.007843137255, 0.007843137255)
POINT_E_CHANNEL_BIASES = (0.0, 0.0, 0.0, -1.0, -1.0, -1.0)


@dataclasses.dataclass(frozen=True)
class PointEUpsampleConfig:
    """point_e MODEL_CONFIGS['upsample'] (configs.py:89-103):
    CLIPImageGridUpsamplePointDiffusionTransformer."""

    input_channels: int = 6
    output_channels: int = 12
    n_ctx: int = 3072
    cond_ctx: int = 1024
    width: int = 512
    layers: int = 12
    heads: int = 8
    grid_feature_dim: int = 1024    # ViT-L/14 grid (pretrained_clip.py:59-63)
    grid_size: int = 16


UPSAMPLE_CFG = PointEUpsampleConfig()
TINY_UPSAMPLE = PointEUpsampleConfig(n_ctx=64, cond_ctx=32, width=32,
                                     layers=2, heads=2, grid_feature_dim=16,
                                     grid_size=2)


class PointEUpsampleTransformer(nn.Module):
    """CLIPImageGridUpsamplePointDiffusionTransformer
    (point_e/models/transformer.py:412-494): the base transformer plus a
    conditioning-point projection and a CLIP image-grid token path.  In
    the text->3D pipeline the grid embeddings are ZERO (unconditional
    upsampling — sampler key_filter '' drops all kwargs,
    transformer.py:478-483), but the layers must exist for the
    checkpoint key bijection.  Token order: [t, clip grid (gs^2),
    low_res (cond_ctx), x (n_ctx)] (transformer.py:493)."""

    cfg: PointEUpsampleConfig

    def setup(self):
        c = self.cfg
        self.time_embed = PointEMLP(c.width)
        # torch nn.Sequential(LayerNorm, Linear) -> keys clip_embed.{0,1}
        self.clip_embed_0 = nn.LayerNorm()
        self.clip_embed_1 = nn.Dense(c.width)
        self.cond_point_proj = nn.Dense(c.width)
        self.ln_pre = nn.LayerNorm()
        self.backbone = PointEBackbone(c.width, c.heads, c.layers)
        self.ln_post = nn.LayerNorm()
        self.input_proj = nn.Dense(c.width)
        self.output_proj = nn.Dense(
            c.output_channels, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros)

    def __call__(self, x, t, low_res, embeddings=None):
        """x [B, C, n_ctx]; t [B]; low_res [B, C, cond_ctx] in UNSCALED
        (raw) space — rescaled in-model (_embed_low_res,
        transformer.py:404-409); embeddings [B, grid_feature_dim, gs^2]
        CLIP grid features or None (-> zeros)."""
        c = self.cfg
        B = x.shape[0]
        t_embed = self.time_embed(point_e_timestep_embedding(t, c.width))

        scales = jnp.asarray(POINT_E_CHANNEL_SCALES)[: low_res.shape[1]]
        biases = jnp.asarray(POINT_E_CHANNEL_BIASES)[: low_res.shape[1]]
        lr = low_res * scales[None, :, None] + biases[None, :, None]
        lr_tok = self.cond_point_proj(jnp.swapaxes(lr, 1, 2))

        if embeddings is None:
            embeddings = jnp.zeros(
                (B, c.grid_feature_dim, c.grid_size ** 2), x.dtype)
        clip_tok = self.clip_embed_1(
            self.clip_embed_0(jnp.swapaxes(embeddings, 1, 2)))

        h = self.input_proj(jnp.swapaxes(x, 1, 2))
        n_extra = 1 + clip_tok.shape[1] + lr_tok.shape[1]
        h = jnp.concatenate([t_embed[:, None], clip_tok, lr_tok, h], axis=1)
        h = self.ln_pre(h)
        h = self.backbone(h)
        h = self.ln_post(h)
        h = self.output_proj(h[:, n_extra:])
        return jnp.swapaxes(h, 1, 2)


class PointEUpsamplerModel:
    """Upsample-stage wrapper mirroring :class:`PointEModel`."""

    def __init__(self, cfg: PointEUpsampleConfig = TINY_UPSAMPLE,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg
        self.module = PointEUpsampleTransformer(cfg)
        key = key if key is not None else jax.random.PRNGKey(0)
        x = jnp.zeros((1, cfg.input_channels, cfg.n_ctx))
        lr = jnp.zeros((1, cfg.input_channels, cfg.cond_ctx))
        self.params = self.module.init(key, x, jnp.zeros((1,)), lr)

    def load_weights(self, path_or_state):
        from .convert import load_safetensors, torch_state_to_flax
        state = (load_safetensors(path_or_state)
                 if isinstance(path_or_state, str) else path_or_state)
        state = {k: v for k, v in state.items()
                 if not (k.startswith("clip.") or k == "channel_scales"
                         or k == "channel_biases")}
        self.params = torch_state_to_flax(state, self.params)
        return self

    def apply(self, params, x, t, low_res=None, embeddings=None, cond=None):
        del cond
        return self.module.apply(params, x, t, low_res, embeddings)
