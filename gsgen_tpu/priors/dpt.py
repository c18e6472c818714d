"""DPT-hybrid monocular depth / surface-normal estimator in flax.

TPU port of the reference's vendored Intel DPT (reference utils/dpt.py,
1056 LoC torch+timm) used for image-to-3D initialization and the
optional depth/normal estimator losses (reference trainer.py:101-107,
424-456).  The reference instantiates ``DPTDepthModel(backbone=
"vitb_rn50_384")`` — timm's R50+ViT-B/16 hybrid — and loads the
omnidata v2 checkpoints (utils/dpt.py:998-1031).

Architecture (all shapes at the canonical 384x384 input):

  ResNetV2 stem (weight-standardized 7x7/2 conv + GroupNorm + 3x3/2
  maxpool, TF-SAME padding)                         -> [B,  96,  96,   64]
  stage1 (3 bottlenecks, stride 1)   -> hook "1"    -> [B,  96,  96,  256]
  stage2 (4 bottlenecks, stride 2)   -> hook "2"    -> [B,  48,  48,  512]
  stage3 (9 bottlenecks, stride 2)                  -> [B,  24,  24, 1024]
  1x1 patch projection + cls token + pos embed      -> [B, 577, 768]
  12 ViT-B blocks                    -> hooks 8, 11 -> [B, 577, 768]
  readout-project + unflatten (+3x3/2 for hook 11)  -> two [B, 24, 24, .]
  scratch 3x3 convs -> 256ch; 4 fusion refinenets (x2 upsample each,
  align_corners=True); 3-conv head -> [B, 384, 384, C]

The flax parameter tree is in 1:1 bijection with the timm/omnidata
state_dict (``pretrained.model.*`` / ``scratch.*`` keys, as produced by
the reference's DPT_ module) via :mod:`gsgen_tpu.guidance.convert`;
numerical parity is tested against the transformers ``DPTForDepth
Estimation(is_hybrid=True)`` torch oracle (tests/test_dpt.py), whose
weights convert to the same naming.

TPU-first design notes: NHWC layout throughout; every resize (bilinear
align-corners, bilinear half-pixel, bicubic a=-0.75) is expressed as a
dense [out, in] interpolation-matrix contraction so it runs on the MXU
instead of gather chains; the whole estimator jits into the training
step when estimator losses are enabled.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..guidance.convert import torch_state_to_flax


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    """vitb_rn50_384 hybrid defaults (timm R50+ViT-B/16)."""

    image_size: int = 384
    patch_size: int = 16
    stem_width: int = 64
    stage_depths: Tuple[int, ...] = (3, 4, 9)
    stage_widths: Tuple[int, ...] = (256, 512, 1024)
    num_groups: int = 32
    vit_hidden: int = 768
    vit_layers: int = 12
    vit_heads: int = 12
    vit_mlp: int = 3072
    hooks: Tuple[int, int] = (8, 11)       # ViT block outputs for stages 3/4
    post_channels: Tuple[int, int] = (768, 768)  # act_postprocess3/4 out
    features: int = 256                    # fusion width
    num_channels: int = 1                  # 1 depth / 3 normal
    std_eps: float = 1e-8                  # weight-standardization eps
    gn_eps: float = 1e-5
    ln_eps: float = 1e-6                   # timm ViT (1e-12 in HF DPT)


# tiny config for oracle tests (matches the tiny transformers DPT-hybrid
# in tests/test_dpt.py)
TINY_DPT = DPTConfig(image_size=64, stem_width=32, stage_depths=(1, 1, 1),
                     stage_widths=(48, 64, 128), num_groups=4,
                     vit_hidden=32, vit_layers=4, vit_heads=2, vit_mlp=64,
                     hooks=(2, 3), post_channels=(16, 20), features=24,
                     ln_eps=1e-12)


# ---- resize-as-matmul helpers ----------------------------------------

def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel (torch bicubic uses a=-0.75)."""
    t = np.abs(t)
    out = np.where(
        t <= 1.0, (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
        np.where(t < 2.0, a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a,
                 0.0))
    return out


def _resize_matrix(n_in: int, n_out: int, mode: str,
                   align_corners: bool) -> np.ndarray:
    """[n_out, n_in] interpolation matrix replicating torch
    F.interpolate along one axis (edge-clamped taps)."""
    if n_out == n_in and mode != "cubic":
        return np.eye(n_in, dtype=np.float32)
    i = np.arange(n_out, dtype=np.float64)
    if align_corners:
        src = i * (n_in - 1) / max(n_out - 1, 1)
    else:
        src = np.clip((i + 0.5) * n_in / n_out - 0.5, 0.0, n_in - 1)
    m = np.zeros((n_out, n_in), dtype=np.float64)
    if mode == "linear":
        lo = np.floor(src).astype(int)
        hi = np.minimum(lo + 1, n_in - 1)
        w = src - lo
        m[i.astype(int), lo] += 1.0 - w
        m[i.astype(int), hi] += w
    elif mode == "cubic":
        # torch bicubic is half-pixel with UNclamped source coordinate
        # and edge-replicated taps
        src = (i + 0.5) * n_in / n_out - 0.5
        base = np.floor(src).astype(int)
        for k in range(-1, 3):
            tap = base + k
            w = _cubic_kernel(src - tap)
            tap = np.clip(tap, 0, n_in - 1)
            np.add.at(m, (i.astype(int), tap), w)
    else:
        raise ValueError(mode)
    return m.astype(np.float32)


def resize_2d(x: jax.Array, out_hw: Tuple[int, int], mode: str = "linear",
              align_corners: bool = False) -> jax.Array:
    """Resize [B, H, W, C] via two dense matrix contractions (MXU)."""
    H, W = x.shape[1], x.shape[2]
    oh, ow = out_hw
    if (oh, ow) == (H, W) and mode == "linear":
        return x
    mh = jnp.asarray(_resize_matrix(H, oh, mode, align_corners))
    mw = jnp.asarray(_resize_matrix(W, ow, mode, align_corners))
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


def _make_divisible(v: float, divisor: int = 8,
                    round_limit: float = 0.9) -> int:
    """timm make_divisible — bottleneck mid width = make_divisible(
    out * 0.25) (timm resnetv2 Bottleneck; 256 -> 64 etc.)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < round_limit * v:
        new_v += divisor
    return new_v


def _same_pad(size: int, k: int, s: int) -> Tuple[int, int]:
    """TF-SAME asymmetric padding (timm StdConv2dSame/MaxPool2dSame)."""
    out = -(-size // s)
    pad = max((out - 1) * s + k - size, 0)
    return (pad // 2, pad - pad // 2)


# ---- primitive modules ------------------------------------------------

class StdConv(nn.Module):
    """Weight-standardized conv, TF-SAME padding, no bias
    (timm StdConv2dSame eps=1e-8; BiT / hybrid-ViT convs)."""

    features: int
    kernel_size: int
    stride: int = 1
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, cin, self.features))
        mu = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
        w = (w - mu) * jax.lax.rsqrt(var + self.eps)
        pad = (_same_pad(x.shape[1], k, self.stride),
               _same_pad(x.shape[2], k, self.stride))
        return jax.lax.conv_general_dilated(
            x, w, (self.stride, self.stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _gn(groups, eps, name):
    """Named GroupNorm whose scale/bias sit directly at ``name`` in the
    param tree (timm GroupNormAct; activation applied by the caller)."""
    return nn.GroupNorm(num_groups=groups, epsilon=eps, name=name)


class Downsample(nn.Module):
    """Projection shortcut (timm DownsampleConv): 1x1 std conv + GN."""

    out_ch: int
    stride: int
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = StdConv(self.out_ch, 1, self.stride, eps=c.std_eps,
                    name="conv")(x)
        return _gn(c.num_groups, c.gn_eps, "norm")(x)


class Bottleneck(nn.Module):
    """timm ResNetV2 non-preact bottleneck (resnetv2.py Bottleneck):
    conv-norm x3 with ReLU after norm1/2 only, projection shortcut on
    channel/stride change, ReLU after the residual add."""

    out_ch: int
    stride: int
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        mid = _make_divisible(self.out_ch * 0.25)
        if x.shape[-1] != self.out_ch or self.stride != 1:
            shortcut = Downsample(self.out_ch, self.stride, c,
                                  name="downsample")(x)
        else:
            shortcut = x
        y = StdConv(mid, 1, eps=c.std_eps, name="conv1")(x)
        y = jax.nn.relu(_gn(c.num_groups, c.gn_eps, "norm1")(y))
        y = StdConv(mid, 3, self.stride, eps=c.std_eps, name="conv2")(y)
        y = jax.nn.relu(_gn(c.num_groups, c.gn_eps, "norm2")(y))
        y = StdConv(self.out_ch, 1, eps=c.std_eps, name="conv3")(y)
        y = _gn(c.num_groups, c.gn_eps, "norm3")(y)
        return jax.nn.relu(y + shortcut)


class Attention(nn.Module):
    """timm ViT attention: fused qkv projection."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        D, H = c.vit_hidden, c.vit_heads
        hd = D // H
        B, L, _ = x.shape
        qkv = nn.Dense(3 * D, name="qkv")(x).reshape(B, L, 3, H, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("blhd,bshd->bhls", q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhls,bshd->blhd", attn, v).reshape(B, L, D)
        return nn.Dense(D, name="proj")(o)


class Mlp(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.Dense(c.vit_mlp, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(c.vit_hidden, name="fc2")(x)


class ViTBlock(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = x + Attention(c, name="attn")(
            nn.LayerNorm(epsilon=c.ln_eps, name="norm1")(x))
        return x + Mlp(c, name="mlp")(
            nn.LayerNorm(epsilon=c.ln_eps, name="norm2")(x))


class HybridViT(nn.Module):
    """timm vit_base_resnet50_384: ResNetV2 feature stem + ViT blocks.

    Returns (stage1, stage2, hook_a, hook_b) activations — the four
    DPT tap points (reference utils/dpt.py:388-396)."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        feats = []
        # stem: conv 7x7/2 + GN/ReLU + maxpool 3x3/2, all TF-SAME
        h = StdConv(c.stem_width, 7, 2, eps=c.std_eps,
                    name="patch_embed.backbone.stem.conv")(x)
        h = jax.nn.relu(_gn(c.num_groups, c.gn_eps,
                            "patch_embed.backbone.stem.norm")(h))
        ph, pw = _same_pad(h.shape[1], 3, 2), _same_pad(h.shape[2], 3, 2)
        h = jax.lax.reduce_window(
            h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), ph, pw, (0, 0)))
        for s, (depth, width) in enumerate(zip(c.stage_depths,
                                               c.stage_widths)):
            for b in range(depth):
                stride = 2 if (b == 0 and s > 0) else 1
                h = Bottleneck(
                    width, stride, c,
                    name=f"patch_embed.backbone.stages.{s}.blocks.{b}")(h)
            if s < 2:
                feats.append(h)

        B, gh, gw, _ = h.shape
        tokens = nn.Conv(c.vit_hidden, (1, 1),
                         name="patch_embed.proj")(h).reshape(B, gh * gw,
                                                             c.vit_hidden)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, c.vit_hidden))
        grid0 = c.image_size // c.patch_size
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, 1 + grid0 * grid0, c.vit_hidden))
        if (gh, gw) != (grid0, grid0):
            # bilinear-resized position grid (utils/dpt.py:125-139)
            pg = pos[:, 1:].reshape(1, grid0, grid0, c.vit_hidden)
            pg = resize_2d(pg, (gh, gw), "linear", align_corners=False)
            pos = jnp.concatenate(
                [pos[:, :1], pg.reshape(1, gh * gw, c.vit_hidden)], axis=1)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, c.vit_hidden)), tokens], axis=1)
        tokens = tokens + pos

        for i in range(c.vit_layers):
            tokens = ViTBlock(c, name=f"blocks.{i}")(tokens)
            if i in c.hooks:
                feats.append(tokens)
        # final norm exists in the checkpoint; its output (the unused
        # ``glob`` of forward_flex, utils/dpt.py:82-90) is discarded
        nn.LayerNorm(epsilon=c.ln_eps, name="norm")(tokens)
        return feats


class ProjectReadout(nn.Module):
    """'project' readout: fold the cls token into every patch token
    (utils/dpt.py:57-68)."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, tokens):
        B, L, D = tokens.shape
        readout = jnp.broadcast_to(tokens[:, :1], (B, L - 1, D))
        h = jnp.concatenate([tokens[:, 1:], readout], axis=-1)
        h = nn.Dense(D, name="project.0")(h)
        return jax.nn.gelu(h, approximate=False)


class ResidualConvUnit(nn.Module):
    """ResidualConvUnit_custom, bn=False (utils/dpt.py:773-840)."""

    features: int

    @nn.compact
    def __call__(self, x):
        y = jax.nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), name="conv1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(y)
        return y + x


class FusionBlock(nn.Module):
    """FeatureFusionBlock_custom: add refined skip, refine, x2 upsample
    (align_corners=True), 1x1 out conv (utils/dpt.py:841-900)."""

    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="resConfUnit1")(skip)
        else:
            # parameters exist in the checkpoint even when unused
            ResidualConvUnit(self.features, name="resConfUnit1")(
                jnp.zeros_like(x))
        x = ResidualConvUnit(self.features, name="resConfUnit2")(x)
        x = resize_2d(x, (x.shape[1] * 2, x.shape[2] * 2), "linear",
                      align_corners=True)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTHybrid(nn.Module):
    """The full depth/normal network (reference DPTDepthModel,
    utils/dpt.py:975-995).  Input [B, H, W, 3] at cfg.image_size;
    output [B, H, W, num_channels] (non-negative)."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        f1, f2, t3, t4 = HybridViT(c, name="pretrained.model")(x)
        B = x.shape[0]
        gh = gw = x.shape[1] // c.patch_size

        def unflatten(tok):
            return tok.reshape(B, gh, gw, c.vit_hidden)

        l3 = ProjectReadout(c, name="pretrained.act_postprocess3.0")(t3)
        l3 = nn.Conv(c.post_channels[0], (1, 1),
                     name="pretrained.act_postprocess3.3")(unflatten(l3))
        l4 = ProjectReadout(c, name="pretrained.act_postprocess4.0")(t4)
        l4 = nn.Conv(c.post_channels[1], (1, 1),
                     name="pretrained.act_postprocess4.3")(unflatten(l4))
        l4 = nn.Conv(c.post_channels[1], (3, 3), strides=2, padding=((1, 1), (1, 1)),
                     name="pretrained.act_postprocess4.4")(l4)

        F = c.features
        r1 = nn.Conv(F, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                     name="scratch.layer1_rn")(f1)
        r2 = nn.Conv(F, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                     name="scratch.layer2_rn")(f2)
        r3 = nn.Conv(F, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                     name="scratch.layer3_rn")(l3)
        r4 = nn.Conv(F, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                     name="scratch.layer4_rn")(l4)

        p4 = FusionBlock(F, name="scratch.refinenet4")(r4)
        p3 = FusionBlock(F, name="scratch.refinenet3")(p4, r3)
        p2 = FusionBlock(F, name="scratch.refinenet2")(p3, r2)
        p1 = FusionBlock(F, name="scratch.refinenet1")(p2, r1)

        h = nn.Conv(F // 2, (3, 3), padding=((1, 1), (1, 1)),
                    name="scratch.output_conv.0")(p1)
        h = resize_2d(h, (h.shape[1] * 2, h.shape[2] * 2), "linear",
                      align_corners=True)
        h = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), name="scratch.output_conv.2")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(c.num_channels, (1, 1),
                    name="scratch.output_conv.4")(h)
        return jax.nn.relu(h)


# ---- loading ----------------------------------------------------------

# checkpoint keys that exist in the timm model but play no role in the
# DPT forward pass (classifier head; the final norm IS loaded since the
# flax tree includes it)
_IGNORED_PREFIXES = ("pretrained.model.head.",)


def load_dpt(state_dict, cfg: DPTConfig = DPTConfig(), num_channels=None):
    """Build DPTHybrid and fill it from an omnidata/timm-layout
    state_dict (keys ``pretrained.model.*`` / ``scratch.*`` — what the
    reference's DPT_ module produces, utils/dpt.py:915-995).

    Returns (module, {"params": ...}).
    """
    if num_channels is not None:
        cfg = dataclasses.replace(cfg, num_channels=num_channels)
    module = DPTHybrid(cfg)
    tpl = jax.eval_shape(
        lambda: module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3))))
    tpl = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), tpl)
    state = {k: v for k, v in state_dict.items()
             if not any(k.startswith(p) for p in _IGNORED_PREFIXES)}
    params = torch_state_to_flax(state, tpl, skip_substrings=(),
                                 strict=True)
    return module, params


def load_omnidata_checkpoint(path: str, mode: str = "depth",
                             cfg: DPTConfig = DPTConfig()):
    """Load an omnidata v2 ``.ckpt`` (torch pickle; the reference strips
    the lightning ``model.`` prefix, utils/dpt.py:1024-1030)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    state = {}
    for k, v in sd.items():
        if k.startswith("model."):
            k = k[len("model."):]
        state[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return load_dpt(state, cfg,
                    num_channels=3 if mode == "normal" else 1)


class DPTEstimator:
    """Callable matching the reference's DPT wrapper (utils/dpt.py:
    998-1051): [B, H, W, 3] rgb in [0, 1] -> depth [B, H, W, 1] or
    normal [B, H, W, 3], both clamped to [0, 1] and bicubic-resized
    back to the input resolution."""

    def __init__(self, module: DPTHybrid, params, mode: str = "depth"):
        self.module = module
        self.params = params
        self.mode = mode
        self._jitted = jax.jit(self.estimate)

    @classmethod
    def from_checkpoint(cls, path: str, mode: str = "depth",
                        cfg: DPTConfig = DPTConfig()):
        module, params = load_omnidata_checkpoint(path, mode, cfg)
        return cls(module, params, mode)

    def estimate(self, rgb: jax.Array) -> jax.Array:
        """Pure function of [B, H, W, 3] rgb — composes into an outer
        jit (the train step runs this inside loss_fn)."""
        size = self.module.cfg.image_size
        H, W = rgb.shape[1], rgb.shape[2]
        x = resize_2d(rgb, (size, size), "linear", align_corners=False)
        if self.mode == "depth":
            x = (x - 0.5) / 0.5          # transforms.Normalize(0.5, 0.5)
        out = self.module.apply(self.params, x)
        out = jnp.clip(out, 0.0, 1.0)
        return resize_2d(out, (H, W), "cubic", align_corners=False)

    def __call__(self, rgb: jax.Array) -> jax.Array:
        return self._jitted(rgb)
