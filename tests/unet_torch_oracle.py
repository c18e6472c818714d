"""An INDEPENDENT torch implementation of diffusers'
UNet2DConditionModel forward, driven purely by a diffusers-layout state
dict.  Written from the diffusers architecture spec (not from the flax
code) so that agreement between the two is evidence about block wiring
— conv/GN semantics, attention head layout, GEGLU, skip-concat order,
up/downsampling — and not just about weight-format round-trips.

If the real ``diffusers`` package is importable (it is not baked into
this environment), :func:`unet_eps` automatically uses
``diffusers.UNet2DConditionModel`` instead — the gold-standard oracle
slots in with zero test changes the day the wheel is provisioned.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def _has_diffusers() -> bool:
    try:
        import diffusers  # noqa: F401
        return True
    except ImportError:
        return False


def unet_eps(state, cfg, sample_nchw, timesteps, ctx, class_labels=None):
    """Forward eps prediction.  cfg is the flax UNetConfig (read only for
    architecture hyperparameters); state a diffusers-layout state dict.
    sample [B, C, H, W] torch; returns [B, C_out, H, W] torch."""
    if _has_diffusers():
        return _diffusers_eps(state, cfg, sample_nchw, timesteps, ctx,
                              class_labels)
    return _manual_eps(state, cfg, sample_nchw, timesteps, ctx,
                       class_labels)


def _diffusers_eps(state, cfg, sample, timesteps, ctx, class_labels):
    import diffusers
    down, up = [], []
    for lvl, cross in enumerate(cfg.cross_attn_levels):
        down.append("CrossAttnDownBlock2D" if cross else "DownBlock2D")
    for cross in reversed(cfg.cross_attn_levels):
        up.append("CrossAttnUpBlock2D" if cross else "UpBlock2D")
    model = diffusers.UNet2DConditionModel(
        in_channels=cfg.in_channels, out_channels=cfg.out_channels,
        block_out_channels=list(cfg.block_out_channels),
        layers_per_block=cfg.layers_per_block,
        cross_attention_dim=cfg.cross_attention_dim,
        attention_head_dim=list(cfg.attention_head_dim),
        down_block_types=down, up_block_types=up,
        use_linear_projection=cfg.use_linear_projection,
        sample_size=sample.shape[-1],
        class_embed_type=(None if cfg.class_embed_proj_dim is None
                          and cfg.class_embed_type != "timestep"
                          else cfg.class_embed_type),
        projection_class_embeddings_input_dim=cfg.class_embed_proj_dim,
        encoder_hid_dim=cfg.encoder_hid_dim)
    model.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in state.items()})
    model.eval()
    with torch.no_grad():
        return model(sample, timesteps, encoder_hidden_states=ctx,
                     class_labels=class_labels).sample


# ---------------------------------------------------------------------------
# manual functional implementation
# ---------------------------------------------------------------------------


def _manual_eps(state, cfg, sample, timesteps, ctx, class_labels):
    td = {k: torch.as_tensor(np.asarray(v)).float()
          for k, v in state.items()}

    def conv(p, h, stride=1):
        return F.conv2d(h, td[f"{p}.weight"], td[f"{p}.bias"],
                        stride=stride, padding=1)

    def conv1x1(p, h):
        return F.conv2d(h, td[f"{p}.weight"], td[f"{p}.bias"])

    def lin(p, h):
        return h @ td[f"{p}.weight"].T + td[f"{p}.bias"]

    def gn(p, h, eps):
        return F.group_norm(h, 32, td[f"{p}.weight"], td[f"{p}.bias"], eps)

    def ln(p, h):
        return F.layer_norm(h, (h.shape[-1],), td[f"{p}.weight"],
                            td[f"{p}.bias"])

    def sinusoidal(t, dim):
        half = dim // 2
        exponent = -math.log(10000.0) * torch.arange(half).float()
        exponent = exponent / (half - cfg.freq_shift)
        emb = t.float()[:, None] * torch.exp(exponent)[None]
        emb = torch.cat([emb.sin(), emb.cos()], dim=-1)
        if cfg.flip_sin_to_cos:
            emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
        return emb

    def time_embedding(p, e):
        return lin(f"{p}.linear_2", F.silu(lin(f"{p}.linear_1", e)))

    def resnet(p, h, temb):
        res = h
        h = conv(f"{p}.conv1", F.silu(gn(f"{p}.norm1", h, 1e-5)))
        h = h + lin(f"{p}.time_emb_proj", F.silu(temb))[:, :, None, None]
        h = conv(f"{p}.conv2", F.silu(gn(f"{p}.norm2", h, 1e-5)))
        if f"{p}.conv_shortcut.weight" in td:
            res = conv1x1(f"{p}.conv_shortcut", res)
        return h + res

    def attention(p, x, context):
        B, L, _ = x.shape
        q = x @ td[f"{p}.to_q.weight"].T
        k = context @ td[f"{p}.to_k.weight"].T
        v = context @ td[f"{p}.to_v.weight"].T
        D = q.shape[-1]
        # head count from the level config: head_dim fixed at
        # dim/heads; recover heads from the current width
        heads = D // _head_dim(cfg, D)
        hd = D // heads

        def split(t):
            return t.view(B, -1, heads, hd).transpose(1, 2)
        q, k, v = split(q), split(k), split(v)
        w = torch.softmax(
            (q.float() @ k.float().transpose(-1, -2)) / math.sqrt(hd),
            dim=-1)
        o = (w @ v.float()).transpose(1, 2).reshape(B, L, D)
        return lin(f"{p}.to_out.0", o)

    def tblock(p, x, context):
        x = x + attention(f"{p}.attn1", ln(f"{p}.norm1", x), ln(
            f"{p}.norm1", x))
        x = x + attention(f"{p}.attn2", ln(f"{p}.norm2", x), context)
        h = ln(f"{p}.norm3", x)
        h = lin(f"{p}.ff.net.0.proj", h)
        a, gate = h.chunk(2, dim=-1)
        h = a * F.gelu(gate)                    # exact gelu
        return x + lin(f"{p}.ff.net.2", h)

    def transformer(p, h, context, n_blocks):
        B, C, H, W = h.shape
        res = h
        h = gn(f"{p}.norm", h, 1e-6)
        if cfg.use_linear_projection:
            h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
            h = lin(f"{p}.proj_in", h)
        else:
            h = conv1x1(f"{p}.proj_in", h)
            h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        for b in range(n_blocks):
            h = tblock(f"{p}.transformer_blocks.{b}", h, context)
        if cfg.use_linear_projection:
            h = lin(f"{p}.proj_out", h)
            h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        else:
            h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
            h = conv1x1(f"{p}.proj_out", h)
        return h + res

    n_levels = len(cfg.block_out_channels)
    with torch.no_grad():
        temb = time_embedding(
            "time_embedding",
            sinusoidal(timesteps, cfg.block_out_channels[0]))
        if class_labels is not None:
            if cfg.class_embed_type == "timestep":
                ce = sinusoidal(class_labels, cfg.block_out_channels[0])
            else:
                ce = class_labels.float()
            temb = temb + time_embedding("class_embedding", ce)
        context = ctx.float()
        if cfg.encoder_hid_dim is not None:
            context = lin("encoder_hid_proj", context)

        h = conv("conv_in", sample.float())
        skips = [h]
        for lvl in range(n_levels):
            p = f"down_blocks.{lvl}"
            for j in range(cfg.layers_per_block):
                h = resnet(f"{p}.resnets.{j}", h, temb)
                if cfg.cross_attn_levels[lvl]:
                    h = transformer(f"{p}.attentions.{j}", h, context, 1)
                skips.append(h)
            if lvl < n_levels - 1:
                h = conv(f"{p}.downsamplers.0.conv", h, stride=2)
                skips.append(h)

        h = resnet("mid_block.resnets.0", h, temb)
        h = transformer("mid_block.attentions.0", h, context, 1)
        h = resnet("mid_block.resnets.1", h, temb)

        rev_attn = list(reversed(cfg.cross_attn_levels))
        for lvl in range(n_levels):
            p = f"up_blocks.{lvl}"
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = torch.cat([h, skip], dim=1)
                h = resnet(f"{p}.resnets.{j}", h, temb)
                if rev_attn[lvl]:
                    h = transformer(f"{p}.attentions.{j}", h, context, 1)
            if lvl < n_levels - 1:
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = conv(f"{p}.upsamplers.0.conv", h)

        h = F.silu(gn("conv_norm_out", h, 1e-5))
        return conv("conv_out", h)


def _head_dim(cfg, width):
    """Diffusers attention_head_dim is a per-level HEAD COUNT for SD;
    dim/heads is constant per level — find the level whose channel width
    matches."""
    for ch, heads in zip(cfg.block_out_channels, cfg.attention_head_dim):
        if ch == width:
            return width // heads
    raise ValueError(f"no level with width {width}")
