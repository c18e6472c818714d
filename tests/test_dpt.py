"""Flax DPT-hybrid vs the transformers torch oracle.

transformers ships DPT with the hybrid (BiT + ViT) backbone — the same
architecture as the reference's vendored timm-based DPT (reference
utils/dpt.py).  A tiny RANDOM ``DPTForDepthEstimation(is_hybrid=True)``
is a true architecture oracle with zero network access: its state_dict
converts mechanically to the timm/omnidata naming our loader consumes,
and outputs must match.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402
import torch.nn.functional as TF  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gsgen_tpu.priors.dpt import (DPTConfig, TINY_DPT, DPTHybrid, load_dpt,
                                  resize_2d)
from gsgen_tpu.guidance.convert import flax_to_torch_state


def tiny_torch_dpt(seed=0):
    from transformers import DPTConfig as HFDPTConfig, DPTForDepthEstimation
    from transformers.models.bit import BitConfig
    # stem width != stage-1 width, as in the real R50 hybrid (64 -> 256):
    # both frameworks then agree a projection shortcut exists in block 0
    bcfg = BitConfig(num_channels=3, embedding_size=32,
                     hidden_sizes=[48, 64, 128], depths=[1, 1, 1],
                     layer_type="bottleneck", num_groups=4,
                     global_padding="SAME", embedding_dynamic_padding=True,
                     downsample_in_first_stage=False,
                     out_features=["stage1", "stage2", "stage3"])
    cfg = HFDPTConfig(is_hybrid=True, backbone_config=bcfg,
                      hidden_size=32, num_hidden_layers=4,
                      num_attention_heads=2, intermediate_size=64,
                      image_size=64, patch_size=16,
                      backbone_featmap_shape=[1, 128, 4, 4],
                      neck_ignore_stages=[0, 1],
                      backbone_out_indices=[0, 1, 2, 3],
                      fusion_hidden_size=24,
                      neck_hidden_sizes=[48, 64, 16, 20],
                      readout_type="project")
    torch.manual_seed(seed)
    return DPTForDepthEstimation(cfg).eval()


def hf_to_timm_state(model):
    """transformers DPT-hybrid state_dict -> timm/omnidata key naming
    (the bijection documents how the two layouts correspond)."""
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    out = {}
    qkv = {}
    for k, v in sd.items():
        if k.startswith("dpt.embeddings.backbone.bit.embedder.convolution."):
            out["pretrained.model.patch_embed.backbone.stem.conv."
                + k.rsplit(".", 1)[1]] = v
        elif k.startswith("dpt.embeddings.backbone.bit.embedder.norm."):
            out["pretrained.model.patch_embed.backbone.stem.norm."
                + k.rsplit(".", 1)[1]] = v
        elif k.startswith("dpt.embeddings.backbone.bit.encoder.stages."):
            rest = k[len("dpt.embeddings.backbone.bit.encoder.stages."):]
            rest = rest.replace(".layers.", ".blocks.", 1)
            out["pretrained.model.patch_embed.backbone.stages." + rest] = v
        elif k == "dpt.embeddings.cls_token":
            out["pretrained.model.cls_token"] = v
        elif k == "dpt.embeddings.position_embeddings":
            out["pretrained.model.pos_embed"] = v
        elif k.startswith("dpt.embeddings.projection."):
            out["pretrained.model.patch_embed.proj."
                + k.rsplit(".", 1)[1]] = v
        elif k.startswith("dpt.encoder.layer."):
            parts = k.split(".")
            n, rest = parts[3], ".".join(parts[4:])
            pre = f"pretrained.model.blocks.{n}."
            if rest.startswith("attention.attention."):
                qkv.setdefault(n, {})[rest[len("attention.attention."):]] = v
            elif rest.startswith("attention.output.dense."):
                out[pre + "attn.proj." + rest.rsplit(".", 1)[1]] = v
            elif rest.startswith("layernorm_before."):
                out[pre + "norm1." + rest.rsplit(".", 1)[1]] = v
            elif rest.startswith("layernorm_after."):
                out[pre + "norm2." + rest.rsplit(".", 1)[1]] = v
            elif rest.startswith("intermediate.dense."):
                out[pre + "mlp.fc1." + rest.rsplit(".", 1)[1]] = v
            elif rest.startswith("output.dense."):
                out[pre + "mlp.fc2." + rest.rsplit(".", 1)[1]] = v
            else:
                raise KeyError(k)
        elif k.startswith("dpt.layernorm."):
            out["pretrained.model.norm." + k.rsplit(".", 1)[1]] = v
        elif k.startswith("neck.reassemble_stage.readout_projects."):
            n = int(k.split(".")[3])
            leaf = k.rsplit(".", 1)[1]
            if n >= 2:   # 0/1 unused by the hybrid (resnet taps)
                post = 3 if n == 2 else 4
                out[f"pretrained.act_postprocess{post}.0.project.0.{leaf}"] = v
        elif k.startswith("neck.reassemble_stage.layers."):
            n = int(k.split(".")[3])
            leaf = k.rsplit(".", 1)[1]
            kind = k.split(".")[4]
            if n == 2 and kind == "projection":
                out[f"pretrained.act_postprocess3.3.{leaf}"] = v
            elif n == 3 and kind == "projection":
                out[f"pretrained.act_postprocess4.3.{leaf}"] = v
            elif n == 3 and kind == "resize":
                out[f"pretrained.act_postprocess4.4.{leaf}"] = v
            # layers 0/1: ignored hybrid stages
        elif k.startswith("neck.convs."):
            n = int(k.split(".")[2])
            out[f"scratch.layer{n + 1}_rn.weight"] = v
        elif k.startswith("neck.fusion_stage.layers."):
            parts = k.split(".")
            j = int(parts[3])
            ref = f"scratch.refinenet{4 - j}."
            rest = ".".join(parts[4:])
            rest = rest.replace("projection.", "out_conv.")
            rest = rest.replace("residual_layer1.", "resConfUnit1.")
            rest = rest.replace("residual_layer2.", "resConfUnit2.")
            rest = rest.replace("convolution1.", "conv1.")
            rest = rest.replace("convolution2.", "conv2.")
            out[ref + rest] = v
        elif k.startswith("head.head."):
            n = k.split(".")[2]
            out[f"scratch.output_conv.{n}." + k.rsplit(".", 1)[1]] = v
        else:
            raise KeyError(f"unmapped oracle key {k}")
    for n, d in qkv.items():
        out[f"pretrained.model.blocks.{n}.attn.qkv.weight"] = np.concatenate(
            [d["query.weight"], d["key.weight"], d["value.weight"]], axis=0)
        out[f"pretrained.model.blocks.{n}.attn.qkv.bias"] = np.concatenate(
            [d["query.bias"], d["key.bias"], d["value.bias"]], axis=0)
    return out


def test_dpt_matches_transformers_oracle():
    model = tiny_torch_dpt()
    x = torch.rand(2, 3, 64, 64)
    with torch.no_grad():
        want = model(x).predicted_depth.numpy()          # [B, 64, 64]

    module, params = load_dpt(hf_to_timm_state(model), TINY_DPT)
    got = np.asarray(module.apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))[..., 0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_dpt_loader_roundtrip():
    module = DPTHybrid(TINY_DPT)
    params = module.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)))
    state = flax_to_torch_state(params)
    module2, params2 = load_dpt(state, TINY_DPT)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mode,ac,size", [
    ("linear", True, (13, 29)), ("linear", False, (13, 29)),
    ("cubic", False, (96, 50)), ("linear", True, (64, 64)),
])
def test_resize_matches_torch(mode, ac, size):
    torch.manual_seed(0)
    x = torch.rand(2, 3, 32, 24)
    tmode = {"linear": "bilinear", "cubic": "bicubic"}[mode]
    want = TF.interpolate(x, size=size, mode=tmode, align_corners=ac)
    got = resize_2d(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), size,
                    mode, align_corners=ac)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
        rtol=1e-5, atol=1e-5)


def test_estimator_losses_in_train_step():
    """DPT estimator losses (reference trainer.py:424-456) jit into the
    train step: loss is finite and the normal channel is rendered."""
    from gsgen_tpu.data.cameras import CameraSamplerConfig
    from gsgen_tpu.guidance.mock import MockGuidance
    from gsgen_tpu.models.background import BackgroundConfig
    from gsgen_tpu.models.density import DensifyConfig, PruneConfig
    from gsgen_tpu.models.init import InitConfig
    from gsgen_tpu.models.scene import RenderConfig
    from gsgen_tpu.priors.dpt import DPTEstimator
    from gsgen_tpu.training.trainer import Trainer, TrainerConfig

    def tiny_est(mode, seed):
        module = DPTHybrid(TINY_DPT if mode == "depth" else
                           __import__("dataclasses").replace(
                               TINY_DPT, num_channels=3))
        params = module.init(jax.random.PRNGKey(seed),
                             jnp.zeros((1, 64, 64, 3)))
        return DPTEstimator(module, params, mode)

    tcfg = TrainerConfig(
        max_steps=4, batch_size=1, log_period=1000, save_period=1000,
        estimators={"depth": {"enabled": True, "value": 0.5},
                    "normal": {"enabled": True, "value": 0.1}})
    trainer = Trainer(
        cfg=tcfg, rcfg=RenderConfig(dup_cap=4096, chunk=64),
        init_cfg=InitConfig(num_points=32, capacity=32, svec_val=0.05),
        bg_cfg=BackgroundConfig(type="fixed"),
        data_cfg=CameraSamplerConfig(batch_size=1, max_steps=4, reso=(24,)),
        guidance=MockGuidance(mode="constant_color"),
        dcfg=DensifyConfig(enabled=False), pcfg=PruneConfig(enabled=False),
        estimators={"depth": tiny_est("depth", 0),
                    "normal": tiny_est("normal", 1)},
    )
    assert trainer.rcfg.render_normal
    m = trainer.train_step(0)
    assert np.isfinite(m["loss_total"])
    assert "loss_est_depth" in m and "loss_est_normal" in m
    assert np.isfinite(m["loss_est_depth"]) and np.isfinite(m["loss_est_normal"])
