"""UNet2DConditionModel wiring oracle: the flax implementation vs an
INDEPENDENT torch implementation of the diffusers architecture
(tests/unet_torch_oracle.py), over configs that exercise every block
variant — mixed cross-attention levels, linear vs conv projections,
class embeddings (projection + timestep), encoder_hid projection.

The helper auto-upgrades to real ``diffusers.UNet2DConditionModel``
when the package is importable (not baked into this environment); with
it absent this is a two-independent-implementations check, which
catches wiring/layout mistakes on either side but shares the
architecture reading — documented honestly in VERDICT follow-up.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from gsgen_tpu.guidance.convert import flax_to_torch_state
from gsgen_tpu.guidance.unet2d import TINY, UNet2DConditionModel, UNetConfig

TINY_MIXED = UNetConfig(
    in_channels=3, out_channels=6,
    block_out_channels=(32, 64, 64), layers_per_block=1,
    cross_attention_dim=48, attention_head_dim=(2, 4, 4),
    cross_attn_levels=(False, True, True),
    use_linear_projection=False,          # SD 1.x conv proj_in/out
    encoder_hid_dim=96,                   # IF-style T5 projection
    class_embed_type="timestep")          # IF-II noise-level embedding


def _run_pair(cfg, class_labels=None, class_vec=None):
    model = UNet2DConditionModel(cfg)
    B, R = 2, 16
    rng = np.random.default_rng(0)
    sample = rng.normal(size=(B, R, R, cfg.in_channels)).astype(np.float32)
    t = np.array([13.0, 777.0], np.float32)
    ctx_dim = cfg.encoder_hid_dim or cfg.cross_attention_dim
    ctx = rng.normal(size=(B, 7, ctx_dim)).astype(np.float32) * 0.3

    cl_j = None
    cl_t = None
    if class_labels is not None:
        cl_j = jnp.asarray(class_labels, jnp.float32)
        cl_t = torch.tensor(class_labels)
    if class_vec is not None:
        cl_j = jnp.asarray(class_vec)
        cl_t = torch.from_numpy(class_vec)

    params = model.init(jax.random.PRNGKey(1), jnp.asarray(sample),
                        jnp.asarray(t), jnp.asarray(ctx), cl_j)
    got = model.apply(params, jnp.asarray(sample), jnp.asarray(t),
                      jnp.asarray(ctx), cl_j)
    got = np.asarray(got).transpose(0, 3, 1, 2)        # NHWC -> NCHW

    from tests.unet_torch_oracle import unet_eps
    state = flax_to_torch_state(params)
    state = {k: v for k, v in state.items() if "lora" not in k}
    want = unet_eps(state, cfg,
                    torch.from_numpy(sample.transpose(0, 3, 1, 2)),
                    torch.from_numpy(np.asarray(t)),
                    torch.from_numpy(ctx), cl_t).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_tiny_sd2_style():
    """Linear projections, all-cross levels (SD 2.x family)."""
    _run_pair(TINY)


def test_mixed_blocks_if_style():
    """DownBlock2D/UpBlock2D + conv projections + encoder_hid +
    timestep class embedding (SD 1.x / DeepFloyd family)."""
    _run_pair(TINY_MIXED, class_labels=np.array([3.0, 250.0], np.float32))


def test_projection_class_embedding():
    """VSD camera conditioning: class_embed_type='projection'."""
    cfg = dataclasses.replace(TINY, class_embed_proj_dim=16)
    rng = np.random.default_rng(5)
    _run_pair(cfg, class_vec=rng.normal(size=(2, 16)).astype(np.float32))
