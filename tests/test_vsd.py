"""Faithful VSD: attention-LoRA + camera class-embedding on the flax
UNet (reference guidance/stable_diffusion_vsd.py:145-179,388-676)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsgen_tpu.guidance.sd_unet import (TINY, TINY_VSD, SDUNetBackbone,
                                        UNetConfig)
from gsgen_tpu.guidance.vsd import VSDConfig, VSDGuidance
from gsgen_tpu.prompt.processors import PromptProcessor, PromptProcessorConfig


@pytest.fixture(scope="module")
def vsd():
    bb = SDUNetBackbone(TINY_VSD, latent_size=8)
    return VSDGuidance(VSDConfig(lora_rank=4), bb)


@pytest.fixture(scope="module")
def emb():
    return PromptProcessor(PromptProcessorConfig(use_cache=False))()


def test_trainable_subtree(vsd):
    assert vsd.faithful
    assert len(vsd.trainable_params) > 0
    for k in vsd.trainable_params:
        assert "lora" in k or "class_embedding" in k
    # LoRA up-projections start at zero (diffusers LoRALinearLayer)
    ups = [v for k, v in vsd.trainable_params.items() if k.endswith("up/kernel")]
    assert ups and all(float(jnp.abs(u).max()) == 0.0 for u in ups)


def test_lora_equals_pretrain_at_init(vsd):
    """up=0 LoRA + zero camera -> the adapted model IS the base model
    (class_embedding output is exactly 0 on a zero vector: Dense bias
    init is zeros)."""
    frozen = vsd.frozen_params
    train = vsd.trainable_params
    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    t = jnp.array([10, 500])
    text = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 1024)) * 0.1
    cam0 = jnp.zeros((2, 16))
    e_pre = vsd._eps_pretrain(frozen, lat, t, text)
    e_lora = vsd._eps_lora(frozen, train, lat, t, text, cam0)
    np.testing.assert_allclose(np.asarray(e_lora), np.asarray(e_pre),
                               atol=1e-5)
    # a nonzero camera breaks the tie (class embedding reaches temb)
    e_cam = vsd._eps_lora(frozen, train, lat, t, text,
                          jnp.ones((2, 16)))
    assert float(jnp.abs(e_cam - e_pre).max()) > 1e-6


def test_vsd_loss_and_grads(vsd, emb):
    B = 2
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (B, 16, 16, 3))
    c2ws = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 4))
    sched = {"min_t": jnp.int32(20), "max_t": jnp.int32(980)}

    def losses(rgb, train):
        out = vsd.loss({"frozen": vsd.frozen_params, "train": train},
                       rgb, emb, jnp.zeros(B), jnp.array([0.0, 120.0]),
                       jnp.ones(B) * 2.5, jax.random.PRNGKey(2), sched,
                       c2ws=c2ws)
        return out["loss_vsd"] + out["loss_lora"], out

    (val, out), grads = jax.value_and_grad(
        losses, argnums=(0, 1), has_aux=True)(rgb, vsd.trainable_params)
    assert np.isfinite(float(val))
    assert np.isfinite(float(out["loss_vsd"]))
    assert np.isfinite(float(out["loss_lora"]))
    g_rgb, g_train = grads
    assert float(jnp.abs(g_rgb).max()) > 0.0          # drives the scene
    leaves = jax.tree_util.tree_leaves(g_train)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    # up-projection grads are nonzero through loss_lora
    up_g = [g for k, g in g_train.items() if k.endswith("up/kernel")]
    assert any(float(jnp.abs(g).max()) > 0.0 for g in up_g)


def test_sample_and_sample_lora(vsd, emb):
    B = 1
    params = {"frozen": vsd.frozen_params, "train": vsd.trainable_params}
    img = vsd.sample(params, emb, jnp.zeros(B), jnp.zeros(B),
                     jnp.ones(B) * 2.5, jax.random.PRNGKey(0), num_steps=2)
    assert img.shape == (B, vsd.backbone.image_size,
                         vsd.backbone.image_size, 3)
    assert bool(jnp.isfinite(img).all())
    c2ws = jnp.tile(jnp.eye(3, 4)[None], (B, 1, 1))
    img2 = vsd.sample_lora(params, emb, jnp.zeros(B), jnp.zeros(B),
                           jnp.ones(B) * 2.5, c2ws, jax.random.PRNGKey(0),
                           num_steps=2)
    assert img2.shape == img.shape
    assert bool(jnp.isfinite(img2).all())


def test_variance_split_sds():
    """IF-style 6-channel output: SDS uses only the eps half
    (reference deep_floyd.py:174-181)."""
    from gsgen_tpu.guidance.sds import SDSConfig, SDSGuidance
    cfg6 = UNetConfig(in_channels=3, out_channels=6,
                      block_out_channels=(32, 64), layers_per_block=1,
                      cross_attention_dim=1024, attention_head_dim=(2, 2),
                      cross_attn_levels=(True, True))
    bb = SDUNetBackbone(cfg6, latent_size=8, use_vae=False)
    g = SDSGuidance(SDSConfig(rgb_as_latents=True, guidance_scale=20.0), bb)
    pe = PromptProcessor(PromptProcessorConfig(use_cache=False))()
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    sched = {"min_t": jnp.int32(20), "max_t": jnp.int32(980)}

    def loss(rgb):
        out = g.loss(g.params, rgb, pe, jnp.zeros(2),
                     jnp.array([0.0, 120.0]), jnp.ones(2) * 2.5,
                     jax.random.PRNGKey(1), sched)
        return out["loss_sds"]

    val, grad = jax.value_and_grad(loss)(rgb)
    assert np.isfinite(float(val))
    assert float(jnp.abs(grad).max()) > 0.0


def test_vsd_through_config_and_trainer():
    """End-to-end: config builds the VSD stack on a real (tiny) UNet and
    one trainer step updates the LoRA pytree."""
    from gsgen_tpu.config import load_config, build_trainer
    cfg = load_config("configs/smoke.yaml", [
        "guidance.type=vsd", "guidance.backbone=sd_unet",
        "guidance.backbone_preset=tiny", "guidance.lora_rank=4",
        "trainer.max_steps=3", "init.num_points=32", "init.capacity=64",
        'prompt.prompt="x"', "trainer.loss={vsd: 1.0, lora: 1.0}",
    ])
    tr = build_trainer(cfg)
    gp0 = jax.tree_util.tree_map(jnp.copy, tr.state.gp)
    m = tr.train_step(0)
    assert np.isfinite(float(m["loss_total"]))
    # some trainable guidance leaf moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), gp0, tr.state.gp)
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0
