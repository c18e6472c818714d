"""SD UNet backbone: shapes, gradient flow, SDS integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsgen_tpu.guidance.sd_unet import (SDUNetBackbone, TINY, UNetConfig,
                                        timestep_embedding)
from gsgen_tpu.guidance.sds import SDSConfig, SDSGuidance
from gsgen_tpu.prompt.processors import PromptProcessor, PromptProcessorConfig


def test_timestep_embedding():
    e = timestep_embedding(jnp.array([0, 500, 999]), 64)
    assert e.shape == (3, 64)
    assert not np.allclose(np.asarray(e[0]), np.asarray(e[1]))


@pytest.fixture(scope="module")
def backbone():
    return SDUNetBackbone(TINY, latent_size=8, use_vae=True)


def test_unet_shapes(backbone):
    bb = backbone
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.array([10, 500])
    ctx = jnp.zeros((2, 7, 1024))
    eps = bb.predict_noise(bb.params, x, t, ctx)
    assert eps.shape == (2, 8, 8, 4)
    assert bool(jnp.isfinite(eps).all())


def test_vae_encode_shapes(backbone):
    bb = backbone
    imgs = jnp.ones((2, bb.image_size, bb.image_size, 3)) * 0.5
    lat = bb.encode_images(bb.params, imgs)
    assert lat.shape == (2, 8, 8, 4)


def test_text_conditioning_changes_output(backbone):
    bb = backbone
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    t = jnp.array([100])
    c1 = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 1024))
    c2 = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 1024))
    e1 = bb.predict_noise(bb.params, x, t, c1)
    e2 = bb.predict_noise(bb.params, x, t, c2)
    assert float(jnp.abs(e1 - e2).max()) > 1e-6


def test_sds_with_sd_unet_backbone(backbone):
    g = SDSGuidance(SDSConfig(guidance_scale=7.5), backbone)
    emb = PromptProcessor(PromptProcessorConfig(use_cache=False))()
    rgb = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3))
    sched = {"min_t": jnp.int32(20), "max_t": jnp.int32(980)}

    def loss(rgb):
        return g.loss(g.params, rgb, emb, jnp.zeros(1), jnp.zeros(1),
                      jnp.ones(1), jax.random.PRNGKey(4), sched)["loss_sds"]

    val, grad = jax.value_and_grad(loss)(rgb)
    assert np.isfinite(float(val))
    assert bool(jnp.isfinite(grad).all())
    assert float(jnp.abs(grad).max()) > 0.0


def test_weights_loader_raises_clearly():
    from gsgen_tpu.guidance.sd_unet import load_diffusers_weights
    with pytest.raises(FileNotFoundError, match="no network egress"):
        load_diffusers_weights("/nonexistent/unet")


def test_bf16_compute_dtype_matches_fp32(backbone):
    """compute_dtype='bfloat16' runs the frozen score eval in reduced
    precision (the reference pipeline is fp16, stable_diffusion.py:76)
    with fp32 parameter masters; outputs stay fp32 and track the fp32
    path closely.  Guards the dtype plumbing: one stray fp32 input
    (e.g. the sinusoidal timestep embedding) silently upcasts the whole
    trunk and the speedup disappears."""
    from gsgen_tpu.guidance.sd_unet import SDUNetBackbone, TINY
    bb16 = SDUNetBackbone(TINY, latent_size=8, use_vae=True,
                          compute_dtype="bfloat16")
    bb16.params = backbone.params

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4)) * 0.5
    t = jnp.array([100.0, 700.0])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 1024)) * 0.1
    e32 = backbone.predict_noise(backbone.params, x, t, ctx)
    e16 = bb16.predict_noise(backbone.params, x, t, ctx)
    assert e16.dtype == jnp.float32
    rel = float(jnp.linalg.norm(e16 - e32) / jnp.linalg.norm(e32))
    assert rel < 0.05, rel

    imgs = jax.random.uniform(jax.random.PRNGKey(2),
                              (1, backbone.image_size, backbone.image_size,
                               3))
    z32 = backbone.encode_images(backbone.params, imgs)
    z16 = bb16.encode_images(backbone.params, imgs)
    assert z16.dtype == jnp.float32
    relz = float(jnp.linalg.norm(z16 - z32) / jnp.linalg.norm(z32))
    assert relz < 0.05, relz

    # gradients flow through the bf16 VAE encode (SDS backprops the
    # image path)
    g = jax.grad(lambda im: jnp.sum(
        bb16.encode_images(backbone.params, im) ** 2))(imgs)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0.0
