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
