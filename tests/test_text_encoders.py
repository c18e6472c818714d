"""Flax CLIP / T5 text encoders vs torch transformers oracles.

transformers (torch, CPU) is available in the image; instantiating
tiny RANDOM models gives a true architecture oracle without any
network access: load the random torch state_dict through the rename
table and require output parity on the same token ids.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

from gsgen_tpu.prompt.clip import (CLIPTextConfig, TINY_TEXT,
                                   load_clip_text)
from gsgen_tpu.prompt.t5 import T5Config, TINY_T5, load_t5_encoder


def test_clip_matches_transformers_oracle():
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, hidden_act="gelu")
    torch.manual_seed(0)
    model = transformers.CLIPTextModel(hf_cfg).eval()
    ids = torch.randint(0, 128, (2, 12))
    with torch.no_grad():
        want = model(ids).last_hidden_state.numpy()

    module, params = load_clip_text(
        {k: v.numpy() for k, v in model.state_dict().items()}, TINY_TEXT)
    got = np.asarray(module.apply(params, jnp.asarray(ids.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_clip_quick_gelu_matches_oracle():
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, hidden_act="quick_gelu")
    torch.manual_seed(1)
    model = transformers.CLIPTextModel(hf_cfg).eval()
    ids = torch.randint(0, 128, (1, 16))
    with torch.no_grad():
        want = model(ids).last_hidden_state.numpy()
    import dataclasses
    cfg = dataclasses.replace(TINY_TEXT, hidden_act="quick_gelu")
    module, params = load_clip_text(
        {k: v.numpy() for k, v in model.state_dict().items()}, cfg)
    got = np.asarray(module.apply(params, jnp.asarray(ids.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_t5_matches_transformers_oracle():
    hf_cfg = transformers.T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False,
        use_cache=False, tie_word_embeddings=False)
    torch.manual_seed(2)
    model = transformers.T5EncoderModel(hf_cfg).eval()
    ids = torch.randint(0, 128, (2, 9))
    mask = torch.ones_like(ids)
    mask[1, 6:] = 0
    with torch.no_grad():
        want = model(ids, attention_mask=mask).last_hidden_state.numpy()

    module, params = load_t5_encoder(
        {k: v.numpy() for k, v in model.state_dict().items()}, TINY_T5)
    got = np.asarray(module.apply(
        params, jnp.asarray(ids.numpy()),
        attention_mask=jnp.asarray(mask.numpy()).astype(bool)))
    # masked positions differ (torch zeroes nothing either; compare
    # only valid positions)
    np.testing.assert_allclose(got[0], want[0], rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(got[1, :6], want[1, :6], rtol=3e-4,
                               atol=3e-5)


def test_clip_vision_matches_transformers_oracle():
    from gsgen_tpu.prompt.clip_vision import TINY_VISION, load_clip_vision
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        projection_dim=16, hidden_act="quick_gelu")
    torch.manual_seed(3)
    model = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    px = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        want = model(px).image_embeds.numpy()

    module, params = load_clip_vision(
        {k: v.numpy() for k, v in model.state_dict().items()},
        TINY_VISION, projection_dim=16)
    got = np.asarray(module.apply(
        params, jnp.asarray(px.numpy()).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_clip_image_encoder_in_make_it_3d():
    """The real vision tower plugs into MakeIt3D's clip_ref_loss and
    yields finite grads w.r.t. the rendered image."""
    from gsgen_tpu.prompt.clip_vision import (CLIPImageEncoder,
                                              CLIPVisionModelWithProjection,
                                              TINY_VISION)
    module = CLIPVisionModelWithProjection(TINY_VISION, 16)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)))
    enc = CLIPImageEncoder(module, params)
    ref = jax.random.uniform(jax.random.PRNGKey(1), (24, 24, 3))

    from gsgen_tpu.guidance.make_it_3d import (MakeIt3DConfig,
                                               MakeIt3DGuidance)
    text_embed = enc.encode(params, ref[None])[0]  # any unit vector
    g = MakeIt3DGuidance(MakeIt3DConfig(), backbone=None,
                         image_encoder=enc, ref_image=ref,
                         ref_text_embed=text_embed)
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (2, 24, 24, 3))
    is_orig = jnp.array([1.0, 0.0])

    loss, grad = jax.value_and_grad(
        lambda x: g.clip_ref_loss(x, is_orig))(rgb)
    assert np.isfinite(float(loss))
    # the original view is masked out of the loss
    assert float(jnp.abs(grad[0]).max()) == 0.0
    assert float(jnp.abs(grad[1]).max()) > 0.0


def test_t5_relative_bias_long_range():
    """Bias bucketing beyond max_distance saturates, not crashes."""
    from gsgen_tpu.prompt.t5 import relative_position_bucket
    rel = jnp.arange(-300, 301)
    b = relative_position_bucket(rel)
    assert int(b.min()) >= 0 and int(b.max()) < 32
