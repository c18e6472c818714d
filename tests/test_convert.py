"""Weight-conversion acceptance gates (VERDICT round-1 item 1).

1. Mechanical round-trip: serialize the flax tree into the diffusers
   safetensors layout, reload through the rename table, bit-exact.
2. Golden eps: fixed latent + seeded tiny preset -> deterministic
   UNet output (catches silent architecture drift).
3. Torch oracles: flax CLIP / T5 reproduce randomly-initialized
   transformers models' outputs on the same token ids.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsgen_tpu.guidance.convert import (flax_to_torch_state,
                                        load_safetensors,
                                        save_safetensors,
                                        torch_state_to_flax)
from gsgen_tpu.guidance.sd_unet import (SDUNetBackbone, TINY, TINY_VSD,
                                        load_diffusers_weights)


def tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


@pytest.fixture(scope="module")
def backbone():
    return SDUNetBackbone(TINY, latent_size=8, use_vae=True,
                          key=jax.random.PRNGKey(7))


def test_unet_roundtrip_bit_exact(backbone, tmp_path):
    state = flax_to_torch_state(backbone.params["unet"])
    f = tmp_path / "unet" / "diffusion_pytorch_model.safetensors"
    save_safetensors(state, str(f))
    reloaded = torch_state_to_flax(load_safetensors(str(f.parent)),
                                   backbone.params["unet"])
    assert tree_equal(reloaded, backbone.params["unet"])


def test_vae_roundtrip_bit_exact(backbone, tmp_path):
    state = flax_to_torch_state(backbone.params["vae"])
    f = tmp_path / "vae" / "diffusion_pytorch_model.safetensors"
    save_safetensors(state, str(f))
    reloaded = torch_state_to_flax(load_safetensors(str(f.parent)),
                                   backbone.params["vae"])
    assert tree_equal(reloaded, backbone.params["vae"])


def test_load_diffusers_weights_end_to_end(backbone, tmp_path):
    """Full loader path: a diffusers model dir with unet/ + vae/."""
    save_safetensors(flax_to_torch_state(backbone.params["unet"]),
                     str(tmp_path / "unet" / "model.safetensors"))
    save_safetensors(flax_to_torch_state(backbone.params["vae"]),
                     str(tmp_path / "vae" / "model.safetensors"))
    bb = load_diffusers_weights(str(tmp_path), TINY, latent_size=8)
    assert tree_equal(bb.params["unet"], backbone.params["unet"])
    assert tree_equal(bb.params["vae"], backbone.params["vae"])


def test_lora_params_survive_loading(backbone, tmp_path):
    """Pretrained checkpoints never contain LoRA / class-embedding
    params; the loader must keep their fresh init and fill the rest."""
    save_safetensors(flax_to_torch_state(backbone.params["unet"]),
                     str(tmp_path / "unet" / "model.safetensors"))
    bb = load_diffusers_weights(str(tmp_path), TINY_VSD, latent_size=8,
                                use_vae=False)
    flat = jax.tree_util.tree_flatten_with_path(bb.params["unet"])[0]
    lora = [p for p, _ in flat
            if any("lora" in getattr(k, "key", "") for k in p)]
    cls = [p for p, _ in flat
           if any("class_embedding" in getattr(k, "key", "") for k in p)]
    assert lora and cls
    # base weights loaded exactly
    base_src = flax_to_torch_state(backbone.params["unet"])
    base_dst = flax_to_torch_state(bb.params["unet"])
    for k, v in base_src.items():
        assert np.array_equal(base_dst[k], v), k


def test_strict_mode_catches_mismatch(backbone, tmp_path):
    state = flax_to_torch_state(backbone.params["unet"])
    state.pop(sorted(state)[0])
    state["bogus.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(KeyError, match="mismatch"):
        torch_state_to_flax(state, backbone.params["unet"])


def test_golden_eps_tiny_preset(backbone):
    """Deterministic eps on a fixed latent: locks the architecture.

    The golden values were produced by this implementation at the time
    the diffusers param-count identity was established (SD2.1 UNet
    865,910,724 params, exact) — any drift in block wiring, GEGLU,
    head split, or time embedding changes them."""
    x = jnp.asarray(np.linspace(-1, 1, 1 * 8 * 8 * 4, dtype=np.float32)
                    .reshape(1, 8, 8, 4))
    t = jnp.array([321])
    ctx = jnp.asarray(np.linspace(-0.5, 0.5, 7 * 1024, dtype=np.float32)
                      .reshape(1, 7, 1024))
    eps = backbone.predict_noise(backbone.params, x, t, ctx)
    assert eps.shape == (1, 8, 8, 4)
    assert bool(jnp.isfinite(eps).all())
    got = np.asarray(eps[0, ::4, ::4, 0]).ravel()
    golden = np.load(os.path.join(os.path.dirname(__file__),
                                  "golden_eps_tiny.npy"))
    np.testing.assert_allclose(got, golden, rtol=2e-4, atol=2e-5)
