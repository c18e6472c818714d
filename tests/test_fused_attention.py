"""Fused (Pallas flash) attention path of the diffusers UNet.

The attention core is switchable (`set_fused_attention`): "off" is the
einsum + f32-softmax oracle (the path every torch-parity test runs
against), "auto" uses the fused TPU kernel for blockable self-attention
lengths.  These tests pin (a) the switch semantics on CPU and (b) the
fwd+grad parity of the two cores on the real chip (GSGEN_TEST_TPU=1).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsgen_tpu.guidance import unet2d

ON_TPU = bool(os.environ.get("GSGEN_TEST_TPU"))


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    unet2d.set_fused_attention("auto")


def _attn_and_params(L=256, dim=128, heads=2, dtype=jnp.float32):
    attn = unet2d.Attention(heads=heads, head_dim=dim // heads, out_dim=dim)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, L, dim), dtype)
    params = attn.init(key, x)
    return attn, params, x


def test_mode_validation():
    with pytest.raises(ValueError):
        unet2d.set_fused_attention("fast")


@pytest.mark.skipif(ON_TPU, reason="auto engages the fused path on TPU")
def test_auto_is_einsum_on_cpu():
    # auto requires the TPU backend; on the CPU test mesh both modes
    # must take the identical einsum path
    attn, params, x = _attn_and_params()
    unet2d.set_fused_attention("off")
    ref = attn.apply(params, x)
    unet2d.set_fused_attention("auto")
    out = attn.apply(params, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_cross_attention_never_fused():
    # S=77 (prompt tokens) is not blockable; the einsum path must run
    # regardless of mode — "on" would crash here if the gate were wrong
    attn, params, x = _attn_and_params()
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 128))
    unet2d.set_fused_attention("on")
    out = attn.apply(params, x, ctx)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


@pytest.mark.skipif(not ON_TPU, reason="needs the real chip")
def test_flash_matches_einsum_on_tpu():
    attn, params, x = _attn_and_params(L=1024, dim=320, heads=5,
                                       dtype=jnp.bfloat16)

    def run(mode):
        unet2d.set_fused_attention(mode)

        def loss(p):
            return jnp.sum(attn.apply(p, x).astype(jnp.float32) ** 2)

        val, grads = jax.value_and_grad(loss)(params)
        return val, grads

    v_ref, g_ref = run("off")
    v_fl, g_fl = run("on")
    assert abs(float(v_ref) - float(v_fl)) / abs(float(v_ref)) < 5e-3
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fl)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = np.abs(a).max() + 1e-9
        assert np.abs(a - b).max() / scale < 5e-3
