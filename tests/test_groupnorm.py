"""MXU GroupNorm vs flax nn.GroupNorm: values, grads, param-tree
compatibility.  The torch-oracle UNet/VAE tests (test_sd_unet,
test_unet_oracle, test_convert) gate the integrated stack; this pins
the norm op itself."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gsgen_tpu.guidance.norm import GroupNorm, group_norm_mxu


def _ref(x, gamma, beta, groups, eps):
    mod = nn.GroupNorm(num_groups=groups, epsilon=eps, use_scale=False,
                       use_bias=False)
    y = mod.apply({"params": {}}, x)
    shape = (1,) * (x.ndim - 1) + (x.shape[-1],)
    return y * gamma.reshape(shape) + beta.reshape(shape)


def test_matches_flax_f32():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 16, 16, 128)) * 3.0 + 1.5
    gamma = jax.random.normal(jax.random.PRNGKey(1), (128,)) * 0.5 + 1.0
    beta = jax.random.normal(jax.random.PRNGKey(2), (128,)) * 0.1
    want = _ref(x, gamma, beta, 32, 1e-6)
    got = group_norm_mxu(x, gamma, beta, 32, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_matches_flax_bf16():
    x = (jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 256)) * 2.0
         ).astype(jnp.bfloat16)
    gamma = jnp.ones((256,))
    beta = jnp.zeros((256,))
    want = _ref(x.astype(jnp.float32), gamma, beta, 32, 1e-6)
    got = group_norm_mxu(x, gamma, beta, 32, 1e-6).astype(jnp.float32)
    # bf16 squares bound the stats error (~0.4% on var -> ~0.2% on y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.02, atol=0.02)


def test_grads_match_flax():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 64))
    gamma = jnp.full((64,), 1.3)
    beta = jnp.full((64,), -0.2)
    cot = jax.random.normal(jax.random.PRNGKey(4), x.shape)

    def loss(fn, x, g, b):
        return jnp.sum(fn(x, g, b, 32, 1e-6) * cot)

    gw = jax.grad(lambda x, g, b: loss(_ref, x, g, b),
                  argnums=(0, 1, 2))(x, gamma, beta)
    gg = jax.grad(lambda x, g, b: loss(group_norm_mxu, x, g, b),
                  argnums=(0, 1, 2))(x, gamma, beta)
    for a, b_, name in zip(gw, gg, ("x", "gamma", "beta")):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_param_tree_matches_nn_groupnorm():
    x = jnp.ones((1, 4, 4, 32))
    mine = GroupNorm(num_groups=8, epsilon=1e-5)
    p = mine.init(jax.random.PRNGKey(0), x)
    assert set(p["params"]) == {"scale", "bias"}
    assert p["params"]["scale"].shape == (32,)
    ref = nn.GroupNorm(num_groups=8, epsilon=1e-5)
    pr = ref.init(jax.random.PRNGKey(0), x)
    got = mine.apply(pr, x)          # identical tree is interchangeable
    want = ref.apply(pr, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
