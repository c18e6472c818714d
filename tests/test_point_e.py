"""Flax point-e transformer: torch-oracle parity, checkpoint loading,
aux-guidance integration (reference point_e/models/transformer.py,
guidance/point_e.py)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsgen_tpu.guidance.convert import flax_to_torch_state
from gsgen_tpu.guidance.point_e import (PointEConfig, PointEModel,
                                        TINY_POINT_E,
                                        point_e_timestep_embedding)


def _torch_oracle(state, cfg, x, t, clip_out):
    """Minimal torch replica of the published point-e transformer
    (pre-LN blocks, fused qkv with double-sqrt scaling, cond tokens)."""
    import torch
    import torch.nn as nn

    td = {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}

    def lin(prefix, h):
        return h @ td[f"{prefix}.weight"].T + td[f"{prefix}.bias"]

    def ln(prefix, h):
        return nn.functional.layer_norm(
            h, (h.shape[-1],), td[f"{prefix}.weight"], td[f"{prefix}.bias"])

    def mlp(prefix, h):
        h = lin(f"{prefix}.c_fc", h)
        h = nn.functional.gelu(h, approximate="tanh")
        return lin(f"{prefix}.c_proj", h)

    def attn(prefix, h):
        B, L, W = h.shape
        H = cfg.heads
        ch = W // H
        qkv = lin(f"{prefix}.c_qkv", h).view(B, L, H, 3 * ch)
        q, k, v = torch.split(qkv, ch, dim=-1)
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        w = torch.einsum("bthc,bshc->bhts", q * scale, k * scale)
        w = torch.softmax(w.float(), dim=-1)
        out = torch.einsum("bhts,bshc->bthc", w, v).reshape(B, L, W)
        return lin(f"{prefix}.c_proj", out)

    x = torch.from_numpy(np.asarray(x))
    t = torch.from_numpy(np.asarray(t, np.float32))
    clip_out = torch.from_numpy(np.asarray(clip_out))

    half = cfg.width // 2
    freqs = torch.exp(-math.log(10000.0)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None] * freqs[None]
    t_emb = mlp("time_embed", torch.cat([torch.cos(args), torch.sin(args)],
                                        dim=-1))
    clip_emb = (math.sqrt(clip_out.shape[-1]) * clip_out) \
        @ td["clip_embed.weight"].T + td["clip_embed.bias"]

    h = lin("input_proj", x.permute(0, 2, 1))
    h = torch.cat([clip_emb[:, None], t_emb[:, None], h], dim=1)
    h = ln("ln_pre", h)
    for i in range(cfg.layers):
        p = f"backbone.resblocks.{i}"
        h = h + attn(f"{p}.attn", ln(f"{p}.ln_1", h))
        h = h + mlp(f"{p}.mlp", ln(f"{p}.ln_2", h))
    h = ln("ln_post", h)[:, 2:]
    h = lin("output_proj", h)
    return h.permute(0, 2, 1).numpy()


@pytest.fixture(scope="module")
def model():
    m = PointEModel(TINY_POINT_E, key=jax.random.PRNGKey(3))
    # output_proj is zero-init (faithful) — randomize it so the oracle
    # comparison exercises the full path
    from flax.traverse_util import flatten_dict, unflatten_dict
    flat = dict(flatten_dict(m.params))
    k = jax.random.PRNGKey(9)
    for path in list(flat):
        if "output_proj" in path:
            flat[path] = jax.random.normal(k, flat[path].shape) * 0.1
    m.params = unflatten_dict(flat)
    return m


def test_torch_oracle_parity(model):
    cfg = model.cfg
    x = np.random.default_rng(0).normal(
        size=(2, cfg.input_channels, cfg.n_ctx)).astype(np.float32)
    t = np.array([17, 900], np.float32)
    clip = np.random.default_rng(1).normal(
        size=(2, cfg.clip_feature_dim)).astype(np.float32) * 0.2
    got = np.asarray(model.module.apply(model.params, jnp.asarray(x),
                                        jnp.asarray(t), jnp.asarray(clip)))
    state = flax_to_torch_state(model.params)
    want = _torch_oracle(state, cfg, x, t, clip)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_checkpoint_roundtrip(model):
    """Serialize to the torch layout, reload (with frozen-CLIP keys
    present, as real point-e checkpoints have) -> bit-exact."""
    state = flax_to_torch_state(model.params)
    state["clip.model.token_embedding.weight"] = np.zeros((4, 4), np.float32)
    m2 = PointEModel(model.cfg, key=jax.random.PRNGKey(11))
    m2.load_weights(state)
    a = jax.tree_util.tree_leaves(model.params)
    b = jax.tree_util.tree_leaves(m2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_zero_init_output():
    m = PointEModel(TINY_POINT_E)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (1, 6, TINY_POINT_E.n_ctx))
    out = m.module.apply(m.params, x, jnp.zeros((1,)), None)
    assert out.shape == (1, 12, TINY_POINT_E.n_ctx)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_cosine_schedule():
    from gsgen_tpu.guidance.diffusion import cosine_schedule
    s = cosine_schedule(1024)
    ac = np.asarray(s.alphas_cumprod)
    assert ac.shape == (1024,)
    assert ac[0] > 0.99 and ac[-1] < 1e-3
    assert np.all(np.diff(ac) < 0)          # strictly decreasing
    assert np.asarray(s.betas).max() <= 0.999 + 1e-6


def test_aux_guidance_with_real_point_e():
    """SDS on the cloud through the real (tiny) transformer: finite,
    drives only active means."""
    from gsgen_tpu.guidance.point_e_aux import (PointEAuxConfig,
                                                PointEAuxGuidance)
    cfg = PointEAuxConfig(num_points=32, batch_size=2, base_name="tiny",
                          guidance_scale=3.0)
    cond = jax.random.normal(jax.random.PRNGKey(5), (16,)) * 0.2
    g = PointEAuxGuidance(cfg, cond_vec=cond)
    # randomize output_proj so eps != 0
    from flax.traverse_util import flatten_dict, unflatten_dict
    flat = dict(flatten_dict(g.params))
    for path in list(flat):
        if "output_proj" in path:
            flat[path] = jax.random.normal(jax.random.PRNGKey(6),
                                           flat[path].shape) * 0.1
    g.params = unflatten_dict(flat)

    M = 64
    mean = jax.random.normal(jax.random.PRNGKey(0), (M, 3)) * 0.3
    color = jax.random.uniform(jax.random.PRNGKey(1), (M, 3))
    active = jnp.arange(M) < 48

    def loss(mean):
        return g.loss(g.params, mean, color, active, None,
                      jax.random.PRNGKey(2))["loss_aux"]

    v, grad = jax.value_and_grad(loss)(mean)
    assert np.isfinite(float(v))
    assert bool(jnp.isfinite(grad).all())
    assert float(jnp.abs(grad).max()) > 0.0


def test_aux_guidance_through_config():
    from gsgen_tpu.config import load_config, build_trainer
    cfg = load_config("configs/smoke.yaml", [
        "trainer.max_steps=2", "init.num_points=32", "init.capacity=64",
        "auxiliary={enabled: true, base_name: mock, num_points: 16, "
        "batch_size: 2}",
        "trainer.loss={sds: 1.0, aux_guidance: 0.01}",
    ])
    tr = build_trainer(cfg)
    assert tr.aux_guidance is not None
    m = tr.train_step(0)
    assert np.isfinite(float(m["loss_total"]))
    assert "loss_aux" in m
