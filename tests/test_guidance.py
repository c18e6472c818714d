"""Prompt processing, SDS guidance, config system, priors IO."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsgen_tpu.guidance.diffusion import (MockUNet, scaled_linear_schedule)
from gsgen_tpu.guidance.sds import (SDSConfig, SDSGuidance,
                                    perpendicular_component)
from gsgen_tpu.prompt.processors import (PromptEmbedding, PromptProcessor,
                                         PromptProcessorConfig, direction_idx,
                                         mock_encode, shift_azimuth_deg)


def test_direction_classification():
    ele = jnp.array([0.0, 0.0, 0.0, 80.0, 10.0])
    azi = jnp.array([0.0, 120.0, 179.0, 10.0, -170.0])
    idx = direction_idx(ele, azi)
    assert list(np.asarray(idx)) == [1, 0, 2, 3, 2]


def test_shift_azimuth():
    np.testing.assert_allclose(
        np.asarray(shift_azimuth_deg(jnp.array([0.0, 190.0, -190.0, 360.0]))),
        [0.0, -170.0, 170.0, 0.0])


def test_prompt_processor_cache(tmp_path):
    cfg = PromptProcessorConfig(prompt="a corgi", use_cache=True,
                                cache_dir=str(tmp_path))
    e1 = PromptProcessor(cfg)().text
    # 10 texts, but the empty negative prompt dedups to one key
    assert len(list(tmp_path.glob("*.npy"))) == 6
    e2 = PromptProcessor(cfg)().text          # from cache
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    # distinct prompts differ
    e3 = PromptProcessor(PromptProcessorConfig(
        prompt="a cat", use_cache=False))().text
    assert float(jnp.abs(e1 - e3).max()) > 0.1


def test_view_dependent_selection():
    pp = PromptProcessor(PromptProcessorConfig(use_cache=False))
    emb = pp()
    ele = jnp.zeros(2)
    azi = jnp.array([0.0, 179.0])            # front, back
    e = emb.get_text_embedding(ele, azi, jnp.ones(2))
    assert e.shape[0] == 4                   # [cond(2), uncond(2)]
    np.testing.assert_array_equal(np.asarray(e[0]),
                                  np.asarray(emb.text_vd[1]))
    np.testing.assert_array_equal(np.asarray(e[1]),
                                  np.asarray(emb.text_vd[2]))


def test_perp_neg_weights_continuity():
    pp = PromptProcessor(PromptProcessorConfig(use_cache=False))
    emb = pp()
    # crossing the 90-degree boundary: weights finite, embeddings blend
    azis = jnp.array([0.0, 45.0, 89.9, 90.1, 135.0, 179.0])
    e, w = emb.get_text_embeddings_perp_neg(jnp.zeros(6), azis, jnp.ones(6))
    assert e.shape[0] == 24                  # 4B
    assert bool(jnp.isfinite(w).all())
    # at azi=0 the positive embedding is the pure front embedding
    np.testing.assert_allclose(np.asarray(e[0]), np.asarray(emb.text_vd[1]),
                               rtol=1e-5)


def test_perpendicular_component():
    x = jnp.ones((1, 2, 2, 2))
    y = jnp.ones((1, 2, 2, 2))
    np.testing.assert_allclose(np.asarray(perpendicular_component(x, y)), 0.0,
                               atol=1e-6)
    y2 = jnp.concatenate([jnp.ones((1, 1, 2, 2)), -jnp.ones((1, 1, 2, 2))], 1)
    out = perpendicular_component(x, y2)      # orthogonal already
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_noise_schedule():
    s = scaled_linear_schedule()
    assert s.alphas_cumprod.shape == (1000,)
    assert float(s.alphas_cumprod[0]) > 0.99
    assert float(s.alphas_cumprod[-1]) < 0.01
    x0 = jnp.ones((2, 4, 4, 4))
    noise = jnp.zeros_like(x0)
    xt = s.add_noise(x0, noise, jnp.array([0, 999]))
    assert float(xt[0].mean()) > 0.99 and float(xt[1].mean()) < 0.1


@pytest.mark.parametrize("perp", [False, True])
def test_sds_loss_gradients(perp):
    g = SDSGuidance(SDSConfig(use_perp_negative=perp, guidance_scale=7.5),
                    MockUNet(latent_size=8))
    pp = PromptProcessor(PromptProcessorConfig(use_cache=False))
    emb = pp()
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    sched = {"min_t": jnp.int32(20), "max_t": jnp.int32(980)}

    def loss(rgb):
        out = g.loss(g.params, rgb, emb, jnp.zeros(2), jnp.array([0.0, 120.0]),
                     jnp.ones(2) * 2.5, jax.random.PRNGKey(1), sched)
        return out["loss_sds"]

    val, grad = jax.value_and_grad(loss)(rgb)
    assert np.isfinite(float(val))
    assert bool(jnp.isfinite(grad).all())
    assert float(jnp.abs(grad).max()) > 0.0   # gradients reach pixels


def test_config_system(tmp_path):
    from gsgen_tpu.config import load_config, build_trainer
    import shutil
    cfg = load_config("configs/smoke.yaml",
                      ["trainer.max_steps=5", "init.num_points=32",
                       "init.capacity=64", 'prompt.prompt="x"'])
    assert cfg["trainer"]["max_steps"] == 5
    tr = build_trainer(cfg)
    m = tr.train_step(0)
    assert np.isfinite(float(m["loss_total"]))


def test_priors_point_cloud_roundtrip(tmp_path):
    from gsgen_tpu.priors import load_point_cloud
    xyz = np.random.rand(100, 3).astype(np.float32)
    rgb = np.random.rand(100, 3).astype(np.float32)
    np.save(tmp_path / "pc.npy", np.concatenate([xyz, rgb], 1))
    x2, c2 = load_point_cloud(tmp_path / "pc.npy")
    np.testing.assert_allclose(x2, xyz)
    np.testing.assert_allclose(c2, rgb)
    np.savez(tmp_path / "pc.npz", xyz=xyz, rgb=rgb)
    x3, c3 = load_point_cloud(tmp_path / "pc.npz")
    np.testing.assert_allclose(x3, xyz)


def test_ply_roundtrip(tmp_path):
    # export a scene to ply, read it back with the priors loader
    from gsgen_tpu.io.export import to_ply
    from gsgen_tpu.models.init import InitConfig, initialize
    from gsgen_tpu.models.scene import RenderConfig
    from gsgen_tpu.priors import load_point_cloud
    rcfg = RenderConfig(dup_cap=1024, chunk=64)
    st = initialize(jax.random.PRNGKey(0), InitConfig(num_points=32), rcfg)
    p = to_ply(st.params, st.active, tmp_path / "s.ply")
    xyz, _ = load_point_cloud(p)
    np.testing.assert_allclose(xyz, np.asarray(st.params.mean[:32]),
                               rtol=1e-5)
