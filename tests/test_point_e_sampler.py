"""In-process Point-E sampler: shape/distribution smoke tests plus
numerical parity against the REFERENCE's own sampling stack
(point_e/diffusion/{gaussian_diffusion,k_diffusion}.py run as a torch
oracle on tiny random-weight models — churn off so the trajectory is
deterministic given a shared x_T)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsgen_tpu.guidance.convert import flax_to_torch_state
from gsgen_tpu.guidance.point_e import (PointEModel, PointEUpsamplerModel,
                                        TINY_POINT_E, TINY_UPSAMPLE)
from gsgen_tpu.priors.point_e_sampler import (NoiseSchedule, PointESampler,
                                              PointESamplerConfig, _unscale,
                                              karras_sigmas,
                                              make_stage_sampler)

REF = "/root/reference"


def _randomize_output_proj(m, seed=9):
    from flax.traverse_util import flatten_dict, unflatten_dict
    flat = dict(flatten_dict(m.params))
    k = jax.random.PRNGKey(seed)
    for path in list(flat):
        if "output_proj" in path:
            flat[path] = jax.random.normal(k, flat[path].shape) * 0.1
    m.params = unflatten_dict(flat)
    return m


@pytest.fixture(scope="module")
def base_model():
    return _randomize_output_proj(PointEModel(TINY_POINT_E,
                                              key=jax.random.PRNGKey(3)))


@pytest.fixture(scope="module")
def up_model():
    return _randomize_output_proj(
        PointEUpsamplerModel(TINY_UPSAMPLE, key=jax.random.PRNGKey(4)),
        seed=10)


def test_sigma_to_t_matches_reference():
    """np.interp table vs scipy interp1d + th.long truncation
    (k_diffusion.py:90-104)."""
    sys.path.insert(0, REF)
    try:
        from point_e.diffusion.configs import (DIFFUSION_CONFIGS,
                                               diffusion_from_config)
        diff = diffusion_from_config(DIFFUSION_CONFIGS["base40M-textvec"])
        from scipy import interpolate
        a2t = interpolate.interp1d(diff.alphas_cumprod,
                                   np.arange(0, diff.num_timesteps))

        def ref_sigma_to_t(sigma):
            acp = 1.0 / (sigma ** 2 + 1)
            if acp > diff.alphas_cumprod[0]:
                return 0
            if acp <= diff.alphas_cumprod[-1]:
                return diff.num_timesteps - 1
            return int(float(a2t(acp)))       # th.long truncation

        sched = NoiseSchedule.named("cosine", 1024)
        np.testing.assert_allclose(sched.alphas_cumprod,
                                   diff.alphas_cumprod, rtol=1e-12)
        sigmas = np.concatenate([
            karras_sigmas(64, 1e-3, 120.0)[:-1],
            karras_sigmas(64, 1e-3, 160.0)[:-1],
            [1e-4, 0.5, 1.0, 5.0, 200.0]])
        got = sched.sigma_to_t(sigmas)
        want = np.array([ref_sigma_to_t(s) for s in sigmas])
        np.testing.assert_array_equal(got, want)
    finally:
        sys.path.remove(REF)


def test_base_stage_matches_reference_karras_heun(base_model):
    """Full CFG'd Heun trajectory vs the reference's karras_sample with
    the SAME x_T (churn 0): validates schedule, sigma->t, x0 coeffs,
    clipping order, CFG mixing, Heun stepping, Euler epilogue."""
    import torch
    sys.path.insert(0, REF)
    try:
        from point_e.diffusion.configs import (DIFFUSION_CONFIGS,
                                               diffusion_from_config)
        from point_e.diffusion.k_diffusion import karras_sample
        from tests.test_point_e import _torch_oracle

        cfg = base_model.cfg
        diff = diffusion_from_config(DIFFUSION_CONFIGS["base40M-textvec"])
        state = flax_to_torch_state(base_model.params)

        def torch_model(x, t, clip_out=None):
            out = _torch_oracle(state, cfg, np.asarray(x),
                                np.asarray(t, np.float32),
                                np.asarray(clip_out))
            return torch.from_numpy(np.asarray(out))

        B, C, N = 2, cfg.input_channels, cfg.n_ctx
        steps, smax = 8, 120.0
        rng = np.random.default_rng(7)
        cond = rng.normal(size=(B, cfg.clip_feature_dim)).astype(np.float32)
        cond2 = np.concatenate([cond, np.zeros_like(cond)], axis=0)
        x_T = (rng.normal(size=(B, C, N)) * smax).astype(np.float32)

        # reference generates x_T internally from torch's global RNG —
        # reproduce by seeding and pre-drawing the same tensor
        torch.manual_seed(123)
        want_xT = torch.randn(B, C, N) * smax
        torch.manual_seed(123)
        want = karras_sample(
            diffusion=diff, model=torch_model, shape=(B, C, N),
            steps=steps, clip_denoised=True,
            model_kwargs={"clip_out": torch.from_numpy(cond2)},
            device=torch.device("cpu"), sigma_min=1e-3, sigma_max=smax,
            s_churn=0.0, guidance_scale=3.0).numpy()

        sample, smax_got = make_stage_sampler(
            lambda p, x, t, cond=None, low_res=None:
                base_model.apply(p, x, t, cond=cond),
            steps, 1e-3, smax, 0.0, 3.0, "cosine", 1024, C)
        assert smax_got == pytest.approx(smax)
        got = sample(base_model.params, jnp.asarray(want_xT.numpy()),
                     jnp.asarray(cond2), None, jax.random.PRNGKey(0))
        # reference unscales every yield (k_diffusion.py:187-188)
        got = np.asarray(_unscale(got))
        del x_T
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
    finally:
        sys.path.remove(REF)


def test_upsample_stage_matches_reference(up_model):
    """Unconditional (zero clip grid) upsample stage vs reference
    karras heun with a torch functional replica of the upsampler."""
    import torch
    import torch.nn.functional as F
    sys.path.insert(0, REF)
    try:
        from point_e.diffusion.configs import (DIFFUSION_CONFIGS,
                                               diffusion_from_config)
        from point_e.diffusion.k_diffusion import karras_sample

        cfg = up_model.cfg
        diff = diffusion_from_config(DIFFUSION_CONFIGS["upsample"])
        td = {k: torch.from_numpy(np.asarray(v))
              for k, v in flax_to_torch_state(up_model.params).items()}

        def lin(p, h):
            return h @ td[f"{p}.weight"].T + td[f"{p}.bias"]

        def ln(p, h):
            return F.layer_norm(h, (h.shape[-1],), td[f"{p}.weight"],
                                td[f"{p}.bias"])

        def torch_up(x, t, low_res=None):
            import math as _m
            half = cfg.width // 2
            freqs = torch.exp(-_m.log(10000.0) *
                              torch.arange(half, dtype=torch.float32) / half)
            args = t.float()[:, None] * freqs[None]
            t_emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
            t_emb = lin("time_embed.c_proj",
                        F.gelu(lin("time_embed.c_fc", t_emb),
                               approximate="tanh"))
            scales = torch.tensor(
                [2.0, 2.0, 2.0] + [0.007843137255] * 3)[: low_res.shape[1]]
            biases = torch.tensor([0.0, 0.0, 0.0, -1.0, -1.0,
                                   -1.0])[: low_res.shape[1]]
            lr = low_res * scales[None, :, None] + biases[None, :, None]
            lr_tok = lin("cond_point_proj", lr.permute(0, 2, 1))
            emb = torch.zeros(x.shape[0], cfg.grid_feature_dim,
                              cfg.grid_size ** 2)
            clip_tok = lin("clip_embed.1", ln("clip_embed.0",
                                              emb.permute(0, 2, 1)))
            h = lin("input_proj", x.permute(0, 2, 1))
            h = torch.cat([t_emb[:, None], clip_tok, lr_tok, h], dim=1)
            n_extra = 1 + clip_tok.shape[1] + lr_tok.shape[1]
            h = ln("ln_pre", h)
            for i in range(cfg.layers):
                p = f"backbone.resblocks.{i}"
                hh = ln(f"{p}.ln_1", h)
                B, L, W = hh.shape
                H = cfg.heads
                ch = W // H
                import math as _m2
                qkv = lin(f"{p}.attn.c_qkv", hh).view(B, L, H, 3 * ch)
                q, k, v = torch.split(qkv, ch, dim=-1)
                sc = 1.0 / _m2.sqrt(_m2.sqrt(ch))
                w = torch.softmax(torch.einsum("bthc,bshc->bhts", q * sc,
                                               k * sc).float(), dim=-1)
                att = torch.einsum("bhts,bshc->bthc", w, v).reshape(B, L, W)
                h = h + lin(f"{p}.attn.c_proj", att)
                h = h + lin(f"{p}.mlp.c_proj",
                            F.gelu(lin(f"{p}.mlp.c_fc", ln(f"{p}.ln_2", h)),
                                   approximate="tanh"))
            h = ln("ln_post", h)[:, n_extra:]
            return lin("output_proj", h).permute(0, 2, 1)

        B, C = 1, cfg.input_channels
        steps, smax = 6, 160.0
        rng = np.random.default_rng(11)
        low_res = rng.normal(size=(B, C, cfg.cond_ctx)).astype(np.float32)

        torch.manual_seed(77)
        want_xT = torch.randn(B, C, cfg.n_ctx) * smax
        torch.manual_seed(77)
        want = karras_sample(
            diffusion=diff, model=torch_up, shape=(B, C, cfg.n_ctx),
            steps=steps, clip_denoised=True,
            model_kwargs={"low_res": torch.from_numpy(low_res)},
            device=torch.device("cpu"), sigma_min=1e-3, sigma_max=smax,
            s_churn=0.0, guidance_scale=0.0).numpy()

        sample, _ = make_stage_sampler(
            lambda p, x, t, cond=None, low_res=None:
                up_model.apply(p, x, t, low_res=low_res),
            steps, 1e-3, smax, 0.0, 0.0, "linear", 1024, C)
        got = sample(up_model.params, jnp.asarray(want_xT.numpy()), None,
                     jnp.asarray(low_res), jax.random.PRNGKey(0))
        got = np.asarray(_unscale(got))
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=5e-3)
    finally:
        sys.path.remove(REF)


def test_two_stage_sampler_weight_free(base_model, up_model):
    """Shape/distribution smoke: tiny presets, random weights, churn on."""
    cfg = PointESamplerConfig(karras_steps=(6, 6))
    s = PointESampler(base_model, up_model, cfg)
    tv = jax.random.normal(jax.random.PRNGKey(1),
                           (TINY_POINT_E.clip_feature_dim,)) * 0.2
    xyz, rgb = s.sample_to_cloud(jax.random.PRNGKey(2), tv)
    n_total = TINY_POINT_E.n_ctx + TINY_UPSAMPLE.n_ctx
    assert xyz.shape == (n_total, 3) and rgb.shape == (n_total, 3)
    assert np.all(np.isfinite(xyz))
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    # model output clipped to [-1,1] then unscaled by 1/2 -> xyz bounded
    assert np.abs(xyz).max() <= 0.5 + 1e-5


def test_base_only_sampler(base_model):
    s = PointESampler(base_model, None, PointESamplerConfig(
        karras_steps=(4, 4)))
    out = s.sample(jax.random.PRNGKey(0), None, batch_size=2)
    assert out.shape == (2, 6, TINY_POINT_E.n_ctx)
    assert np.all(np.isfinite(np.asarray(out)))


def test_point_e_generate_in_process_and_cache(base_model, up_model,
                                               tmp_path, monkeypatch):
    """point_e_generate runs the sampler when weights are given (as
    state dicts here), caches the result, and reloads from cache."""
    import gsgen_tpu.priors as priors
    monkeypatch.setattr(priors, "ASSET_DIR", str(tmp_path))
    base_sd = flax_to_torch_state(base_model.params)
    up_sd = flax_to_torch_state(up_model.params)
    xyz, rgb = priors.point_e_generate(
        "a tiny corgi", num_points=64, base_weights=base_sd,
        upsample_weights=up_sd, karras_steps=(4, 4),
        base_cfg=TINY_POINT_E, up_cfg=TINY_UPSAMPLE)
    assert xyz.shape == (64, 3) and rgb.shape == (64, 3)
    # cache hit: second call must not need weights
    xyz2, rgb2 = priors.point_e_generate("a tiny corgi", num_points=64)
    np.testing.assert_array_equal(xyz, xyz2)
    np.testing.assert_array_equal(rgb, rgb2)


def test_point_e_init_arrays_normalization(base_model, tmp_path,
                                           monkeypatch):
    """Reference utils/initialize.py:110-167 semantics: pad to
    num_points, center, unit max-norm * mean_std, z squeeze."""
    import gsgen_tpu.priors as priors
    monkeypatch.setattr(priors, "ASSET_DIR", str(tmp_path))
    base_sd = flax_to_torch_state(base_model.params)
    xyz, rgb = priors.point_e_init_arrays(
        "a corgi", num_points=96, mean_std=0.5, z_scale=0.9,
        base_weights=base_sd, karras_steps=(4, 4), base_cfg=TINY_POINT_E)
    assert xyz.shape == (96, 3) and rgb.shape == (96, 3)
    # centered before z_scale; max-norm ~ mean_std (pre-z-squeeze)
    un_z = xyz.copy()
    un_z[:, 2] /= 0.9
    assert np.abs(un_z.mean(axis=0)).max() < 1e-5
    assert np.linalg.norm(un_z, axis=-1).max() == pytest.approx(
        0.5, rel=1e-3)


def test_init_point_e_through_config(base_model, tmp_path, monkeypatch):
    """init.type=point_e builds a trainer whose scene starts at the
    generated cloud (facex-rotated)."""
    import gsgen_tpu.priors as priors
    monkeypatch.setattr(priors, "ASSET_DIR", str(tmp_path))
    # pre-seed the asset cache so build_trainer needs no checkpoints
    rng = np.random.default_rng(5)
    xyz = rng.normal(size=(4096, 3)).astype(np.float32)
    rgb = rng.random((4096, 3), dtype=np.float32)
    np.savez(priors._asset_path("point_e", "a corgi"),
             xyz=xyz, rgb=rgb)

    from gsgen_tpu.config import load_config, build_trainer
    cfg = load_config("configs/smoke.yaml", [
        "prompt.prompt=a corgi",
        "trainer.max_steps=1", "init.type=point_e", "init.num_points=128",
        "init.capacity=256", "init.mean_std=0.4", "init.facex=true",
    ])
    tr = build_trainer(cfg)
    mean = np.asarray(tr.state.scene.params.mean[:128])
    # normalized: centered (on the 128-subset of the normalized 4096
    # cloud this is approximate) and bounded by mean_std
    assert np.linalg.norm(mean, axis=-1).max() <= 0.4 + 1e-5
    # facex applied: (x,y,z) -> (-y,x,z) of the normalized cloud
    # (normalization runs on the num_points-truncated set)
    full = xyz[:128]
    full = full - full.mean(0, keepdims=True)
    full = full / (np.linalg.norm(full, axis=-1).max() + 1e-5) * 0.4
    want = np.stack([-full[:, 1], full[:, 0], full[:, 2]], 1)
    np.testing.assert_allclose(mean, want, atol=1e-5)
    m = tr.train_step(0)
    assert np.isfinite(float(m["loss_total"]))


def test_upsampler_checkpoint_roundtrip(up_model):
    """Serialize the upsample transformer to the torch layout (with the
    frozen-CLIP + channel-scale buffer keys real checkpoints carry),
    reload -> bit-exact."""
    state = flax_to_torch_state(up_model.params)
    state["clip.model.visual.proj"] = np.zeros((4, 4), np.float32)
    state["channel_scales"] = np.ones((6,), np.float32)
    state["channel_biases"] = np.zeros((6,), np.float32)
    m2 = PointEUpsamplerModel(up_model.cfg, key=jax.random.PRNGKey(42))
    m2.load_weights(state)
    for a, b in zip(jax.tree_util.tree_leaves(up_model.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
