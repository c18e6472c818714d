"""Shap-E decode-from-latent: parity against the REFERENCE's vendored
shap-e modules (params_proj + NeRSTF meta-MLP run as torch oracles on
tiny random weights), plus end-to-end mesh decode and the text300M
latent sampler."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsgen_tpu.priors.shap_e import (ShapEDecoder, posenc_nerf,
                                     sample_shap_e_latent,
                                     text300m_config_from_state)

REF = "/root/reference"
D_LATENT = 16


def _make_oracle(posenc_version="nerf", use_ln=True, d_hidden=32,
                 n_layers=3):
    """Reference MLPNeRSTFModel (all-meta) + ChannelsParamsProj, and the
    equivalent 'vector_decoder'-layout state dict."""
    import torch
    sys.path.insert(0, REF)
    from shap_e.models.nerstf.mlp import MLPNeRSTFModel
    from shap_e.models.transmitter.params_proj import ChannelsParamsProj
    torch.manual_seed(0)
    model = MLPNeRSTFModel(device=torch.device("cpu"), d_hidden=d_hidden,
                           n_hidden_layers=n_layers,
                           meta_parameters=True,
                           posenc_version=posenc_version,
                           insert_direction_at=None)
    shapes = {f"nerstf.{k}": tuple(v.shape)
              for k, v in model.state_dict().items()}
    proj = ChannelsParamsProj(device=torch.device("cpu"),
                              param_shapes=shapes, d_latent=D_LATENT,
                              use_ln=use_ln)
    # randomize the zero-init proj weights so the test has signal
    for p in proj.parameters():
        p.data = torch.randn_like(p.data) * 0.05
    state = {}
    for k, v in proj.state_dict().items():
        state[f"params_proj.{k}"] = v.numpy()
    latent_ctx = proj.flat_shapes  # noqa: F841 (oracle introspection)
    return model, proj, state


def test_params_proj_and_query_match_reference():
    import torch
    sys.path.insert(0, REF)
    from shap_e.models.query import Query
    from shap_e.util.collections import AttrDict

    model, proj, state = _make_oracle()
    dec = ShapEDecoder.from_state_dict(state)
    assert dec.d_latent == D_LATENT
    assert dec.insert_direction_at is None

    rng = np.random.default_rng(0)
    latent = rng.normal(size=(dec.latent_ctx * D_LATENT,)).astype(np.float32)

    # oracle: params from the projection, then a query
    with torch.no_grad():
        lt = torch.from_numpy(latent).view(1, dec.latent_ctx, D_LATENT)
        params_t = proj(lt)
    pos = rng.uniform(-1, 1, size=(1, 64, 3)).astype(np.float32)
    sub = AttrDict({k.replace("nerstf.", ""): v[0]
                    for k, v in params_t.items()})
    with torch.no_grad():
        out_t = model(Query(position=torch.from_numpy(pos)),
                      params=AttrDict({k: v[None] for k, v in sub.items()}),
                      options=AttrDict(nerf_level="fine",
                                       rendering_mode="stf"))

    params_j = dec.mlp_params(jnp.asarray(latent))
    for k, v in sub.items():
        np.testing.assert_allclose(np.asarray(params_j[k]), v.numpy(),
                                   rtol=2e-5, atol=2e-6, err_msg=k)
    got = dec.query(params_j, jnp.asarray(pos[0]))
    np.testing.assert_allclose(np.asarray(got["sdf"]),
                               out_t.signed_distance[0].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["density"]),
                               out_t.density[0].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["channels"]),
                               out_t.channels[0].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_posenc_matches_reference():
    import torch
    sys.path.insert(0, REF)
    from shap_e.models.nn.encoding import encode_position
    x = np.random.default_rng(1).normal(size=(5, 3)).astype(np.float32)
    want = encode_position("nerf", position=torch.from_numpy(x)).numpy()
    got = np.asarray(posenc_nerf(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_decode_mesh_end_to_end():
    """Random tiny decoder: mesh verts near the zero level set, inside
    the volume, colors in [0,1]."""
    _, _, state = _make_oracle(use_ln=False)
    dec = ShapEDecoder.from_state_dict(state)
    rng = np.random.default_rng(2)
    latent = rng.normal(size=(dec.latent_ctx * dec.d_latent,)) \
        .astype(np.float32)
    verts, rgb = dec.decode_mesh(latent, grid_size=24, query_batch=8192)
    if verts.shape[0] == 0:
        pytest.skip("random field produced no surface (rare)")
    assert np.all(np.abs(verts) <= dec.bbox + 1e-4)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0

    # same zero level set as the REFERENCE's marching cubes on the same
    # field (different triangulation — marching tetrahedra vs MC — so
    # compare surfaces by mutual nearest-vertex distance, not 1:1)
    import torch
    sys.path.insert(0, REF)
    # shap_e.rendering.mesh imports blobfile (not installed, unused here)
    import types
    sys.modules.setdefault("blobfile", types.ModuleType("blobfile"))
    from shap_e.rendering.mc import marching_cubes as ref_mc
    params = dec.mlp_params(jnp.asarray(latent))
    g = 24
    idx = np.arange(g, dtype=np.float32)
    coords = -1.0 + idx / (g - 1) * 2.0
    xs, ys, zs = np.meshgrid(coords, coords, coords, indexing="ij")
    pts = np.stack([xs, ys, zs], -1).reshape(-1, 3)
    sdf = np.asarray(dec.query(params, jnp.asarray(pts))["sdf"][:, 0])
    full = np.full((g + 2,) * 3, -1.0, np.float32)
    full[1:-1, 1:-1, 1:-1] = sdf.reshape(g, g, g)
    ref_mesh = ref_mc(torch.from_numpy(full),
                      torch.tensor([-1.0, -1.0, -1.0]),
                      torch.tensor([2.0, 2.0, 2.0]))
    rv = ref_mesh.verts.numpy()
    cell = 2.0 / (g + 1)
    # every vertex of ours near theirs and vice versa (sampled)
    def nn_dist(a, b):
        d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
        return d.min(axis=1)
    sa = verts[np.random.default_rng(3).choice(len(verts), 200)]
    sb = rv[np.random.default_rng(4).choice(len(rv), 200)]
    assert nn_dist(sa, rv).max() < 2 * cell
    assert nn_dist(sb, verts).max() < 2 * cell


def test_text300m_latent_sampling():
    """Tiny text300M-shaped transformer: config inferred from the state
    dict, latent sampled via the shared karras sampler."""
    from gsgen_tpu.guidance.convert import flax_to_torch_state
    from gsgen_tpu.guidance.point_e import PointEConfig, PointEModel

    cfg = PointEConfig(input_channels=8, output_channels=16, n_ctx=1024,
                       width=32, layers=2, heads=2, clip_feature_dim=12)
    m = PointEModel(cfg, key=jax.random.PRNGKey(5))
    state = flax_to_torch_state(m.params)
    icfg = text300m_config_from_state(state)
    assert (icfg.input_channels, icfg.output_channels) == (8, 16)
    assert (icfg.width, icfg.layers, icfg.clip_feature_dim) == (32, 2, 12)

    tv = jax.random.normal(jax.random.PRNGKey(6), (12,)) * 0.1
    lat = sample_shap_e_latent(state, tv, jax.random.PRNGKey(7),
                               karras_steps=4, cfg=icfg)
    assert lat.shape == (8 * 1024,)
    assert np.all(np.isfinite(np.asarray(lat)))


def test_shap_e_init_through_config(tmp_path, monkeypatch):
    """init.type=shap_e: in-process decode from a provisioned latent +
    tiny decoder state dict, normalized per the reference."""
    import gsgen_tpu.priors as priors
    monkeypatch.setattr(priors, "ASSET_DIR", str(tmp_path))
    _, _, state = _make_oracle(use_ln=False)
    dec = ShapEDecoder.from_state_dict(state)
    rng = np.random.default_rng(7)
    latent = rng.normal(size=(dec.latent_ctx * dec.d_latent,)) \
        .astype(np.float32)
    np.save(tmp_path / "latent.npy", latent)

    xyz, rgb = priors.shap_e_init_arrays(
        "a shap-e blob", num_points=128, mean_std=0.5,
        decoder_weights=state, latent_path=str(tmp_path / "latent.npy"),
        grid_size=20)
    assert xyz.shape == (128, 3) and rgb.shape == (128, 3)
    assert np.linalg.norm(xyz, axis=-1).max() == pytest.approx(0.5,
                                                               rel=1e-3)
    assert np.abs(xyz.mean(0)).max() < 1e-5
    # cache was written: second call with NO weights succeeds
    xyz2, _ = priors.shap_e_generate("a shap-e blob", num_points=64)
    assert xyz2.shape[1] == 3
