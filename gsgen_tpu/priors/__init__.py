"""3D generative priors (Point-E / Shap-E) as asset producers.

The reference vendors OpenAI's point-e and shap-e (~18 KLoC) and runs
them at Trainer init to produce a ~4K-point colored cloud
(utils/initialize.py:110-228, utils/point_e_helper.py in gsgen3d/gsgen).
In this framework generative init is an ASSET PIPELINE: clouds are
produced once (by any generator, on any machine), stored as .npy/.npz/
.ply, and consumed by ``init.type=point_cloud`` — the reference itself
treats init as one-shot data (SURVEY §7.0).  In a zero-egress
environment the pretrained Point-E/Shap-E checkpoints cannot be
downloaded, so the in-process generators raise with a pointer to the
asset path convention instead of silently degrading.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

ASSET_DIR = os.environ.get("GSGEN_ASSET_DIR", "assets/point_clouds")


def load_point_cloud(path) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Load (xyz [N,3], rgb [N,3] or None) from .npy/.npz/.ply.

    .npy: [N, 6] (xyz+rgb) or [N, 3] (utils/initialize.py:311-334).
    """
    path = Path(path)
    if path.suffix == ".npy":
        a = np.load(path)
        return a[:, :3], (a[:, 3:6] if a.shape[1] >= 6 else None)
    if path.suffix == ".npz":
        z = np.load(path)
        return z["xyz"], (z["rgb"] if "rgb" in z else None)
    if path.suffix == ".ply":
        return _load_ply_points(path)
    raise ValueError(f"unknown point cloud format {path.suffix}")


def _load_ply_points(path) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Minimal binary/ascii PLY vertex reader (x y z [red green blue])."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n = next(int(l.split()[-1]) for l in header
                 if l.startswith("element vertex"))
        props = [l.split()[1:] for l in header if l.startswith("property")]
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        names = [p[1] for p in props]
        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n)
        else:
            dt = np.dtype([(p[1], {"float": "<f4", "uchar": "u1",
                                   "double": "<f8", "int": "<i4"}[p[0]])
                           for p in props])
            data = np.frombuffer(f.read(n * dt.itemsize), dtype=dt, count=n)
            data = np.stack([data[nm].astype(np.float64) for nm in names], 1)
        xyz = data[:, [names.index("x"), names.index("y"), names.index("z")]]
        rgb = None
        if "red" in names:
            rgb = data[:, [names.index("red"), names.index("green"),
                           names.index("blue")]]
            if rgb.max() > 1.5:
                rgb = rgb / 255.0
        return xyz.astype(np.float32), rgb


def _asset_path(kind: str, prompt: str) -> Path:
    key = hashlib.md5(prompt.encode()).hexdigest()[:16]
    return Path(ASSET_DIR) / f"{kind}_{key}.npz"


def point_e_generate(prompt: str, num_points: int = 4096,
                     base_weights: Optional[str] = None,
                     upsample_weights: Optional[str] = None,
                     clip_model_dir: Optional[str] = None,
                     karras_steps: Tuple[int, int] = (64, 64),
                     seed: int = 0, cache: bool = True,
                     base_cfg=None, up_cfg=None,
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Text -> colored point cloud: asset cache, else in-process sampler.

    Resolution order:

    1. ``$GSGEN_ASSET_DIR/point_e_<md5(prompt)[:16]>.npz`` (keys xyz,
       rgb) — a precomputed cloud wins (init is one-shot data).
    2. In-process two-stage diffusion
       (:mod:`gsgen_tpu.priors.point_e_sampler`, the reference's
       ``PointCloudSampler`` semantics, utils/point_e_helper.py:12-40)
       when checkpoint paths are given — explicitly or via env
       ``GSGEN_POINT_E_BASE`` / ``GSGEN_POINT_E_UPSAMPLE`` /
       ``GSGEN_CLIP_DIR``.  The result is cached to the asset path.
    3. Otherwise raise with the asset-path convention.
    """
    p = _asset_path("point_e", prompt)
    if p.exists():
        z = np.load(p)
        return z["xyz"][:num_points], z["rgb"][:num_points]

    base_weights = base_weights or os.environ.get("GSGEN_POINT_E_BASE")
    upsample_weights = (upsample_weights
                        or os.environ.get("GSGEN_POINT_E_UPSAMPLE"))
    clip_model_dir = clip_model_dir or os.environ.get("GSGEN_CLIP_DIR")
    if base_weights is not None:
        xyz, rgb = _point_e_sample_in_process(
            prompt, base_weights, upsample_weights, clip_model_dir,
            karras_steps, seed, base_cfg, up_cfg)
        if cache:
            p.parent.mkdir(parents=True, exist_ok=True)
            np.savez(p, xyz=xyz, rgb=rgb)
        return xyz[:num_points], rgb[:num_points]

    raise FileNotFoundError(
        f"No Point-E asset for prompt {prompt!r} at {p} and no "
        "checkpoints configured. Either precompute the cloud and save "
        "np.savez(path, xyz=..., rgb=...), or point GSGEN_POINT_E_BASE/"
        "GSGEN_POINT_E_UPSAMPLE (+GSGEN_CLIP_DIR for text conditioning) "
        "at point-e checkpoints (init.point_e_base/init.point_e_upsample "
        "config keys work too); or use init.type=base/unisphere/"
        "semisphere/box.")


def _point_e_sample_in_process(prompt, base_weights, upsample_weights,
                               clip_model_dir, karras_steps, seed,
                               base_cfg=None, up_cfg=None):
    """Run the jitted two-stage sampler (reference sampler.py:96-170)."""
    import jax
    import jax.numpy as jnp

    from ..guidance.point_e import (BASE40M_TEXTVEC, UPSAMPLE_CFG,
                                    PointEModel, PointEUpsamplerModel)
    from .point_e_sampler import PointESampler, PointESamplerConfig

    base = PointEModel(base_cfg or BASE40M_TEXTVEC).load_weights(
        base_weights)
    up = None
    if upsample_weights is not None:
        up = PointEUpsamplerModel(up_cfg or UPSAMPLE_CFG).load_weights(
            upsample_weights)
    textvec = None
    if clip_model_dir:
        from ..prompt.encoders import build_clip_textvec_fn
        textvec = jnp.asarray(
            build_clip_textvec_fn(clip_model_dir)([prompt])[0])
    sampler = PointESampler(base, up, PointESamplerConfig(
        karras_steps=karras_steps))
    return sampler.sample_to_cloud(jax.random.PRNGKey(seed), textvec)


def point_e_init_arrays(prompt: str, num_points: int = 4096,
                        mean_std: float = 0.6, z_scale: float = 1.0,
                        random_exceed: bool = False, seed: int = 0,
                        **generate_kw) -> Tuple[np.ndarray, np.ndarray]:
    """Generate + normalize a Point-E cloud for scene init, matching
    reference utils/initialize.py:110-167 (point_e_intialize): pad to
    ``num_points`` (random normal extras or resampling), center, scale
    to unit max-norm then ``mean_std``, optional z squeeze.  The facex
    rotation is applied downstream by ``init.facex``."""
    xyz, rgb = point_e_generate(prompt, num_points=4096, **generate_kw)
    xyz = np.asarray(xyz, np.float32)
    rgb = np.asarray(rgb, np.float32)
    rng = np.random.default_rng(seed)
    if num_points > xyz.shape[0]:
        if random_exceed:
            idx = rng.integers(0, xyz.shape[0], num_points)
            xyz, rgb = xyz[idx], rgb[idx]
        else:
            extra = num_points - xyz.shape[0]
            xyz = np.concatenate(
                [xyz, rng.normal(size=(extra, 3)).astype(np.float32)
                 * mean_std], 0)
            rgb = np.concatenate(
                [rgb, rng.random((extra, 3), dtype=np.float32)], 0)
    else:
        xyz, rgb = xyz[:num_points], rgb[:num_points]
    xyz = xyz - xyz.mean(axis=0, keepdims=True)
    xyz = xyz / (np.linalg.norm(xyz, axis=-1).max() + 1e-5) * mean_std
    xyz[..., 2] *= z_scale
    return xyz, rgb


def shap_e_generate(prompt: str, num_points: int = 4096,
                    decoder_weights=None, text_model_weights=None,
                    clip_model_dir: Optional[str] = None,
                    latent_path: Optional[str] = None,
                    grid_size: int = 128, karras_steps: int = 64,
                    guidance_scale: float = 15.0, seed: int = 0,
                    cache: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Text -> mesh-vertex cloud: asset cache, else in-process decode.

    Resolution order (reference utils/shap_e_helper.py:17-49):

    1. ``$GSGEN_ASSET_DIR/shap_e_<md5(prompt)[:16]>.npz`` asset.
    2. A provisioned LATENT (``latent_path`` / env ``GSGEN_SHAP_E_LATENT``
       pointing at a [1024*1024] .npy) decoded in-process via the
       transmitter/vector-decoder checkpoint (``decoder_weights`` / env
       ``GSGEN_SHAP_E_DECODER``): SDF grid -> marching cubes -> vertex
       colors (:mod:`gsgen_tpu.priors.shap_e`).
    3. Text -> latent via the text300M checkpoint (``text_model_weights``
       / env ``GSGEN_SHAP_E_TEXT300M``; karras 64 steps, CFG 15) then
       decode as in 2.
    4. Otherwise raise with the asset contract.
    """
    p = _asset_path("shap_e", prompt)
    if p.exists():
        z = np.load(p)
        return z["xyz"][:num_points], z["rgb"][:num_points]

    decoder_weights = decoder_weights or os.environ.get(
        "GSGEN_SHAP_E_DECODER")
    text_model_weights = (text_model_weights
                          or os.environ.get("GSGEN_SHAP_E_TEXT300M"))
    latent_path = latent_path or os.environ.get("GSGEN_SHAP_E_LATENT")
    clip_model_dir = clip_model_dir or os.environ.get("GSGEN_CLIP_DIR")

    if decoder_weights is not None and (latent_path
                                        or text_model_weights is not None):
        import jax
        import jax.numpy as jnp

        from ..guidance.convert import load_safetensors
        from .shap_e import ShapEDecoder, sample_shap_e_latent

        if latent_path:
            latent = np.load(latent_path).reshape(-1)
        else:
            textvec = None
            if clip_model_dir:
                from ..prompt.encoders import build_clip_textvec_fn
                textvec = jnp.asarray(
                    build_clip_textvec_fn(clip_model_dir)([prompt])[0])
            latent = sample_shap_e_latent(
                text_model_weights, textvec, jax.random.PRNGKey(seed),
                karras_steps=karras_steps, guidance_scale=guidance_scale)
        dec_state = (load_safetensors(decoder_weights)
                     if isinstance(decoder_weights, str)
                     else decoder_weights)
        dec = ShapEDecoder.from_state_dict(dec_state)
        xyz, rgb = dec.decode_mesh(latent, grid_size=grid_size)
        if xyz.shape[0] == 0:
            raise RuntimeError(
                f"shap-e decode produced an empty mesh for {prompt!r}")
        if cache:
            p.parent.mkdir(parents=True, exist_ok=True)
            np.savez(p, xyz=xyz, rgb=rgb)
        return xyz, rgb

    raise FileNotFoundError(
        f"No Shap-E asset for prompt {prompt!r} at {p} and no decode "
        "inputs configured.  Precompute np.savez(path, xyz=..., rgb=...), "
        "or set GSGEN_SHAP_E_DECODER (+ GSGEN_SHAP_E_LATENT for a "
        "provisioned latent, or GSGEN_SHAP_E_TEXT300M + GSGEN_CLIP_DIR "
        "for text->latent sampling); init.shap_e_decoder/init.shap_e_"
        "text300m config keys work too.")


def shap_e_init_arrays(prompt: str, num_points: int = 4096,
                       mean_std: float = 0.6, z_scale: float = 1.0,
                       seed: int = 0, **generate_kw
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Generate + normalize for scene init — reference shap_e_initialize
    (utils/initialize.py:170-228): the FULL vertex set is centered and
    scaled (num_points follows the mesh there); with a fixed static
    capacity we uniformly subsample/pad to ``num_points`` first."""
    xyz, rgb = shap_e_generate(prompt, num_points=1 << 30, **generate_kw)
    xyz = np.asarray(xyz, np.float32)
    rgb = np.asarray(rgb, np.float32)
    rng = np.random.default_rng(seed)
    if xyz.shape[0] > num_points:
        idx = rng.choice(xyz.shape[0], num_points, replace=False)
        xyz, rgb = xyz[idx], rgb[idx]
    elif xyz.shape[0] < num_points:
        idx = rng.integers(0, xyz.shape[0], num_points - xyz.shape[0])
        xyz = np.concatenate([xyz, xyz[idx]], 0)
        rgb = np.concatenate([rgb, rgb[idx]], 0)
    xyz = xyz - xyz.mean(axis=0, keepdims=True)
    xyz = xyz / (np.linalg.norm(xyz, axis=-1).max() + 1e-5) * mean_std
    xyz[..., 2] *= z_scale
    return xyz, rgb
