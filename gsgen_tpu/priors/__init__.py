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


def load_mesh(path) -> Tuple[np.ndarray, np.ndarray]:
    """Load (vertices [V,3], faces [F,3] int) from .ply or .obj.

    Replaces the reference's trimesh loader (utils/mesh.py
    ``load_mesh_as_pcd_trimesh``) for the two formats the init path
    needs; polygon faces are fan-triangulated like trimesh does.
    """
    path = Path(path)
    if path.suffix == ".obj":
        verts, faces = [], []
        with open(path) as f:
            for line in f:
                t = line.split()
                if not t:
                    continue
                if t[0] == "v":
                    verts.append([float(x) for x in t[1:4]])
                elif t[0] == "f":
                    idx = [int(x.split("/")[0]) for x in t[1:]]
                    idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                    for k in range(1, len(idx) - 1):   # fan triangulation
                        faces.append([idx[0], idx[k], idx[k + 1]])
        return (np.asarray(verts, np.float32),
                np.asarray(faces, np.int64).reshape(-1, 3))
    if path.suffix == ".ply":
        return _load_ply_mesh(path)
    raise ValueError(f"unknown mesh format {path.suffix}")


def _load_ply_mesh(path) -> Tuple[np.ndarray, np.ndarray]:
    """PLY reader that also parses the face element (list property)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        counts = {}
        order = []
        props = {}
        cur = None
        for l in header:
            t = l.split()
            if t[0] == "element":
                cur = t[1]
                counts[cur] = int(t[2])
                order.append(cur)
                props[cur] = []
            elif t[0] == "property" and cur is not None:
                props[cur].append(t[1:])
        np_t = {"float": "f4", "float32": "f4", "double": "f8",
                "uchar": "u1", "uint8": "u1", "char": "i1",
                "short": "i2", "ushort": "u2", "int": "i4",
                "int32": "i4", "uint": "u4", "uint32": "u4"}
        verts = faces = None
        for el in order:
            n = counts[el]
            if el == "vertex":
                names = [p[-1] for p in props[el]]
                if fmt == "ascii":
                    data = np.loadtxt(f, max_rows=n).reshape(n, -1)
                else:
                    dt = np.dtype([(p[-1], "<" + np_t[p[0]])
                                   for p in props[el]])
                    data = np.frombuffer(f.read(n * dt.itemsize),
                                         dtype=dt, count=n)
                    data = np.stack([data[nm].astype(np.float64)
                                     for nm in names], 1)
                verts = data[:, [names.index("x"), names.index("y"),
                                 names.index("z")]].astype(np.float32)
            elif el == "face":
                cnt_t, idx_t = props[el][0][1], props[el][0][2]
                if fmt == "ascii":
                    rows = [f.readline().split() for _ in range(n)]
                    faces = np.asarray(
                        [[int(r[1]), int(r[2]), int(r[3])] for r in rows],
                        np.int64)
                else:
                    out = []
                    csz = np.dtype(np_t[cnt_t]).itemsize
                    isz = np.dtype(np_t[idx_t]).itemsize
                    for _ in range(n):
                        k = int(np.frombuffer(f.read(csz),
                                              "<" + np_t[cnt_t])[0])
                        idx = np.frombuffer(f.read(k * isz),
                                            "<" + np_t[idx_t])
                        for j in range(1, k - 1):
                            out.append([idx[0], idx[j], idx[j + 1]])
                    faces = np.asarray(out, np.int64)
            else:   # skip unknown elements (binary only if fixed-size)
                if fmt == "ascii":
                    for _ in range(n):
                        f.readline()
                else:
                    dt = np.dtype([(p[-1], "<" + np_t[p[0]])
                                   for p in props[el]])
                    f.read(n * dt.itemsize)
    assert verts is not None and faces is not None, \
        f"{path} has no vertex+face elements (use init.type=point_cloud " \
        "for vertex-only PLYs)"
    return verts, faces


def sample_mesh_surface(verts: np.ndarray, faces: np.ndarray, n: int,
                        rng=None, even: bool = True) -> np.ndarray:
    """Area-weighted (optionally blue-noise 'even') surface samples.

    Matches the reference's ``trimesh.sample.sample_surface_even`` use
    (utils/mesh.py:53-69): faces are drawn with probability
    proportional to their AREA (not one-per-vertex — the round-3 repo
    read PLY vertices, which biases density toward tessellation), points
    are uniform in each triangle via the sqrt-barycentric map, and with
    ``even=True`` a poisson-disk rejection pass (radius derived from
    total area / n, grid-hashed) evens out clusters, topping up with
    fresh area-weighted draws like trimesh's retry loop.
    """
    rng = rng or np.random.default_rng(0)
    v0, v1, v2 = (verts[faces[:, 0]], verts[faces[:, 1]],
                  verts[faces[:, 2]])
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    total = area.sum()
    assert total > 0, "degenerate mesh (zero surface area)"
    p = area / total

    def draw(k):
        fi = rng.choice(len(faces), size=k, p=p)
        r1 = np.sqrt(rng.random(k, dtype=np.float64))
        r2 = rng.random(k, dtype=np.float64)
        a, b, c = 1.0 - r1, r1 * (1.0 - r2), r1 * r2
        return (a[:, None] * v0[fi] + b[:, None] * v1[fi]
                + c[:, None] * v2[fi]).astype(np.float32)

    if not even:
        return draw(n)
    # poisson-disk thinning: radius such that n disks tile ~total area
    radius = np.sqrt(total / (np.pi * n)) * 0.8
    cell = radius / np.sqrt(3.0)
    kept: list = []
    occupied = set()
    attempts = 0
    while len(kept) < n and attempts < 8:
        batch = draw(max(2 * (n - len(kept)), 64))
        cells = np.floor(batch / cell).astype(np.int64)
        for pt, cc in zip(batch, cells):
            key = tuple(cc)
            if key in occupied:
                continue
            occupied.add(key)
            kept.append(pt)
            if len(kept) == n:
                break
        attempts += 1
    if len(kept) < n:       # dense meshes: top up area-weighted
        kept.extend(draw(n - len(kept)))
    return np.stack(kept[:n], axis=0)


def mesh_init_arrays(mesh_path, num_points: int = 4096,
                     mean_std: float = 0.6, flip_yz: bool = False,
                     flip_xy: bool = False, seed: int = 0,
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """``init.type=mesh`` arrays, matching the reference's
    mesh_initlization (utils/initialize.py:285-333): even area-weighted
    surface samples, centered, unit-max-norm scaled to ``mean_std``,
    optional axis flips.  Colors are RANDOM draws exactly like the
    reference (``load_mesh_as_pcd_trimesh`` returns ``torch.rand_like``
    — and ``random_color`` defaults True there anyway)."""
    rng = np.random.default_rng(seed)
    verts, faces = load_mesh(mesh_path)
    xyz = sample_mesh_surface(verts, faces, num_points, rng)
    xyz = xyz - xyz.mean(axis=0, keepdims=True)
    xyz = xyz / (np.linalg.norm(xyz, axis=-1).max() + 1e-5) * mean_std
    if flip_yz:
        xyz = xyz[:, [0, 2, 1]]
    if flip_xy:
        xyz = xyz[:, [1, 0, 2]]
    rgb = rng.random((num_points, 3)).astype(np.float32)
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


def point_e_image_generate(image, num_points: int = 4096,
                           base_weights: Optional[str] = None,
                           upsample_weights: Optional[str] = None,
                           clip_model_dir: Optional[str] = None,
                           base_cfg=None, up_cfg=None,
                           karras_steps: Tuple[int, int] = (64, 64),
                           seed: int = 0, cache: bool = True,
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Image -> colored point cloud (reference point_e_generate_pcd_from
    _image, utils/point_e_helper.py:64-122): the image-GRID-conditioned
    base model (base40M/base300M/base1B equivalents) + the grid-
    conditioned upsampler, CFG 3.0 on BOTH stages.

    ``image``: path or [H, W, 3] float array in [0, 1].  Asset-cache
    resolution mirrors :func:`point_e_generate` with the image content
    hash as the key; checkpoints via args or env
    ``GSGEN_POINT_E_IMAGE_BASE`` / ``GSGEN_POINT_E_UPSAMPLE`` /
    ``GSGEN_CLIP_VISION_DIR``.
    """
    if isinstance(image, (str, Path)):
        key = f"file:{Path(image).resolve()}"
    else:
        key = "arr:" + hashlib.md5(
            np.ascontiguousarray(image, np.float32).tobytes()).hexdigest()
    p = _asset_path("point_e_image", key)
    if p.exists():
        z = np.load(p)
        return z["xyz"][:num_points], z["rgb"][:num_points]

    base_weights = base_weights or os.environ.get(
        "GSGEN_POINT_E_IMAGE_BASE")
    upsample_weights = (upsample_weights
                        or os.environ.get("GSGEN_POINT_E_UPSAMPLE"))
    clip_model_dir = (clip_model_dir
                      or os.environ.get("GSGEN_CLIP_VISION_DIR")
                      or os.environ.get("GSGEN_CLIP_DIR"))
    if base_weights is None:
        raise FileNotFoundError(
            f"No Point-E image asset at {p} and no image-conditioned "
            "checkpoint configured.  Precompute np.savez(path, xyz=..., "
            "rgb=...), or point GSGEN_POINT_E_IMAGE_BASE at a base40M/"
            "base300M/base1B checkpoint (+GSGEN_POINT_E_UPSAMPLE, "
            "+GSGEN_CLIP_VISION_DIR for the ViT-L/14 tower); "
            "init.point_e_image_base etc. work too.")

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from ..guidance.point_e import (BASE40M_IMAGE, UPSAMPLE_CFG,
                                    PointEImageGridModel,
                                    PointEUpsamplerModel)
    from .point_e_sampler import PointESampler, PointESamplerConfig

    if isinstance(image, (str, Path)):
        arr = np.asarray(imageio.imread(image)).astype(np.float32) / 255.0
    else:
        arr = np.asarray(image, np.float32)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=-1)
    arr = arr[..., :3]

    base = PointEImageGridModel(base_cfg or BASE40M_IMAGE).load_weights(
        base_weights)
    up = None
    if upsample_weights is not None:
        up = PointEUpsamplerModel(up_cfg or UPSAMPLE_CFG).load_weights(
            upsample_weights)

    cond = None
    if clip_model_dir:
        from ..guidance.convert import load_safetensors
        from ..prompt.clip_vision import VIT_L14, CLIPImageEncoder
        enc = CLIPImageEncoder.from_state_dict(
            load_safetensors(clip_model_dir), VIT_L14,
            projection_dim=768)
        cond = enc.encode_grid(enc.params, jnp.asarray(arr)[None])[0]

    sampler = PointESampler(base, up, PointESamplerConfig(
        karras_steps=karras_steps,
        up_guidance_scale=3.0 if up is not None else 0.0,
        up_cond=up is not None))
    xyz, rgb = sampler.sample_to_cloud(jax.random.PRNGKey(seed), cond)
    if cache:
        p.parent.mkdir(parents=True, exist_ok=True)
        np.savez(p, xyz=xyz, rgb=rgb)
    return xyz[:num_points], rgb[:num_points]


def point_e_image_init_arrays(image, num_points: int = 4096,
                              mean_std: float = 0.6, facex: bool = False,
                              seed: int = 0, **generate_kw
                              ) -> Tuple[np.ndarray, np.ndarray]:
    """``init.type=point_e_image`` arrays (reference point_e_image_
    initialize, utils/initialize.py:410-439): generate, unit-max-norm
    scale to mean_std (NO centering — the reference skips the mean
    subtraction on this path), optional facex rotation."""
    xyz, rgb = point_e_image_generate(image, num_points=num_points,
                                      seed=seed, **generate_kw)
    xyz = np.asarray(xyz, np.float32)
    rgb = np.asarray(rgb, np.float32)
    rng = np.random.default_rng(seed)
    if xyz.shape[0] < num_points:
        idx = rng.integers(0, xyz.shape[0], num_points - xyz.shape[0])
        xyz = np.concatenate([xyz, xyz[idx]], 0)
        rgb = np.concatenate([rgb, rgb[idx]], 0)
    xyz = xyz / (np.linalg.norm(xyz, axis=-1).max() + 1e-5) * mean_std
    if facex:
        x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        xyz = np.stack([-y, x, z], axis=1)
    return xyz, rgb


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
