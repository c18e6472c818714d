"""Asset export: .ply (official 3DGS layout), .splat (antimatter15), mesh.

Port of utils/export.py:20-284 in gsgen3d/gsgen, without the plyfile /
PyMCubes / pytorch3d dependencies: PLY is written directly (binary
little-endian), the density grid is evaluated with the JAX KNN
(utils/ops replacement), and marching cubes runs through the native C++
extension (gsgen_tpu.native.mcubes) with a numpy fallback.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import GaussianParams, RenderConfig, activate
from ..ops.transforms import quat_scale_to_cov3d
from ..utils.ops import knn

PLY_FIELDS = ["x", "y", "z", "nx", "ny", "nz", "red", "green", "blue",
              "opacity", "scale_0", "scale_1", "scale_2",
              "rot_0", "rot_1", "rot_2", "rot_3"]


def _gather_active(params: GaussianParams, active) -> dict:
    idx = np.flatnonzero(np.asarray(active))
    return {f: np.asarray(getattr(params, f))[idx]
            for f in ("mean", "qvec", "svec", "color", "alpha")}


def to_ply(params: GaussianParams, active, path):
    """Official-3DGS-style vertex layout (utils/export.py:158-209).

    Like the reference, raw (pre-activation) svec/alpha/qvec are stored
    and color is scaled by 255.
    """
    p = _gather_active(params, active)
    n = p["mean"].shape[0]
    attrs = np.concatenate([
        p["mean"], np.zeros_like(p["mean"]),
        p["color"] * 255.0, p["alpha"][:, None],
        p["svec"], p["qvec"]], axis=1).astype("<f4")
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {f}" for f in PLY_FIELDS]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(attrs.tobytes())
    return str(path)


def to_splat(params: GaussianParams, active, path, cfg: Optional[RenderConfig] = None):
    """antimatter15 .splat binary: pos/scale f32 + rgba u8 + quat u8,
    sorted by volume*alpha descending (utils/export.py:212-284)."""
    cfg = cfg or RenderConfig()
    p = _gather_active(params, active)
    from ..utils.activations import act
    rgb = np.asarray(act(cfg.color_act)(p["color"]))
    rgb = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)
    opacity = np.asarray(act(cfg.alpha_act)(p["alpha"]))
    op_u8 = np.clip(opacity * 255.0, 0, 255).astype(np.uint8)
    svec = np.asarray(act(cfg.svec_act)(p["svec"]))
    qvec = p["qvec"] / np.linalg.norm(p["qvec"], axis=1, keepdims=True)
    qvec = np.clip(qvec * 128 + 128, 0, 255).astype(np.uint8)
    pos = p["mean"].astype("<f4")

    volume = np.prod(svec, axis=1) * opacity
    order = np.argsort(-volume)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        for i in order:
            f.write(struct.pack("fff", *pos[i]))
            f.write(struct.pack("fff", *svec[i].astype(np.float32)))
            f.write(struct.pack("BBBB", rgb[i, 0], rgb[i, 1], rgb[i, 2],
                                op_u8[i]))
            f.write(struct.pack("BBBB", *qvec[i]))
    return str(path)


def density_grid(params: GaussianParams, active, cfg: RenderConfig,
                 reso: int = 128, K: int = 3, L: float = -1.0,
                 batch: int = 4096):
    """Opacity-weighted Gaussian density on a regular grid
    (utils/export.py:66-121 get_density_val_grid_from_ckpt)."""
    mean, qvec, svec, _, alpha = activate(params, cfg)
    act_np = np.asarray(active)
    idx = np.flatnonzero(act_np)
    mean = jnp.asarray(np.asarray(mean)[idx])
    cov = quat_scale_to_cov3d(jnp.asarray(np.asarray(qvec)[idx]),
                              jnp.asarray(np.asarray(svec)[idx]))
    cov_inv = jnp.linalg.inv(cov + 1e-8 * jnp.eye(3))
    alpha = jnp.asarray(np.asarray(alpha)[idx])

    if L < 0.0:
        L = float(jnp.abs(mean).max()) * 1.1
    xs = jnp.linspace(-L, L, reso)
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    grid = jnp.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], -1)

    @jax.jit
    def eval_batch(pos):
        _, nn = knn(pos, mean, K)                       # [B, K]
        d = pos[:, None, :] - mean[nn]                  # [B, K, 3]
        m = jnp.einsum("bki,bkij,bkj->bk", d, cov_inv[nn], d)
        return jnp.sum(alpha[nn] * jnp.exp(-0.5 * m), axis=-1)

    out = []
    n = grid.shape[0]
    for s in range(0, n, batch):
        out.append(np.asarray(eval_batch(grid[s:s + batch])))
    return np.concatenate(out).reshape(reso, reso, reso), L


def to_mesh(params: GaussianParams, active, cfg: RenderConfig, path,
            reso: int = 128, K: int = 3, thresh: float = 0.5):
    """Density grid -> marching cubes -> OBJ (utils/export.py:123-155)."""
    grid, L = density_grid(params, active, cfg, reso=reso, K=K)
    from ..native.mcubes import marching_cubes
    verts, faces = marching_cubes(grid, thresh)
    # grid index -> world coordinates
    verts = verts / (reso - 1) * 2.0 * L - L
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for t in faces + 1:
            f.write(f"f {t[0]} {t[1]} {t[2]}\n")
    return str(path)
