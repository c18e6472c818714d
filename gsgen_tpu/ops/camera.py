"""Pinhole camera model, frustum extraction and ray generation.

TPU-native re-design of the reference ``CameraInfo``
(utils/camera.py:219-378 in gsgen3d/gsgen):

* Intrinsics are a **static** Python dataclass — they determine array
  shapes (H, W, tile grid) so they must be trace-time constants under
  ``jit``.  Per-sample focal jitter is handled by passing ``fx, fy, cx,
  cy`` also as (dynamic) scalars where needed, while H/W stay static.
* ``c2w`` is a ``[3, 4]`` OpenCV-convention camera-to-world matrix
  (columns: right, down, lookat, position), exactly as the reference
  (utils/camera.py:260-289 builds frustum planes from those columns).
* The camera plane is the z=1 plane in camera space; pixel (i, j)
  (row i, col j) maps to camera-plane point
  ``((j - cx) / fx, (i - cy) / fy)`` and the image-plane top-left is
  ``(-cx/fx, -cy/fy)`` with pixel sizes ``1/fx, 1/fy``
  (gs/gaussian_splatting.py:1274-1283).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    """Static camera intrinsics (hashable; safe as a jit static arg)."""

    fx: float
    fy: float
    cx: float
    cy: float
    w: int
    h: int
    near: float = 0.01
    far: float = 1000.0

    @property
    def yfov(self) -> float:
        return 2.0 * math.atan(self.h / (2.0 * self.fy))

    @property
    def aspect(self) -> float:
        return self.w / self.h

    @property
    def pixel_size(self) -> Tuple[float, float]:
        """(pixel_size_x, pixel_size_y) on the z=1 camera plane."""
        return 1.0 / self.fx, 1.0 / self.fy

    @property
    def image_topleft(self) -> Tuple[float, float]:
        """Camera-plane coordinates of pixel (0, 0)."""
        return -self.cx / self.fx, -self.cy / self.fy

    @classmethod
    def from_reso(cls, reso: int, near: float = 0.01, far: float = 1000.0):
        """Square camera with focal = reso (reference from_reso, utils/camera.py:349-360)."""
        return cls(fx=float(reso), fy=float(reso), cx=reso / 2.0, cy=reso / 2.0,
                   w=reso, h=reso, near=near, far=far)

    @classmethod
    def from_fov(cls, fov: float, aspect: float, resolution: int,
                 near: float = 0.01, far: float = 1000.0):
        """Reference from_fov_camera (utils/camera.py:246-256): fov is the
        *horizontal* field of view; H = resolution / aspect."""
        w = resolution
        h = int(resolution / aspect)
        cx, cy = w / 2.0, h / 2.0
        f = cx / math.tan(fov / 2.0)
        return cls(fx=f, fy=f, cx=cx, cy=cy, w=w, h=h, near=near, far=far)

    def downsample(self, scale: int) -> "CameraIntrinsics":
        return dataclasses.replace(
            self, fx=self.fx / scale, fy=self.fy / scale,
            cx=self.cx / scale, cy=self.cy / scale,
            w=self.w // scale, h=self.h // scale)

    def upsample(self, scale: int) -> "CameraIntrinsics":
        return dataclasses.replace(
            self, fx=self.fx * scale, fy=self.fy * scale,
            cx=self.cx * scale, cy=self.cy * scale,
            w=self.w * scale, h=self.h * scale)

    def intrinsic_matrix(self) -> jax.Array:
        return jnp.array([[self.fx, 0.0, self.cx],
                          [0.0, self.fy, self.cy],
                          [0.0, 0.0, 1.0]], dtype=jnp.float32)


def camera_space_to_pixel_space(pts: jax.Array, fx, fy, cx, cy) -> jax.Array:
    """Camera-plane (or camera-space xyz) points -> integer pixel coords.

    Mirrors utils/camera.py:301-315 (perspective divide if 3D, then
    ``x * f + c`` and truncation to int32).
    """
    if pts.shape[-1] == 3:
        pts = pts[..., :2] / pts[..., 2:]
    px = pts[..., 0] * fx + cx
    py = pts[..., 1] * fy + cy
    return jnp.stack([px, py], axis=-1).astype(jnp.int32)


def get_frustum(c2w: jax.Array, intr: CameraIntrinsics) -> Tuple[jax.Array, jax.Array]:
    """Six frustum planes as (normals [6,3], points [6,3]).

    A point q is inside iff dot(q - pts_i, n_i) > 0 for all i (see
    reference in_frustum, utils/camera.py:372-378).  Plane construction
    mirrors utils/camera.py:260-289 (note ``up = -c2w[:,1]`` because the
    camera convention is y-down).
    """
    up = -c2w[:, 1]
    right = c2w[:, 0]
    lookat = c2w[:, 2]
    t = c2w[:, 3]

    half_vside = intr.far * math.tan(intr.yfov * 0.5)
    half_hside = half_vside * intr.aspect

    near_point = intr.near * lookat
    far_point = intr.far * lookat

    normals = jnp.stack([
        lookat,
        -lookat,
        jnp.cross(far_point - half_hside * right, up),
        jnp.cross(up, far_point + half_hside * right),
        jnp.cross(far_point + half_vside * up, right),
        jnp.cross(right, far_point - half_vside * up),
    ], axis=0)
    pts = jnp.stack([near_point + t, far_point + t, t, t, t, t], axis=0)
    return normals, pts


def get_rays_d(c2w: jax.Array, intr: CameraIntrinsics) -> jax.Array:
    """Unnormalized world-space ray directions, shape ``[H, W, 3]``.

    Pixel (i, j) -> direction through camera-plane point
    ``((j - cx)/fx, (i - cy)/fy, 1)`` rotated to world (reference
    get_rays_d, utils/camera.py:327-347; its meshgrid(indexing="ij") over
    (w, h) + final transpose yields exactly this [H, W, 3] layout).
    """
    xs = (jnp.arange(intr.w, dtype=jnp.float32) - intr.cx) / intr.fx
    ys = (jnp.arange(intr.h, dtype=jnp.float32) - intr.cy) / intr.fy
    xg, yg = jnp.meshgrid(xs, ys, indexing="xy")  # [H, W]
    dirs_cam = jnp.stack([xg, yg, jnp.ones_like(xg)], axis=-1)  # [H, W, 3]
    return jnp.einsum("ij,hwj->hwi", c2w[:3, :3], dirs_cam)


def in_frustum(points: jax.Array, normals: jax.Array, pts: jax.Array) -> jax.Array:
    """Boolean mask of points strictly inside all six planes
    (utils/camera.py:372-378)."""
    s = jnp.einsum("pj,nj->pn", points, normals) - jnp.einsum("nj,nj->n", pts, normals)
    return jnp.all(s > 0.0, axis=-1)


def sphere_in_frustum(centers: jax.Array, radii: jax.Array,
                      normals: jax.Array, pts: jax.Array) -> jax.Array:
    """Conservative sphere-vs-frustum test.

    True iff the sphere is on-or-forward of every plane:
    ``dot(c - p_i, n_i) > -r`` (reference intersect_sphere_frustum,
    gs/src/include/kernels.h:156-170; note the reference does NOT
    normalize plane normals, so the radius is compared against a scaled
    distance — we keep identical semantics for parity).
    """
    d = jnp.einsum("pj,nj->pn", centers, normals) - jnp.einsum("nj,nj->n", pts, normals)
    return jnp.all(d > -radii[:, None], axis=-1)
