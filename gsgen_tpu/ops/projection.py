"""EWA projection of 3D Gaussians to screen space + frustum culling.

Re-implements the math of the reference ``project_gaussians``
(gs/renderer.py:366-421 in gsgen3d/gsgen) as pure, vmapped JAX:

* world -> camera: ``x_cam = W (x - t)`` with ``W = R_c2w^T``
  (gs/renderer.py:381-388),
* Jacobian of the perspective map includes the norm row used by the
  original EWA formulation (gs/renderer.py:366-378; the J is treated as
  a constant — ``@torch.no_grad`` there — so we ``stop_gradient`` it),
* ``Sigma = (R S)(R S)^T``; ``cov2d = (J W) Sigma (J W)^T [:2, :2]``,
* ``mean2d = xy / z`` with the z in the denominator *detached* when
  ``detach_depth`` (the reference's "HUGE CAUTION" default,
  gs/renderer.py:409-419); depth itself stays differentiable.

Everything is fp32 and shape-static; culling returns masks rather than
compacting (compaction is done by the binner via sort keys).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .camera import CameraIntrinsics, get_frustum, sphere_in_frustum
from .transforms import normalize_quat, quat_scale_to_cov3d


class ProjectedGaussians(NamedTuple):
    """Screen-space Gaussians (camera-plane units, z=1 plane)."""

    mean2d: jax.Array   # [N, 2] camera-plane xy
    cov2d: jax.Array    # [N, 2, 2]
    depth: jax.Array    # [N] camera-space z (differentiable)
    in_front: jax.Array  # [N] bool, z > near


def world_to_camera(points: jax.Array, c2w: jax.Array) -> jax.Array:
    """``x_cam = R^T (x - t)`` for ``c2w`` of shape [3, 4] (gs/renderer.py:381-388)."""
    R = c2w[:3, :3]
    t = c2w[:3, 3]
    return jnp.einsum("ji,nj->ni", R, points - t)


def perspective_jacobian(u: jax.Array) -> jax.Array:
    """EWA Jacobian at camera-space points ``u`` [N, 3] -> [N, 3, 3].

    Layout matches gs/renderer.py:366-378 (third row = d|u|/du kept for
    the norm direction; only the top-left 2x2 of the projected
    covariance is used downstream).
    """
    x, y, z = u[..., 0], u[..., 1], u[..., 2]
    l = jnp.linalg.norm(u, axis=-1)
    zero = jnp.zeros_like(x)
    inv_z = 1.0 / z
    row0 = jnp.stack([inv_z, zero, -x * inv_z * inv_z], axis=-1)
    row1 = jnp.stack([zero, inv_z, -y * inv_z * inv_z], axis=-1)
    row2 = jnp.stack([x / l, y / l, z / l], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def project_gaussians(
    mean: jax.Array,
    qvec: jax.Array,
    svec: jax.Array,
    c2w: jax.Array,
    detach_depth: bool = True,
    near: float = 1e-3,
) -> ProjectedGaussians:
    """Project 3D Gaussians to the z=1 camera plane (gs/renderer.py:391-421).

    Gaussians behind the camera get ``in_front=False`` and a clamped z so
    that downstream math stays finite; callers must combine ``in_front``
    with their cull mask.
    """
    u = world_to_camera(mean, c2w)
    z_raw = u[..., 2]
    in_front = z_raw > near
    # keep |z| away from 0 for padding/behind-camera entries
    z_safe = jnp.where(in_front, z_raw, jnp.maximum(z_raw, near))
    u = u.at[..., 2].set(z_safe)

    # cov2d = (J W) Sigma (J W)^T restricted to the top-left 2x2, with
    # Sigma = (R diag(s))(R diag(s))^T.  Algebraically identical to the
    # einsum chain over [N,3,3] operands, but written as elementwise
    # component math: batched 3x3 dot_generals are a pathological MXU
    # shape on TPU (3-wide contractions padded to 128 lanes, <1%
    # utilization, measured ~4 ms/step at 100K Gaussians in the e2e
    # profile), while this form fuses into one VPU pass.  Only rows 0,1
    # of the EWA Jacobian reach cov2d; the norm row is discarded by the
    # 2x2 slice, so it is never built.
    x_c, y_c = u[..., 0], u[..., 1]
    inv_z = jax.lax.stop_gradient(1.0 / z_safe)      # @no_grad in reference
    jx = jax.lax.stop_gradient(-x_c * inv_z * inv_z)
    jy = jax.lax.stop_gradient(-y_c * inv_z * inv_z)
    W = c2w[:3, :3].T                                # world->cam rotation
    # A = J[:2] @ W, per-component: A[i,k] = inv_z*W[i,k] + j_i*W[2,k]
    a = [[inv_z * W[i, k] + (jx if i == 0 else jy) * W[2, k]
          for k in range(3)] for i in range(2)]
    q = normalize_quat(qvec)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = [[1.0 - 2.0 * (qy * qy + qz * qz), 2.0 * (qx * qy - qw * qz),
          2.0 * (qx * qz + qw * qy)],
         [2.0 * (qx * qy + qw * qz), 1.0 - 2.0 * (qx * qx + qz * qz),
          2.0 * (qy * qz - qw * qx)],
         [2.0 * (qx * qz - qw * qy), 2.0 * (qy * qz + qw * qx),
          1.0 - 2.0 * (qx * qx + qy * qy)]]
    # B = A @ R @ diag(s):  B[i,k] = s_k * sum_j A[i,j] R[j,k]
    b = [[svec[..., k] * (a[i][0] * r[0][k] + a[i][1] * r[1][k]
                          + a[i][2] * r[2][k])
          for k in range(3)] for i in range(2)]
    c00 = b[0][0] * b[0][0] + b[0][1] * b[0][1] + b[0][2] * b[0][2]
    c01 = b[0][0] * b[1][0] + b[0][1] * b[1][1] + b[0][2] * b[1][2]
    c11 = b[1][0] * b[1][0] + b[1][1] * b[1][1] + b[1][2] * b[1][2]
    cov2d = jnp.stack([jnp.stack([c00, c01], axis=-1),
                       jnp.stack([c01, c11], axis=-1)], axis=-2)

    depth = u[..., 2]
    denom = jax.lax.stop_gradient(depth) if detach_depth else depth
    mean2d = u[..., :2] / denom[..., None]
    return ProjectedGaussians(mean2d=mean2d, cov2d=cov2d, depth=depth, in_front=in_front)


def screen_radii(cov2d: jax.Array) -> jax.Array:
    """Conservative screen radius = max eigenvalue bound of cov2d.

    Matches the densify-stat tracking at gs/gaussian_splatting.py:1241-1245:
    ``m + sqrt(max(m^2 - det, 0))`` with m the mean of the diagonal.
    """
    m = 0.5 * (cov2d[..., 0, 0] + cov2d[..., 1, 1])
    det = cov2d[..., 0, 0] * cov2d[..., 1, 1] - cov2d[..., 0, 1] * cov2d[..., 1, 0]
    return m + jnp.sqrt(jnp.clip(m * m - det, min=0.0))


def frustum_cull_mask(
    mean: jax.Array,
    svec: jax.Array,
    c2w: jax.Array,
    intr: CameraIntrinsics,
    radius_thresh: float = 6.0,
) -> jax.Array:
    """Bounding-sphere vs frustum visibility mask.

    Sphere radius = ``max(svec) * radius_thresh`` as in the reference
    culling kernel (gs/src/include/culling.h:11-34), with the same
    unnormalized plane normals (see sphere_in_frustum).
    """
    normals, pts = get_frustum(c2w, intr)
    radii = jnp.max(svec, axis=-1) * radius_thresh
    return sphere_in_frustum(mean, radii, normals, pts)


def conic_from_cov2d(cov2d: jax.Array, eps: float = 1e-6) -> Tuple[jax.Array, jax.Array]:
    """Invert 2x2 covariances -> conic coefficients (a, b, c) and det.

    The Gaussian weight is ``exp(-0.5 (a dx^2 + 2 b dx dy + c dy^2))``.
    Matches kernel_gaussian_2d (gs/src/include/kernels.h:195-224), where
    radial = (dx*(c3*dx - c2*dy) + dy*(-c1*dx + c0*dy)) / det, i.e.
    a = c3/det (=cov_yy/det), b = -c1/det, c = c0/det.

    The degeneracy guard is RELATIVE (``eps`` times the magnitude of the
    det's constituent products) and always positive.  An absolute floor
    is wrong at this scale: a half-pixel Gaussian at 512^2 has
    cov ~ 1e-6 and det ~ 1e-12-1e-13 *legitimately* — an absolute 1e-12
    clamp silently inflated its rendered footprint ~2x (the reference
    avoids the issue by computing this in float64, kernels.h:195-224;
    fp32 is fine because the conic magnitudes themselves are
    well-scaled, only the guard must be scale-invariant).
    """
    c0 = cov2d[..., 0, 0]
    c1 = cov2d[..., 0, 1]
    c2 = cov2d[..., 1, 0]
    c3 = cov2d[..., 1, 1]
    det = c0 * c3 - c1 * c2
    floor = eps * (jnp.abs(c0 * c3) + jnp.abs(c1 * c2)) + 1e-38
    det_safe = jnp.maximum(det, floor)
    a = c3 / det_safe
    b = -0.5 * (c1 + c2) / det_safe
    c = c0 / det_safe
    return jnp.stack([a, b, c], axis=-1), det
