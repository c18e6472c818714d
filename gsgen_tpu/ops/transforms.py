"""Quaternion / rotation / covariance math for 3D Gaussians.

Semantics match the reference (``utils/transforms.py:13-60`` in
gsgen3d/gsgen): quaternions are **wxyz**-ordered, and the scaled
rotation used to build the 3D covariance is ``svec.unsqueeze(-2) *
rotmat`` (``utils/transforms.py:41``), i.e. element ``(i, j) = R[i, j] *
s[j]`` — column scaling, ``M = R @ diag(s)`` — so ``Sigma = M M^T =
R S S^T R^T``.

All functions are pure JAX, vmappable, and fp32 by default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_quat(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize wxyz quaternion(s) along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """wxyz quaternion(s) ``[..., 4]`` -> rotation matrices ``[..., 3, 3]``.

    The quaternion is normalized internally (the reference relies on
    kornia's ``quaternion_to_rotation_matrix`` which also normalizes).
    """
    q = normalize_quat(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrices ``[..., 3, 3]`` -> wxyz quaternions ``[..., 4]``.

    Branch-free (jit friendly) Shepperd-style extraction: compute all
    four candidate quaternions and select the numerically best one.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each valid when its pivot is the largest.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4(cand), 4(coeff)]
    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    q = normalize_quat(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_scale_to_M(qvec: jax.Array, svec: jax.Array) -> jax.Array:
    """Scaled rotation ``M = R S`` (columns of R scaled by svec).

    Matches ``qsvec2rotmat_batched`` (reference utils/transforms.py:35-47):
    ``svec[..., None, :] * R`` scales column j of R by s[j].
    """
    R = quat_to_rotmat(qvec)
    return svec[..., None, :] * R


def quat_scale_to_cov3d(qvec: jax.Array, svec: jax.Array) -> jax.Array:
    """3D covariance ``Sigma = (R S)(R S)^T``  [..., 3, 3].

    Reference: ``qsvec2covmat_batched`` (utils/transforms.py:58-60) and
    ``project_gaussians`` (gs/renderer.py:399-400).
    """
    M = quat_scale_to_M(qvec, svec)
    return M @ jnp.swapaxes(M, -1, -2)
