"""Point-set ops: KNN, farthest-point sampling, surface distances.

TPU-native replacements for the reference's faiss / pytorch3d native
dependencies (gs/initialize.py:15-22, utils/ops.py:62-155 in
gsgen3d/gsgen).  On TPU, brute-force pairwise distances hit the MXU and
beat tree-based CPU structures for the N (<= a few hundred K) this
workload sees; everything is O(N*M) matmul + top_k.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N, D], [M, D] -> squared euclidean distances [N, M] via the
    |a|^2 - 2ab + |b|^2 expansion (one MXU matmul)."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1)
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return jnp.maximum(a2 - 2.0 * ab + b2[None, :], 0.0)


def knn(query: jax.Array, points: jax.Array, k: int,
        mask: jax.Array | None = None) -> Tuple[jax.Array, jax.Array]:
    """k nearest neighbors of each query point.

    Returns (sqdists [N, k], idx [N, k]) sorted ascending.  Matches the
    reference's faiss ``IndexFlatL2`` search (gs/initialize.py:15-22)
    which returns SQUARED L2 distances.  ``mask`` excludes points
    (masked points get +inf distance).
    """
    d = pairwise_sqdist(query, points)
    if mask is not None:
        d = jnp.where(mask[None, :], d, jnp.inf)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx


def knn_self(points: jax.Array, k: int,
             mask: jax.Array | None = None) -> Tuple[jax.Array, jax.Array]:
    """KNN excluding self-matches (the faiss ``k+1`` then drop-first
    pattern, gs/initialize.py:33-35)."""
    d, i = knn(points, points, k + 1, mask)
    return d[:, 1:], i[:, 1:]


def mean_knn_sqdist(points: jax.Array, k: int = 3,
                    mask: jax.Array | None = None) -> jax.Array:
    """Mean squared distance to the k nearest neighbors [N].

    Reference ``cov_init`` / ``nearest_neighbor_initialize``
    (gs/initialize.py:5-22): note the reference feeds faiss *squared*
    distances straight into svec — we keep identical semantics.
    """
    d, _ = knn_self(points, k, mask)
    return jnp.mean(d, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sampling(points: jax.Array, n_samples: int,
                            key: jax.Array | None = None,
                            mask: jax.Array | None = None) -> jax.Array:
    """Indices of a farthest-point subset [n_samples].

    Replaces pytorch3d ``sample_farthest_points`` (utils/ops.py:101-118).
    Deterministic start at the first unmasked index unless a PRNG key is
    given; ``mask`` excludes points from selection entirely.
    """
    n = points.shape[0]
    if mask is None:
        start = (jnp.zeros((), jnp.int32) if key is None
                 else jax.random.randint(key, (), 0, n))
    else:
        start = jnp.argmax(mask).astype(jnp.int32)
    mind = jnp.full((n,), jnp.inf)
    if mask is not None:
        mind = jnp.where(mask, mind, -jnp.inf)   # masked: never argmax

    def body(carry, _):
        mind, last = carry
        d = jnp.sum((points - points[last]) ** 2, axis=-1)
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(mind).astype(jnp.int32)
        return (mind, nxt), last

    (_, _), idx = jax.lax.scan(body, (mind, start), None, length=n_samples)
    return idx


def estimate_pointcloud_normals(points: jax.Array, k: int = 16,
                                mask: jax.Array | None = None) -> jax.Array:
    """Per-point normals by local plane fitting [N, 3].

    Replaces pytorch3d ``estimate_pointcloud_normals`` (reference
    utils/ops.py:62-72, used for PBR normals and learned-normal init,
    gs/gaussian_splatting.py:198-204,1186-1196): KNN neighborhood ->
    3x3 covariance -> smallest eigenvector (closed-form batched eigh —
    MXU-friendly, no iteration).  Directions are disambiguated by
    orienting away from the neighborhood centroid (pytorch3d uses a
    neighborhood-consistency pass; the centroid heuristic is the
    documented delta — normals only feed |dot| shading, which is
    sign-invariant, reference utils/ops.py:193).
    """
    _, idx = knn_self(points, k, mask)             # [N, k]
    nbr = points[idx]                              # [N, k, 3]
    ctr = jnp.mean(nbr, axis=1, keepdims=True)     # [N, 1, 3]
    d = nbr - ctr
    cov = jnp.einsum("nki,nkj->nij", d, d) / k     # [N, 3, 3]
    # smallest eigenvector of a symmetric 3x3 via eigh (XLA batches this)
    _, vecs = jnp.linalg.eigh(cov)
    n = vecs[..., 0]                               # ascending eigenvalues
    # orient away from the local centroid
    out = points - ctr[:, 0]
    sign = jnp.where(jnp.sum(n * out, axis=-1, keepdims=True) < 0.0,
                     -1.0, 1.0)
    n = n * sign
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)


def distance_to_gaussian_surface(mean: jax.Array, svec: jax.Array,
                                 qvec: jax.Array, query: jax.Array) -> jax.Array:
    """Ellipsoid "surface radius" of each Gaussian toward ``query`` [N, 3].

    Faithful port of reference utils/ops.py:136-155 (used by the
    compactness densify gap computation), including its exact spherical
    parameterization: ``r² = s_z² cos²θ + (s_x² cos²φ + s_y² sin²φ)²
    sin²θ`` — note the squared inner term, kept for behavioral parity.
    """
    from ..ops.transforms import quat_to_rotmat
    R = quat_to_rotmat(qvec)                       # [N, 3, 3]
    xyz = query - mean
    xyz = jnp.einsum("nji,nj->ni", R, xyz)         # world -> gaussian frame
    xyz = xyz / jnp.maximum(jnp.linalg.norm(xyz, axis=-1, keepdims=True), 1e-12)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r_xy = jnp.sqrt(x * x + y * y + 1e-10)
    cos_theta, sin_theta = z, r_xy
    cos_phi, sin_phi = x / r_xy, y / r_xy
    d2 = svec[..., 0] ** 2 * cos_phi ** 2 + svec[..., 1] ** 2 * sin_phi ** 2
    r2 = svec[..., 2] ** 2 * cos_theta ** 2 + d2 ** 2 * sin_theta ** 2
    return jnp.sqrt(r2 + 1e-10)
