import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsgen_tpu.ops import transforms as T


def rand_quat(key, n):
    q = jax.random.normal(key, (n, 4))
    return T.normalize_quat(q)


def test_quat_to_rotmat_is_rotation():
    q = rand_quat(jax.random.PRNGKey(0), 64)
    R = T.quat_to_rotmat(q)
    eye = jnp.eye(3)[None].repeat(64, 0)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_quat_identity():
    q = jnp.array([[1.0, 0, 0, 0]])
    np.testing.assert_allclose(T.quat_to_rotmat(q)[0], jnp.eye(3), atol=1e-7)


def test_quat_90deg_z():
    # 90 deg about z: w = cos(45), z = sin(45)
    s = float(np.sin(np.pi / 4))
    q = jnp.array([[s, 0.0, 0.0, s]])
    R = T.quat_to_rotmat(q)[0]
    expected = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_rotmat_quat_roundtrip():
    q = rand_quat(jax.random.PRNGKey(1), 128)
    q = q * jnp.where(q[:, :1] < 0, -1.0, 1.0)  # canonical sign
    q2 = T.rotmat_to_quat(T.quat_to_rotmat(q))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_cov3d_psd_and_eigvals():
    key = jax.random.PRNGKey(2)
    q = rand_quat(key, 32)
    s = jax.random.uniform(jax.random.PRNGKey(3), (32, 3), minval=0.1, maxval=2.0)
    cov = T.quat_scale_to_cov3d(q, s)
    np.testing.assert_allclose(cov, jnp.swapaxes(cov, -1, -2), atol=1e-6)
    # eigenvalues of R S S^T R^T are s^2
    ev = np.sort(np.linalg.eigvalsh(np.asarray(cov)), axis=-1)
    np.testing.assert_allclose(ev, np.sort(np.asarray(s) ** 2, axis=-1),
                               rtol=1e-4, atol=1e-5)


def test_cov3d_isotropic():
    q = rand_quat(jax.random.PRNGKey(4), 8)
    s = jnp.full((8, 3), 0.5)
    cov = T.quat_scale_to_cov3d(q, s)
    np.testing.assert_allclose(cov, 0.25 * jnp.eye(3)[None].repeat(8, 0), atol=1e-6)
