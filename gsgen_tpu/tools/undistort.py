"""OpenCV lens (un)distortion in JAX — jit-friendly Newton solver.

Functional equivalent of reference utils/undistortion.py in
gsgen3d/gsgen (itself vendored nerfacc/nerfstudio code backed by a CUDA
kernel).  The TPU version needs no native kernel: the fixed-iteration
Newton loop is pure vector math, XLA fuses the whole solve into one
elementwise kernel, and everything is differentiable for free (the
reference's CUDA path is explicitly non-differentiable).

Parameter conventions match OpenCV / the reference exactly:
  radial-tangential: {k1, k2, p1, p2, k3, k4, k5, k6}, accepted with
    0/1/2/4/8 trailing parameters (zero-padded);
  fisheye: {k1, k2, k3, k4}, theta-polynomial model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad_params(params: jax.Array, n: int = 8) -> jax.Array:
    k = params.shape[-1]
    if k not in (0, 1, 2, 4, 8):
        raise ValueError(f"unsupported distortion parameter count {k}")
    if k < n:
        pad = [(0, 0)] * (params.ndim - 1) + [(0, n - k)]
        params = jnp.pad(params, pad)
    return params


def opencv_lens_distortion(uv: jax.Array, params: jax.Array) -> jax.Array:
    """Apply {k1,k2,p1,p2,k3,k4,k5,k6} distortion to normalized UV.

    Forward model of reference utils/undistortion.py:85-120
    (`_opencv_lens_distortion`).
    """
    params = _pad_params(jnp.asarray(params, uv.dtype))
    k1, k2, p1, p2, k3, k4, k5, k6 = jnp.moveaxis(
        jnp.broadcast_to(params, uv.shape[:-1] + (8,)), -1, 0)
    u, v = uv[..., 0], uv[..., 1]
    r2 = u * u + v * v
    radial = (1 + r2 * (k1 + r2 * (k2 + r2 * k3))) / (
        1 + r2 * (k4 + r2 * (k5 + r2 * k6)))
    du = 2 * p1 * u * v + p2 * (r2 + 2 * u * u)
    dv = 2 * p2 * u * v + p1 * (r2 + 2 * v * v)
    return jnp.stack([u * radial + du, v * radial + dv], axis=-1)


def opencv_lens_distortion_fisheye(uv: jax.Array, params: jax.Array,
                                   eps: float = 1e-10) -> jax.Array:
    """Apply fisheye {k1,k2,k3,k4} distortion to normalized UV
    (reference utils/undistortion.py:93-120)."""
    params = jnp.asarray(params, uv.dtype)
    if params.shape[-1] != 4:
        raise ValueError(f"fisheye expects 4 params, got {params.shape}")
    k1, k2, k3, k4 = jnp.moveaxis(
        jnp.broadcast_to(params, uv.shape[:-1] + (4,)), -1, 0)
    u, v = uv[..., 0], uv[..., 1]
    r = jnp.sqrt(u * u + v * v)
    th = jnp.arctan(r)
    th2 = th * th
    th_d = th * (1 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4))))
    scale = th_d / jnp.maximum(r, eps)
    return uv * scale[..., None]


def _residual_and_jacobian(x, y, xd, yd, p):
    """Residual of the radial-tangential model and its 2x2 Jacobian
    (reference utils/undistortion.py:123-172, nerfstudio math)."""
    k1, k2, p1, p2, k3, k4, k5, k6 = p
    r = x * x + y * y
    alpha = 1.0 + r * (k1 + r * (k2 + r * k3))
    beta = 1.0 + r * (k4 + r * (k5 + r * k6))
    d = alpha / beta

    fx = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x) - xd
    fy = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y) - yd

    alpha_r = k1 + r * (2.0 * k2 + r * (3.0 * k3))
    beta_r = k4 + r * (2.0 * k5 + r * (3.0 * k6))
    d_r = (alpha_r * beta - alpha * beta_r) / (beta * beta)
    d_x = 2.0 * x * d_r
    d_y = 2.0 * y * d_r

    fx_x = d + d_x * x + 2.0 * p1 * y + 6.0 * p2 * x
    fx_y = d_y * x + 2.0 * p1 * x + 2.0 * p2 * y
    fy_x = d_x * y + 2.0 * p2 * y + 2.0 * p1 * x
    fy_y = d + d_y * y + 2.0 * p2 * x + 6.0 * p1 * y
    return fx, fy, fx_x, fx_y, fy_x, fy_y


def opencv_lens_undistortion(uv: jax.Array, params: jax.Array,
                             eps: float = 1e-6,
                             iters: int = 10) -> jax.Array:
    """Invert {k1,k2,p1,p2,k3,k4,k5,k6} distortion by Newton iteration
    (reference utils/undistortion.py:175-211)."""
    params = _pad_params(jnp.asarray(params, uv.dtype))
    p = tuple(jnp.moveaxis(
        jnp.broadcast_to(params, uv.shape[:-1] + (8,)), -1, 0))
    x0, y0 = uv[..., 0], uv[..., 1]

    def step(_, c):
        x, y = c
        fx, fy, fx_x, fx_y, fy_x, fy_y = _residual_and_jacobian(
            x, y, x0, y0, p)
        den = fy_x * fx_y - fx_x * fy_y
        ok = jnp.abs(den) > eps
        den_safe = jnp.where(ok, den, 1.0)
        x = x + jnp.where(ok, (fx * fy_y - fy * fx_y) / den_safe, 0.0)
        y = y + jnp.where(ok, (fy * fx_x - fx * fy_x) / den_safe, 0.0)
        return x, y

    x, y = jax.lax.fori_loop(0, iters, step, (x0, y0))
    return jnp.stack([x, y], axis=-1)


def opencv_lens_undistortion_fisheye(uv: jax.Array, params: jax.Array,
                                     eps: float = 1e-6,
                                     iters: int = 10) -> jax.Array:
    """Invert the fisheye theta-polynomial: Newton on
    ``theta_d = theta (1 + k1 th^2 + k2 th^4 + k3 th^6 + k4 th^8)``
    then rescale the UV ray (reference utils/undistortion.py:50-70,
    CUDA side)."""
    params = jnp.asarray(params, uv.dtype)
    if params.shape[-1] != 4:
        raise ValueError(f"fisheye expects 4 params, got {params.shape}")
    k1, k2, k3, k4 = jnp.moveaxis(
        jnp.broadcast_to(params, uv.shape[:-1] + (4,)), -1, 0)
    u, v = uv[..., 0], uv[..., 1]
    th_d = jnp.sqrt(u * u + v * v)

    def step(_, th):
        th2 = th * th
        poly = 1 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4)))
        dpoly = (3 * k1 + th2 * (5 * k2 + th2 * (7 * k3 + th2 * 9 * k4)))
        f = th * poly - th_d
        fp = poly + th2 * dpoly
        ok = jnp.abs(fp) > eps
        return th - jnp.where(ok, f / jnp.where(ok, fp, 1.0), 0.0)

    theta = jax.lax.fori_loop(0, iters, step, th_d)
    scale = jnp.tan(theta) / jnp.maximum(th_d, eps)
    return uv * scale[..., None]
