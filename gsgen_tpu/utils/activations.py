"""Activation registry for scene parameter fields.

Mirrors the reference registry (utils/activations.py:37-57 in
gsgen3d/gsgen): each named activation maps the raw (stored) parameter to
its physical value, and its inverse maps initial physical values into
raw parameter space.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MIN_SCALE = 1e-3  # reference utils/activations.py:17


def _logit(x, eps=1e-7):
    x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x) - jnp.log1p(-x)


def _softplus_inv(x):
    # log(expm1(x)), stable for small & large x
    return x + jnp.log(-jnp.expm1(-x))


ACTIVATIONS = dict(
    abs=jnp.abs,
    relu=jax.nn.relu,
    sigmoid=jax.nn.sigmoid,
    nothing=lambda x: x,
    exp=jnp.exp,
    biased_relu=lambda x: jax.nn.relu(x) + MIN_SCALE,
    biased_abs=lambda x: jnp.abs(x) + MIN_SCALE,
    softplus=jax.nn.softplus,
)

INV_ACTIVATIONS = dict(
    abs=jnp.abs,
    relu=lambda x: x,
    sigmoid=_logit,
    nothing=lambda x: x,
    exp=jnp.log,
    biased_relu=lambda x: x - MIN_SCALE,
    biased_abs=lambda x: jnp.abs(x - MIN_SCALE),
    softplus=_softplus_inv,
)


def act(name: str):
    return ACTIVATIONS[name]


def inv_act(name: str):
    return INV_ACTIVATIONS[name]
