"""Functional Adam with per-field dynamic learning rates + slot surgery.

The reference mutates torch.optim.Adam in place: per-step lr rewrites
(gs/gaussian_splatting.py:451-462), state slicing on prune and zero-
concatenation on densify (:481-526).  The TPU equivalent is a pure
pytree: learning rates arrive as scalars each step (host-evaluated
schedules), and densify/prune never reallocate — they zero moment rows
in padding slots (:func:`mask_state_rows`), giving the exact semantics
of the reference's optimizer surgery at static shape.

Matches torch.optim.Adam numerics: betas (0.9, 0.999), bias correction,
eps added AFTER the sqrt, eps=1e-15 (reference set_optimizer,
gs/gaussian_splatting.py:398-419).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: Any      # first-moment pytree (same structure as params)
    nu: Any      # second-moment pytree
    count: jax.Array  # scalar int32 step count


def adam_init(params) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree_util.tree_map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def adam_update(grads, state: AdamState, params, lrs,
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15):
    """One Adam step.  ``lrs`` is a pytree of scalars matching ``params``
    structure (or a single scalar)."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    c1 = 1.0 - b1 ** t
    c2 = 1.0 - b2 ** t
    mu = jax.tree_util.tree_map(
        lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
    nu = jax.tree_util.tree_map(
        lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, grads)
    if isinstance(lrs, (int, float)) or hasattr(lrs, "dtype"):
        lrs = jax.tree_util.tree_map(lambda _: lrs, params)
    new_params = jax.tree_util.tree_map(
        lambda p, m, v, lr: p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps),
        params, mu, nu, lrs)
    return new_params, AdamState(mu=mu, nu=nu, count=count)


def mask_state_rows(state: AdamState, keep: jax.Array) -> AdamState:
    """Zero optimizer moments for rows where ``keep`` is False.

    The functional analog of prune_optimizer/densify_on_optimizer
    (gs/gaussian_splatting.py:481-526): pruned rows and freshly-
    densified padding slots restart from zero moments.  Applies to every
    leaf whose leading dim matches ``keep``.
    """
    n = keep.shape[0]

    def mask_leaf(x):
        if x.ndim >= 1 and x.shape[0] == n:
            k = keep.reshape((n,) + (1,) * (x.ndim - 1))
            return jnp.where(k, x, 0.0)
        return x

    return AdamState(mu=jax.tree_util.tree_map(mask_leaf, state.mu),
                     nu=jax.tree_util.tree_map(mask_leaf, state.nu),
                     count=state.count)
