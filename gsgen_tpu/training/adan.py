"""Adan optimizer (Adaptive Nesterov Momentum, arXiv 2208.06677).

Functional port of the reference's alternative optimizer
(utils/optimizers.py:23-300 in gsgen3d/gsgen), same update rule:

  m_t = (1-b1) m + b1 g                (note: reference convention)
  v_t = (1-b2) v + b2 (g - g_prev)
  n_t = (1-b3) n + b3 (g + (1-b2)(g - g_prev))^2
  p  -= lr / (sqrt(n_t / c3) + eps) * (m_t / c1 + (1-b2) v_t / c2)
  (optionally decoupled weight decay)
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdanState(NamedTuple):
    m: Any
    v: Any
    n: Any
    g_prev: Any
    count: jax.Array


def adan_init(params) -> AdanState:
    z = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdanState(m=z(), v=z(), n=z(), g_prev=z(),
                     count=jnp.zeros((), jnp.int32))


def adan_update(grads, state: AdanState, params, lr,
                b1: float = 0.98, b2: float = 0.92, b3: float = 0.99,
                eps: float = 1e-8, weight_decay: float = 0.0):
    count = state.count + 1
    t = count.astype(jnp.float32)
    c1 = 1.0 - (1.0 - b1) ** t
    c2 = 1.0 - (1.0 - b2) ** t
    c3 = 1.0 - (1.0 - b3) ** t
    first = (count == 1)

    tm = jax.tree_util.tree_map

    def upd(g, m, v, n, gp, p):
        gd = jnp.where(first, 0.0, g - gp)
        m2 = (1 - b1) * m + b1 * g
        v2 = (1 - b2) * v + b2 * gd
        u = g + (1 - b2) * gd
        n2 = (1 - b3) * n + b3 * u * u
        step = (m2 / c1 + (1 - b2) * v2 / c2) / (jnp.sqrt(n2 / c3) + eps)
        p2 = p * (1.0 - lr * weight_decay) - lr * step
        return p2, m2, v2, n2

    flat_p, tdef = jax.tree_util.tree_flatten(params)
    flat_g = tdef.flatten_up_to(grads)
    flat_m = tdef.flatten_up_to(state.m)
    flat_v = tdef.flatten_up_to(state.v)
    flat_n = tdef.flatten_up_to(state.n)
    flat_gp = tdef.flatten_up_to(state.g_prev)
    outs = [upd(g, m, v, n, gp, p) for g, m, v, n, gp, p in
            zip(flat_g, flat_m, flat_v, flat_n, flat_gp, flat_p)]
    new_p = tdef.unflatten([o[0] for o in outs])
    new_state = AdanState(
        m=tdef.unflatten([o[1] for o in outs]),
        v=tdef.unflatten([o[2] for o in outs]),
        n=tdef.unflatten([o[3] for o in outs]),
        g_prev=grads, count=count)
    return new_p, new_state
