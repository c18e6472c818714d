"""Guidance interface.

The reference dispatches guidance modules through a registry
(guidance/__init__.py:29-42 in gsgen3d/gsgen); each takes rendered rgb
plus view metadata and returns a dict of losses.  Here a guidance is an
object with:

* ``params`` — a pytree of (frozen) weights, passed explicitly so the
  jitted train step stays functional;
* ``loss(params, rgb, embedding, elevation, azimuth, camera_distance,
  key, sched) -> dict[str, scalar]`` — pure JAX, jit-safe.  ``sched``
  carries host-evaluated schedule scalars (e.g. annealed max t).

Diffusion guidance never needs gradients through its own weights (SDS
uses a no-grad UNet forward, guidance/stable_diffusion.py:218-228);
implementations should ``stop_gradient`` accordingly.
"""

from __future__ import annotations

from typing import Dict, Protocol

import jax


class Guidance(Protocol):
    params: dict

    def loss(self, params, rgb: jax.Array, embedding, elevation: jax.Array,
             azimuth: jax.Array, camera_distance: jax.Array,
             key: jax.Array, sched: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        ...
