"""Device mesh + sharding helpers.

The reference has no intra-job parallelism (SURVEY §2.6: single GPU, no
torch.distributed).  This module is the TPU-native scale-out layer the
rebuild adds as a first-class component: a ``jax.sharding.Mesh`` with a
``data`` axis (views/rays sharded, Gaussian params replicated, gradient
all-reduce inserted by XLA SPMD over ICI) and an optional ``tile`` axis
for intra-view tile sharding.

Multi-host: call :func:`init_distributed` once per process before any
device work (jax.distributed.initialize), then every helper here uses
global devices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host bring-up; no-op for single-process runs."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Default: 1-D ``data`` mesh.  Pass ``axes=("data", "tile")`` with
    ``shape=(d, t)`` for 2-D view x tile sharding.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if shape is None:
        shape = (n,) if len(axes) == 1 else None
    assert shape is not None and int(np.prod(shape)) == n
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names=tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for per-view batches."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of [B, ...] arrays with B sharded over ``axis``."""
    s = batch_sharded(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
