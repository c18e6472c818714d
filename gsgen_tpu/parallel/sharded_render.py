"""Tile-sharded rendering: split the image's tile rows across devices.

The reference is single-GPU (SURVEY §2.6); this is the TPU-native
scale-out of the RAY/TILE dimension the north star asks for: Gaussians
replicated, each device renders a horizontal slab of tiles, per-
Gaussian gradients all-reduce over ICI — which falls out of
``shard_map`` autodiff for replicated inputs (the transpose of a
broadcast is a psum), overlapped by XLA with the backward sweep.

The slab trick: a horizontal band ``[y0, y0 + H/D)`` of the image is
exactly the full camera with ``cy' = cy - y0`` and height ``H/D`` —
``render_view`` already takes dynamic intrinsics, so each device runs
the SAME render (same static shapes, same Pallas kernel with a smaller
tile grid) with a shifted principal point.  Binning runs per device on
its slab only: the per-device duplicate capacity is ``dup_cap`` for its
fraction of tiles, so capacity scales out with devices too.

Composable with data parallelism: vmap over the batch outside, shard
the batch over a ``data`` mesh axis, tiles over ``tile``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models.scene import GaussianParams, RenderConfig, render_view
from ..ops.camera import CameraIntrinsics


def render_view_tile_sharded(
    params: GaussianParams,
    active: jax.Array,
    c2w: jax.Array,
    intr: CameraIntrinsics,
    cfg: RenderConfig,
    bg: jax.Array,              # [3] constant color (replicated)
    mesh: Mesh,
    axis: str = "tile",
    fx=None, fy=None, cx=None, cy=None,
    rgb_only: bool = False,
    mean2d_tap: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Render one view with tiles sharded over ``mesh[axis]``.

    Returns the same dict as render_view; image-shaped outputs are
    sharded over their row axis.  H must divide by D * tile_size.
    """
    D = mesh.shape[axis]
    assert intr.h % (D * cfg.tile_size) == 0, \
        f"H={intr.h} must divide by devices*tile_size={D * cfg.tile_size}"
    slab_h = intr.h // D
    slab_intr = dataclasses.replace(intr, h=slab_h)

    fx = intr.fx if fx is None else fx
    fy = intr.fy if fy is None else fy
    cx = intr.cx if cx is None else cx
    cy = intr.cy if cy is None else cy

    def slab_render(params, active, c2w, bg, fx, fy, cx, cy, tap):
        d = jax.lax.axis_index(axis)
        y0 = d * slab_h
        out = render_view(params, active, c2w, slab_intr, cfg, bg,
                          fx=fx, fy=fy, cx=cx, cy=cy,
                          rgb_only=rgb_only, cull_intr=intr,
                          pixel_offset_y=y0, mean2d_tap=tap)
        # non-image outputs are per-slab partials; mark reductions
        out["n_dup"] = jax.lax.psum(
            jax.lax.stop_gradient(out["n_dup"]), axis)
        if not rgb_only:
            # radii2d/visible are densify stats (never differentiated —
            # pmax has no JVP rule); reduce across slabs explicitly
            out["radii2d"] = jax.lax.pmax(
                jax.lax.stop_gradient(out["radii2d"]), axis)
            out["visible"] = jax.lax.pmax(
                jax.lax.stop_gradient(out["visible"].astype(jnp.int32)),
                axis).astype(bool)
        return out

    img_spec = P(axis)          # row-sharded image outputs
    rep = P()
    out_specs = {"rgb": img_spec, "T": img_spec, "n_dup": rep}
    if not rgb_only:
        out_specs.update(depth=img_spec, opacity=img_spec, z_var=img_spec,
                         radii2d=rep, visible=rep)

    if mean2d_tap is None:
        mean2d_tap = jnp.zeros(params.mean.shape[:1] + (2,), jnp.float32)
    fn = shard_map(
        slab_render, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, rep, rep, rep),
        out_specs=out_specs,
        check_rep=False)
    return fn(params, active, c2w, bg,
              jnp.float32(fx), jnp.float32(fy), jnp.float32(cx),
              jnp.float32(cy), mean2d_tap)


def render_batch_data_tile_sharded(
    params: GaussianParams,
    active: jax.Array,
    c2ws: jax.Array,            # [B, 3, 4], B divisible by mesh["data"]
    intr: CameraIntrinsics,
    cfg: RenderConfig,
    bgs: jax.Array,             # [B, 3]
    mesh: Mesh,
    data_axis: str = "data",
    tile_axis: str = "tile",
) -> jax.Array:
    """2-D parallel render: views sharded over ``data``, tile rows over
    ``tile`` — the production multi-chip layout (SURVEY §2.6).  One
    shard_map over both mesh axes; parameters replicated, so the
    gradient transpose psums over BOTH axes via ICI.  Returns rgb
    [B, H, W, 3] sharded (data, tile)."""
    D_t = mesh.shape[tile_axis]
    D_d = mesh.shape[data_axis]
    assert intr.h % (D_t * cfg.tile_size) == 0
    assert c2ws.shape[0] % D_d == 0
    slab_h = intr.h // D_t
    slab_intr = dataclasses.replace(intr, h=slab_h)

    def body(params, active, c2ws_l, bgs_l):
        d = jax.lax.axis_index(tile_axis)
        y0 = d * slab_h

        def one(c2w, bg):
            out = render_view(params, active, c2w, slab_intr, cfg, bg,
                              rgb_only=True, cull_intr=intr,
                              pixel_offset_y=y0)
            return out["rgb"]

        return jax.vmap(one)(c2ws_l, bgs_l)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(), P(), P(data_axis), P(data_axis)),
                   out_specs=P(data_axis, tile_axis),
                   check_rep=False)
    return fn(params, active, c2ws, bgs)
