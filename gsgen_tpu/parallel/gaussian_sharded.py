"""Gaussian-sharded rendering: each device OWNS a shard of the scene.

The scale-out path for >1M-Gaussian scenes (SURVEY §2.6/§7.0 north
star; no reference equivalent — gsgen3d/gsgen is single-GPU).  Layout:

* parameters, optimizer moments, and densify stats live SHARDED over a
  mesh axis (``P('gauss')`` on the leading N dimension) — the dominant
  memory (5 fields + 2 Adam moments + stats ≈ 14N floats) scales 1/D;
* at render time each device all-gathers the raw parameter pytree
  (N x ~14 fp32 — 56 MB at 1M Gaussians, far below the duplicate
  working set) and renders ITS OWN TILE SLAB of the image with the
  standard pipeline.  XLA lowers the all-gather to an ICI ring and
  overlaps it with projection;
* the gradient transpose of the all-gather is a REDUCE-SCATTER: each
  device receives exactly its shard's per-Gaussian gradients, summed
  over every slab that saw those Gaussians — the collective pattern
  the north star names (per-Gaussian grads all-reduced over ICI,
  overlapped with the backward sweep), materialized by shard_map
  autodiff rather than hand-written NCCL;
* densify/prune run SHARD-LOCALLY: the fixed-capacity slot allocator
  (models/density.py) needs only the shard's own stats and free slots,
  so adaptive control needs no communication at all (capacity
  imbalance across shards is possible and monitored by the caller via
  per-shard active counts).

Compared to :mod:`.sharded_render` (tiles sharded, params replicated),
this trades one all-gather per render for 1/D parameter+optimizer
memory; the two compose — ``gauss`` x ``tile`` 2-D meshes shard both.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models.scene import GaussianParams, RenderConfig, render_view
from ..ops.camera import CameraIntrinsics


def _gather_params(params: GaussianParams, active: jax.Array, axis: str):
    """All-gather the raw parameter pytree along the leading axis.

    Differentiable: the transpose is psum_scatter, delivering summed
    per-Gaussian gradients back to each shard's owner.
    """
    def ag(x):
        if x is None:
            return None
        return jax.lax.all_gather(x, axis, axis=0, tiled=True)
    gathered = jax.tree_util.tree_map(ag, params)
    return gathered, jax.lax.all_gather(active, axis, axis=0, tiled=True)


def render_view_gaussian_sharded(
    params: GaussianParams,      # leading dim sharded over mesh[axis]
    active: jax.Array,           # sharded alike
    c2w: jax.Array,
    intr: CameraIntrinsics,
    cfg: RenderConfig,
    bg: jax.Array,               # [3] replicated
    mesh: Mesh,
    axis: str = "gauss",
    rgb_only: bool = False,
    mean2d_tap: Optional[jax.Array] = None,   # sharded alike ([Ns, 2])
) -> Dict[str, jax.Array]:
    """Render one view from a Gaussian-sharded scene.

    Devices double as tile-slab owners on the SAME axis (device d holds
    Gaussian shard d and renders image rows [d*H/D, (d+1)*H/D)) — the
    ring-attention-shaped layout: resident slabs, rotating shard data.
    Image outputs come back row-sharded; per-Gaussian outputs
    (radii2d/visible) come back SHARDED like the inputs.
    """
    D = mesh.shape[axis]
    assert intr.h % (D * cfg.tile_size) == 0, \
        f"H={intr.h} must divide by devices*tile_size={D * cfg.tile_size}"
    slab_h = intr.h // D
    slab_intr = dataclasses.replace(intr, h=slab_h)

    def body(p_shard, act_shard, c2w, bg, tap_shard):
        d = jax.lax.axis_index(axis)
        ns = p_shard.mean.shape[0]
        y0 = d * slab_h
        p_full, act_full = _gather_params(p_shard, act_shard, axis)
        tap_full = jax.lax.all_gather(tap_shard, axis, axis=0, tiled=True)
        out = render_view(p_full, act_full, c2w, slab_intr, cfg, bg,
                          rgb_only=rgb_only, cull_intr=intr,
                          pixel_offset_y=y0, mean2d_tap=tap_full)
        out["n_dup"] = jax.lax.psum(
            jax.lax.stop_gradient(out["n_dup"]), axis)
        if not rgb_only:
            # per-Gaussian stats: reduce over slabs, then keep ONLY the
            # local shard's rows (outputs sharded like inputs)
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, d * ns, ns, 0)
            out["radii2d"] = sl(jax.lax.pmax(
                jax.lax.stop_gradient(out["radii2d"]), axis))
            out["visible"] = sl(jax.lax.pmax(
                jax.lax.stop_gradient(out["visible"].astype(jnp.int32)),
                axis)).astype(bool)
        return out

    img_spec = P(axis)
    rep = P()
    shard_spec = P(axis)
    out_specs = {"rgb": img_spec, "T": img_spec, "n_dup": rep}
    if not rgb_only:
        out_specs.update(depth=img_spec, opacity=img_spec, z_var=img_spec,
                         radii2d=shard_spec, visible=shard_spec)

    if mean2d_tap is None:
        mean2d_tap = jnp.zeros(params.mean.shape[:1] + (2,), jnp.float32)
    fn = shard_map(body, mesh=mesh,
                   in_specs=(shard_spec, shard_spec, rep, rep, shard_spec),
                   out_specs=out_specs, check_rep=False)
    return fn(params, active, c2w, bg, mean2d_tap)


def render_view_gauss_tile_sharded(
    params: GaussianParams,      # leading dim sharded over mesh[gauss_axis]
    active: jax.Array,
    c2w: jax.Array,
    intr: CameraIntrinsics,
    cfg: RenderConfig,
    bg: jax.Array,
    mesh: Mesh,
    gauss_axis: str = "gauss",
    tile_axis: str = "tile",
) -> Dict[str, jax.Array]:
    """2-D gauss x tile composition (the docstring's promised layout).

    A (G, T) mesh: parameters/moments live sharded over ``gauss`` and
    replicated over ``tile``; the image splits into G*T row slabs and
    device (g, t) renders slab ``g*T + t``.  The param all-gather runs
    over the ``gauss`` axis only (a G-hop ICI ring per tile column);
    the gradient transpose reduce-scatters over ``gauss`` and psums
    over ``tile`` — exactly the two collectives the layout needs, both
    inserted by shard_map autodiff.
    """
    G = mesh.shape[gauss_axis]
    T = mesh.shape[tile_axis]
    D = G * T
    assert intr.h % (D * cfg.tile_size) == 0, \
        f"H={intr.h} must divide by G*T*tile_size={D * cfg.tile_size}"
    slab_h = intr.h // D
    slab_intr = dataclasses.replace(intr, h=slab_h)

    def body(p_shard, act_shard, c2w, bg):
        g = jax.lax.axis_index(gauss_axis)
        t = jax.lax.axis_index(tile_axis)
        y0 = (g * T + t) * slab_h
        p_full, act_full = _gather_params(p_shard, act_shard, gauss_axis)
        out = render_view(p_full, act_full, c2w, slab_intr, cfg, bg,
                          rgb_only=True, cull_intr=intr,
                          pixel_offset_y=y0)
        out["n_dup"] = jax.lax.psum(jax.lax.psum(
            jax.lax.stop_gradient(out["n_dup"]), gauss_axis), tile_axis)
        return out

    img_spec = P((gauss_axis, tile_axis))
    out_specs = {"rgb": img_spec, "T": img_spec, "n_dup": P()}
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(gauss_axis), P(gauss_axis), P(), P()),
                   out_specs=out_specs, check_rep=False)
    return fn(params, active, c2w, bg)


def interleave_shards(tree, D: int):
    """Strided permutation of every leading-N array so each of D
    contiguous shards receives every D-th row.

    Scenes are FRONT-PACKED (active rows first, free capacity last);
    contiguous sharding would give the first shards zero free slots and
    the last shards zero active rows, starving shard-local densify
    (its allocator only sees the shard's own free slots).  Interleaving
    balances active/free across shards; the gaussian multiset — and
    hence every render — is unchanged.  Apply ONCE before shard_scene.
    """
    def perm(x):
        if getattr(x, "ndim", 0) < 1 or x.shape[0] % D != 0:
            return x
        n = x.shape[0]
        idx = jnp.arange(n).reshape(n // D, D).T.reshape(-1)
        return x[idx]
    return jax.tree_util.tree_map(perm, tree)


def shard_scene(state, mesh: Mesh, axis: str = "gauss"):
    """Place a SceneState's leading-N arrays sharded over mesh[axis].

    Capacity must divide the axis size.  Returns the same pytree with
    sharded device placement (jit partitions follow it).
    """
    sh = NamedSharding(mesh, P(axis))

    def put(x):
        if x is None or getattr(x, "ndim", 0) == 0:
            return x
        return jax.device_put(x, sh)
    return jax.tree_util.tree_map(put, state)


def gaussian_sharded_train_step(mesh: Mesh, intr: CameraIntrinsics,
                                cfg: RenderConfig, axis: str = "gauss",
                                lr: float = 1e-2):
    """Full sharded train step: render -> reduce-scattered grads ->
    sharded Adam update (moments NEVER leave their shard) — the
    end-to-end form of the module docstring's memory claim.  Returns a
    jitted ``step(params, active, opt, c2w, bg) -> (params', opt',
    loss)`` where every leading-N array stays ``P(axis)``-sharded; the
    caller composes shard-local densify (see
    tests/test_gaussian_sharded.py) between steps.
    """
    from ..training.optimizer import adam_update

    def loss_fn(params, active, c2w, bg):
        out = render_view_gaussian_sharded(params, active, c2w, intr,
                                           cfg, bg, mesh, axis=axis)
        return jnp.mean(out["rgb"] ** 2) + jnp.mean(out["T"])

    @jax.jit
    def step(params, active, opt, c2w, bg):
        loss, grads = jax.value_and_grad(loss_fn)(params, active, c2w, bg)
        lrs = jax.tree_util.tree_map(lambda _: jnp.float32(lr), params)
        new_params, new_opt = adam_update(grads, opt, params, lrs)
        return new_params, new_opt, loss

    return step


def _spec_tree(tree, axis: str):
    return jax.tree_util.tree_map(
        lambda x: P(axis) if getattr(x, "ndim", 0) >= 1 else P(), tree)


def sharded_density_step(mesh: Mesh, dcfg, pcfg, rcfg: RenderConfig,
                         axis: str = "gauss"):
    """Shard-local densify + prune as one jitted resharding event.

    Adaptive density control under the gaussian-sharded layout needs no
    communication (module docstring): each shard reads only its own
    stats and allocates into its own free slots.  Per-gaussian
    decisions (clone/prune masks) are identical to the replicated
    trainer's; only slot PLACEMENT is shard-local.  Event counts are
    psum'd so the host sees global numbers.

    Returns jitted ``fn(scene_state, opt, key, r2_thresh, a_thresh) ->
    (scene', opt', info)`` with every leading-N array kept P(axis).
    """
    from ..models.density import densify as _densify, prune as _prune

    def body(state, opt, key, r2, at):
        info = {}
        if dcfg.enabled:
            state, opt, dinfo = _densify(state, opt, dcfg, rcfg, key)
            info.update(dinfo)
        if pcfg.enabled:
            state, opt, pinfo = _prune(state, opt, pcfg, rcfg, r2, at)
            info.update(pinfo)
        info = {k: jax.lax.psum(v, axis) for k, v in info.items()}
        return state, opt, info

    def build(state, opt):
        return jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(_spec_tree(state, axis), _spec_tree(opt, axis),
                      P(), P(), P()),
            out_specs=(_spec_tree(state, axis), _spec_tree(opt, axis), P()),
            check_rep=False))
    return build


def gauss_tile_train_step(mesh: Mesh, intr: CameraIntrinsics,
                          cfg: RenderConfig, gauss_axis: str = "gauss",
                          tile_axis: str = "tile", lr: float = 1e-2):
    """Train step over the gauss x tile 2-D mesh: params/moments sharded
    over ``gauss`` (replicated over ``tile``), image rows over both
    axes; the grad transpose reduce-scatters over gauss + psums over
    tile (render_view_gauss_tile_sharded docstring)."""
    from ..training.optimizer import adam_update

    def loss_fn(params, active, c2w, bg):
        out = render_view_gauss_tile_sharded(
            params, active, c2w, intr, cfg, bg, mesh,
            gauss_axis=gauss_axis, tile_axis=tile_axis)
        return jnp.mean(out["rgb"] ** 2) + jnp.mean(out["T"])

    @jax.jit
    def step(params, active, opt, c2w, bg):
        loss, grads = jax.value_and_grad(loss_fn)(params, active, c2w, bg)
        lrs = jax.tree_util.tree_map(lambda _: jnp.float32(lr), params)
        new_params, new_opt = adam_update(grads, opt, params, lrs)
        return new_params, new_opt, loss

    return step


def gaussian_sharded_grad_step(loss_fn, mesh: Mesh, axis: str = "gauss"):
    """Build a jitted sharded value_and_grad where params stay sharded.

    ``loss_fn(params, active)`` must internally use
    :func:`render_view_gaussian_sharded` (or be shard_map-compatible).
    Returned fn: (params, active) -> (loss, grads) with grads sharded
    like params (the all-gather transpose reduce-scatters them).
    """
    @jax.jit
    def step(params, active):
        return jax.value_and_grad(loss_fn)(params, active)
    return step
