"""Adaptive density control: densify (clone/split/compactness) + prune.

Functional, static-shape re-design of the reference's parameter-
reallocating adaptive control (gs/gaussian_splatting.py:551-947,
1123-1177 in gsgen3d/gsgen).  The reference rebuilds ``nn.Parameter``s
and performs Adam-state surgery on every densify; here the scene has a
fixed capacity ``M`` with an ``active`` mask, and densification writes
new Gaussians into free (inactive) slots:

1. build a ``want`` mask + new-params arrays over all candidates,
2. allocate free slots deterministically (stable argsort of ``active``;
   candidates beyond capacity are dropped and counted),
3. scatter, flip ``active``, zero optimizer moments of touched slots
   (the functional analog of densify_on_optimizer /
   prune_optimizer, gs/gaussian_splatting.py:481-526).

Strategy semantics follow the reference exactly — legacy clone+split
(densify_legacy, :822-947), official clone/split (:551-630), scale
(:633), compactness toward KNN gaps (:637-695, GSGEN's contribution),
shrink-then-compactness (:745), all (:751) — including quirks like the
transposed rotation applied to split offsets (:577-580).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.transforms import quat_to_rotmat
from ..training.optimizer import AdamState, mask_state_rows
from ..utils.activations import act, inv_act
from ..utils.ops import knn_self, distance_to_gaussian_surface
from .scene import GaussianParams, RenderConfig, SceneState


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    """conf/base.yaml:153-163 defaults."""

    enabled: bool = True
    type: str = "official"
    warm_up: int = 2000
    end: int = 9999
    period: int = 1000
    mean2d_thresh: float = 0.02
    split_thresh: float = 0.02
    n_splits: int = 2
    split_shrink: float = 0.8
    use_legacy: bool = True
    K: int = 3
    surface_shrink: float = 1.5
    scale_max: float = 0.1


@dataclasses.dataclass(frozen=True)
class PruneConfig:
    """conf/base.yaml:164-171 defaults."""

    enabled: bool = False
    warm_up: int = 0
    end: int = 0
    period: int = 500
    radii2d_thresh: float = 1000.0
    alpha_thresh: float = 1000.0
    radii3d_thresh: float = 0.0


def should_run(step: int, enabled: bool, warm_up: int, end: int,
               period: int) -> bool:
    """Host-side trigger check (densify()/prune() gating,
    gs/gaussian_splatting.py:752-760, 1162-1167)."""
    return (enabled and warm_up <= step <= end and period > 0
            and step % period == 0)


def _free_slot_targets(active: jax.Array, want: jax.Array):
    """Map the j-th wanted candidate to the j-th free slot.

    Returns (targets [K] int32 — slot index or M (drop), n_placed).
    Deterministic: free slots are filled in ascending index order,
    candidates in ascending candidate order.
    """
    M = active.shape[0]
    K = want.shape[0]
    n_free = jnp.sum(~active)
    # ascending indices of free slots first (stable: False < True)
    free_slots = jnp.argsort(active, stable=True).astype(jnp.int32)
    rank = jnp.cumsum(want.astype(jnp.int32)) - 1          # excl rank per candidate
    ok = want & (rank < n_free)
    targets = jnp.where(ok, free_slots[jnp.clip(rank, 0, M - 1)], M)
    return targets.astype(jnp.int32), jnp.sum(ok)


def _scatter_new(params: GaussianParams, active, new: GaussianParams,
                 targets: jax.Array):
    """Write candidate rows into their target slots (M = drop)."""
    def put(dst, src):
        return dst.at[targets].set(src, mode="drop")
    params = jax.tree_util.tree_map(put, params, new)
    active = active.at[targets].set(True, mode="drop")
    return params, active


def _split_offsets(qvec, svec, key):
    """Sampled world-space offsets for split copies.

    Matches reference :577-580: ``offset = R^T (svec * n)``, n~N(0,1) —
    the transpose is a reference quirk kept for parity.
    """
    gn = jax.random.normal(key, svec.shape) * svec
    R = quat_to_rotmat(qvec)
    return jnp.einsum("nji,nj->ni", R, gn)


def densify_clone_split(state: SceneState, opt: AdamState,
                        cfg: DensifyConfig, rcfg: RenderConfig,
                        key: jax.Array, legacy: bool):
    """Legacy (:822-947) or official (:551-630) clone+split, jitted.

    legacy: grads = accum/(cnt+1e-5), `>` threshold; split if ANY svec >
    thresh; 2 copies with svec/(shrink*2).  official: grads = accum/cnt
    (nan->0), `>=` threshold; split if MAX svec > thresh, n_splits copies
    with svec/(n_splits*shrink).  BOTH remove the split source: legacy
    rebuilds from ``~split_mask`` rows (gs/gaussian_splatting.py:879-885),
    official prunes the sources after append (:601-610) — net growth per
    split is +1 legacy / +(n_splits-1) official.
    """
    p = state.params
    svec = act(rcfg.svec_act)(p.svec)
    if legacy:
        grads = state.grad_accum / (state.grad_cnt + 1e-5)
        big = jnp.any(svec > cfg.split_thresh, axis=-1)
        n_copies = 2
        shrink = cfg.split_shrink * 2.0
        hot = state.active & (grads > cfg.mean2d_thresh)
    else:
        grads = jnp.where(state.grad_cnt > 0,
                          state.grad_accum / state.grad_cnt, 0.0)
        big = jnp.max(svec, axis=-1) > cfg.split_thresh
        n_copies = cfg.n_splits
        shrink = cfg.n_splits * cfg.split_shrink
        hot = state.active & (grads >= cfg.mean2d_thresh)
    clone_mask = hot & ~big
    split_mask = hot & big

    # clone candidates: raw copies
    targets, n_clone = _free_slot_targets(state.active, clone_mask)
    params, active = _scatter_new(p, state.active, p, targets)

    # split candidates: n_copies per gaussian
    new_svec_raw = inv_act(rcfg.svec_act)(svec / shrink)
    n_split = jnp.zeros((), jnp.int32)
    placed = split_mask
    M = active.shape[0]
    for i in range(n_copies):
        key, k = jax.random.split(key)
        off = _split_offsets(p.qvec, svec, k)
        cand = p._replace(mean=p.mean + off, svec=new_svec_raw)
        targets, n_i = _free_slot_targets(active, split_mask)
        params, active = _scatter_new(params, active, cand, targets)
        n_split = n_split + n_i
        placed = placed & (targets < M)
    # both paths remove the split source (see docstring) — but only when
    # ALL its shrunk copies fit in capacity (the reference reallocates and
    # can't run out; with fixed capacity, dropping the source after
    # failing to place its copies would silently delete the Gaussian).
    # Freed slots become available at the NEXT densify event.
    active = active & ~placed

    old_active = state.active
    state = state._replace(params=params, active=active)
    # rows that stayed active keep moments; new slots + freed slots reset
    opt = mask_state_rows(opt, old_active & active)
    return state, opt, {"num_clone": n_clone, "num_split": n_split}


def densify_compactness(state: SceneState, opt: AdamState,
                        cfg: DensifyConfig, rcfg: RenderConfig,
                        K: Optional[int] = None,
                        shrink_svec: float = 1.0):
    """Fill gaps toward K nearest neighbors (reference :637-695).

    For each (gaussian, k-NN) pair with a positive surface gap, place a
    new isotropic Gaussian at the gap midpoint with radius gap/6.
    ``shrink_svec > 1`` first shrinks all scales (shrink_then_compatness,
    :745-748 — note the reference PERSISTS the shrink; so do we).
    """
    K = K or cfg.K
    p = state.params
    svec = act(rcfg.svec_act)(p.svec) / shrink_svec
    params = p._replace(svec=inv_act(rcfg.svec_act)(svec))
    active = state.active

    _, idx = knn_self(p.mean, K, mask=state.active)
    n_new = jnp.zeros((), jnp.int32)
    for k in range(K):
        nn = idx[:, k]
        nn_pos = p.mean[nn]
        d_nn_surf = distance_to_gaussian_surface(nn_pos, svec[nn], p.qvec[nn],
                                                 p.mean)
        d_self_surf = distance_to_gaussian_surface(p.mean, svec, p.qvec, nn_pos)
        dist = jnp.linalg.norm(nn_pos - p.mean, axis=-1)
        gap_ok = state.active & ((d_self_surf + d_nn_surf) < dist)
        direction = (nn_pos - p.mean) / jnp.maximum(dist[:, None], 1e-10)
        new_mean = p.mean + direction * \
            ((dist + d_self_surf - d_nn_surf) / 2.0)[:, None]
        gap = dist - d_self_surf - d_nn_surf
        new_svec = inv_act(rcfg.svec_act)(
            jnp.maximum(gap, 1e-6)[:, None] / 6.0 * jnp.ones((1, 3)))
        cand = p._replace(mean=new_mean, svec=new_svec)
        targets, n_k = _free_slot_targets(active, gap_ok)
        params, active = _scatter_new(params, active, cand, targets)
        n_new = n_new + n_k

    old_active = state.active
    state = state._replace(params=params, active=active)
    opt = mask_state_rows(opt, old_active & active)
    return state, opt, {"num_compact": n_new}


def densify_by_scale(state: SceneState, opt: AdamState, cfg: DensifyConfig,
                     rcfg: RenderConfig, key: jax.Array):
    """Split every Gaussian larger than scale_max (reference :633-635)."""
    p = state.params
    svec = act(rcfg.svec_act)(p.svec)
    mask = state.active & jnp.any(svec > cfg.scale_max, axis=-1)
    shrink = cfg.n_splits * cfg.split_shrink
    new_svec_raw = inv_act(rcfg.svec_act)(svec / shrink)
    params, active = p, state.active
    n = jnp.zeros((), jnp.int32)
    placed = mask
    M = active.shape[0]
    for i in range(cfg.n_splits):
        key, k = jax.random.split(key)
        off = _split_offsets(p.qvec, svec, k)
        cand = p._replace(mean=p.mean + off, svec=new_svec_raw)
        targets, n_i = _free_slot_targets(active, mask)
        params, active = _scatter_new(params, active, cand, targets)
        n = n + n_i
        placed = placed & (targets < M)
    # remove sources only when all copies were placed (capacity guard)
    active = active & ~placed
    old_active = state.active
    state = state._replace(params=params, active=active)
    opt = mask_state_rows(opt, old_active & active)
    return state, opt, {"num_split": n}


def reset_densify_stats(state: SceneState) -> SceneState:
    z = jnp.zeros_like(state.grad_accum)
    return state._replace(grad_accum=z, grad_cnt=z)


def densify(state: SceneState, opt: AdamState, cfg: DensifyConfig,
            rcfg: RenderConfig, key: jax.Array
            ) -> Tuple[SceneState, AdamState, Dict]:
    """One densification event (dispatch at gs/gaussian_splatting.py:751-818).
    Host calls this only on trigger steps (see :func:`should_run`)."""
    info: Dict = {}
    if cfg.use_legacy:
        state, opt, info = densify_clone_split(state, opt, cfg, rcfg, key,
                                               legacy=True)
        if "shrink_then_compatness" in cfg.type:
            state, opt, i2 = densify_compactness(state, opt, cfg, rcfg,
                                                 shrink_svec=cfg.surface_shrink)
            info.update(i2)
        elif "compatness" in cfg.type:
            state, opt, i2 = densify_compactness(state, opt, cfg, rcfg)
            info.update(i2)
    else:
        if cfg.type == "official":
            state, opt, info = densify_clone_split(state, opt, cfg, rcfg, key,
                                                   legacy=False)
        elif cfg.type == "scale":
            state, opt, info = densify_by_scale(state, opt, cfg, rcfg, key)
        elif cfg.type == "compatness":
            state, opt, info = densify_compactness(state, opt, cfg, rcfg)
        elif cfg.type == "shrink_then_compatness":
            state, opt, info = densify_compactness(
                state, opt, cfg, rcfg, shrink_svec=cfg.surface_shrink)
        elif cfg.type == "all":
            # split every active gaussian in 2 (reference :751-755)
            allcfg = dataclasses.replace(cfg, scale_max=-1.0, n_splits=2)
            state, opt, info = densify_by_scale(state, opt, allcfg, rcfg, key)
        else:
            raise NotImplementedError(f"densify type {cfg.type}")
    state = reset_densify_stats(state)
    return state, opt, info


def prune(state: SceneState, opt: AdamState, cfg: PruneConfig,
          rcfg: RenderConfig, radii2d_thresh: float, alpha_thresh: float
          ) -> Tuple[SceneState, AdamState, Dict]:
    """One prune event (gs/gaussian_splatting.py:1123-1177).  Thresholds
    arrive as host-evaluated ``C()`` scalars."""
    alpha = act(rcfg.alpha_act)(state.params.alpha)
    svec = act(rcfg.svec_act)(state.params.svec)
    kill = jnp.zeros_like(state.active)
    n_scale = n_alpha = n_svec = jnp.zeros((), jnp.int32)
    if cfg.radii2d_thresh > 0.0:
        m = state.active & (state.max_radii2d > radii2d_thresh)
        n_scale = jnp.sum(m)
        kill |= m
    if cfg.alpha_thresh > 0.0:
        m = state.active & (alpha < alpha_thresh)
        n_alpha = jnp.sum(m)
        kill |= m
    if cfg.radii3d_thresh > 0.0:
        m = state.active & jnp.all(svec > cfg.radii3d_thresh, axis=-1)
        n_svec = jnp.sum(m)
        kill |= m
    active = state.active & ~kill
    state = state._replace(active=active)
    opt = mask_state_rows(opt, active)
    return state, opt, {"num_pruned_radii2d": n_scale,
                        "num_pruned_alpha": n_alpha,
                        "num_pruned_svec": n_svec}
