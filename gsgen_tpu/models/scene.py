"""Gaussian-splatting scene model: parameter pytree + functional renderer.

TPU-native re-design of the reference ``GaussianSplattingRenderer``
(gs/gaussian_splatting.py:68-1600 in gsgen3d/gsgen).  Differences
demanded by JAX/XLA:

* Parameters are a **pytree of raw (pre-activation) arrays** with a
  static capacity ``M``; the live Gaussian set is an ``active`` boolean
  mask (the reference mutates ``nn.Parameter`` sizes during
  densify/prune — here densify writes into padding slots, see
  ``gsgen_tpu.models.density``).
* Rendering is a pure function ``render_view(params, active, c2w, ...)``
  — no module state; batching is ``vmap`` over cameras.
* All channels (rgb, depth, z², transmittance) composite in ONE fused
  rasterizer pass instead of the reference's 4 kernel launches
  (gs/gaussian_splatting.py:1304-1403); ``opacity = 1 - T`` and
  ``z_var = E[z²] − E[z]²`` (HiFA, gs/gaussian_splatting.py:1399) fall
  out for free.

Field semantics match the reference exactly: ``mean`` [M,3] world
position, ``qvec`` [M,4] wxyz rotation, ``svec`` [M,3] scale
(``exp``-activated by default), ``color`` [M,3] (sigmoid), ``alpha``
[M] opacity (sigmoid) — conf/base.yaml:141-143.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.binning import bin_gaussians
from ..ops.camera import CameraIntrinsics, get_frustum, sphere_in_frustum
from ..ops.pallas_raster import rasterize_tiles_pallas
from ..ops.projection import (conic_from_cov2d, project_gaussians,
                              screen_radii)
from ..ops.rasterize import rasterize_tiles
from ..ops.sh import eval_sh_color
from ..utils.activations import act, inv_act


class GaussianParams(NamedTuple):
    """Learnable raw fields (pre-activation), capacity-padded to [M].

    ``specular``/``normal`` are the optional PBR fields (reference
    gs/gaussian_splatting.py:159-204: sigmoid specular init 0.05;
    learned normal = normalize(tanh(raw)) init from point-cloud normal
    estimation).  ``None`` (the default) keeps them out of the pytree
    entirely — non-PBR runs are unchanged."""

    mean: jax.Array   # [M, 3]
    qvec: jax.Array   # [M, 4] wxyz
    svec: jax.Array   # [M, 3] raw scale
    color: jax.Array  # [M, 3] raw color
    alpha: jax.Array  # [M]    raw opacity
    specular: Optional[jax.Array] = None   # [M, 3] raw specular albedo
    normal: Optional[jax.Array] = None     # [M, 3] raw normal


class SceneState(NamedTuple):
    """Full (non-learnable-included) scene state."""

    params: GaussianParams
    active: jax.Array        # [M] bool
    max_radii2d: jax.Array   # [M] screen-radius running max (prune stat)
    grad_accum: jax.Array    # [M] accumulated ||d loss/d mean2d|| (densify stat)
    grad_cnt: jax.Array      # [M] number of views the Gaussian was visible in


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static renderer configuration (hashable, jit-safe).

    Defaults mirror conf/base.yaml:131-143 of the reference.
    """

    tile_size: int = 16
    frustum_culling_radius: float = 6.0
    tile_culling_radius: float = 6.0
    T_thresh: float = 1e-4
    svec_act: str = "exp"
    alpha_act: str = "sigmoid"
    color_act: str = "sigmoid"
    depth_detach: bool = True
    dup_cap: int = 1 << 18      # static duplicate capacity (MAX_DUP)
    chunk: int = 256            # rasterizer chunk (streaming granularity)
    near: float = 1e-3
    backend: str = "auto"       # auto | pallas (TPU kernels) | xla (pure scan)
    pallas_interpret: bool = False   # run Pallas kernels in interpret
                                     # mode (CPU-mesh dryruns/tests)
    pad_frac: float = 0.75      # alignment-padding budget as a fraction
                                # of the worst case n_tiles*chunk; average
                                # demand is 0.5 — 0.75 trims the pack
                                # gather and backward grid ~8%% with 1.5x
                                # headroom (overflow drops far duplicates,
                                # monitored via bins.padded_total)
    mxu_scans: bool = True      # backward scans as MXU matmuls (grad rel
                                # err ~2e-3 from the TPU's 1e-4-class
                                # transcendentals; see pallas_raster)
    binning_layout: str = "padded"   # padded | compact (see render_view)
    fast_fwd_cumprod: bool = False   # forward MXU cumprod: ~30% faster
                                     # fwd kernel, ~4e-3 image error
    sh_degree: int = 0          # 0 = per-Gaussian RGB; >0 = SH bands
                                # (SHRenderer parity, gs/sh_renderer.py:38)
    # PBR (reference gs/gaussian_splatting.py:74-75,159-204,1428-1452)
    pbr: bool = False
    normal_type: str = "estimated"   # estimated | learned
    normal_neighborhood: int = 16    # KNN size for normal estimation
    normal_as_rgb: bool = False      # render normals as color (debug)
    render_normal: bool = False      # composite a normal map channel
                                     # (estimator losses, trainer.py:443-455)


def activate(params: GaussianParams, cfg: RenderConfig):
    """Raw params -> physical (mean, qvec, svec, color, alpha)."""
    return (params.mean, params.qvec,
            act(cfg.svec_act)(params.svec),
            act(cfg.color_act)(params.color),
            act(cfg.alpha_act)(params.alpha))


def scene_normals(params: GaussianParams, active, cfg: RenderConfig):
    """Per-Gaussian surface normals (reference
    gs/gaussian_splatting.py:1186-1196: estimated = point-cloud normal
    estimation per forward; learned = normalize(tanh(raw)))."""
    if cfg.normal_type == "learned":
        if params.normal is None:
            raise ValueError("normal_type='learned' needs the PBR normal "
                             "field (RenderConfig.pbr=True)")
        n = jnp.tanh(params.normal)
        return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                               1e-6)
    from ..utils.ops import estimate_pointcloud_normals
    return estimate_pointcloud_normals(params.mean, cfg.normal_neighborhood,
                                       mask=active)


def shaded_color(light_pos, light_color, normal, specular, mean, cam_pos):
    """Blinn-Phong-style specular term (reference utils/ops.py:188-195):
    ``light_color * |<half_vector, normal>| * specular``."""
    def unit(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                               1e-8)
    half = unit(unit(light_pos[None] - mean) + unit(cam_pos[None] - mean))
    dot = jnp.clip(jnp.abs(jnp.sum(half * normal, axis=-1)), 0.0, 1.0)
    return light_color[None] * dot[:, None] * specular


def make_scene(mean, qvec, svec, color, alpha, cfg: RenderConfig,
               capacity: Optional[int] = None, raw: bool = False) -> SceneState:
    """Build a SceneState from physical (or raw) initial values, padding
    to ``capacity`` (reference initialize(), gs/gaussian_splatting.py:171-196)."""
    n = mean.shape[0]
    m = capacity or n
    assert m >= n
    if not raw:
        svec = inv_act(cfg.svec_act)(svec)
        color = inv_act(cfg.color_act)(color)
        alpha = inv_act(cfg.alpha_act)(alpha)

    def pad(x, fill=0.0):
        filler = jnp.broadcast_to(
            jnp.asarray(fill, x.dtype), (m - n,) + x.shape[1:])
        return jnp.concatenate([x, filler], axis=0)

    specular = normal = None
    if cfg.pbr:
        # raw specular = inv_sigmoid(0.05); learned normal raw init =
        # the estimated normals (gs/gaussian_splatting.py:198-204)
        specular = jnp.full((m, 3), float(inv_act("sigmoid")(
            jnp.asarray(0.05))), jnp.float32)
        if cfg.normal_type == "learned":
            from ..utils.ops import estimate_pointcloud_normals
            est = estimate_pointcloud_normals(mean.astype(jnp.float32),
                                              cfg.normal_neighborhood)
            normal = pad(est)

    params = GaussianParams(
        mean=pad(mean.astype(jnp.float32)),
        qvec=pad(qvec.astype(jnp.float32)).at[n:, 0].set(1.0),
        svec=pad(svec.astype(jnp.float32),
                 fill=inv_act(cfg.svec_act)(jnp.asarray(1e-4))),
        color=pad(color.astype(jnp.float32)),
        alpha=pad(alpha.astype(jnp.float32), fill=-10.0),
        specular=specular,
        normal=normal,
    )
    active = jnp.arange(m) < n
    zeros = jnp.zeros((m,), jnp.float32)
    return SceneState(params=params, active=active, max_radii2d=zeros,
                      grad_accum=zeros, grad_cnt=zeros)


def num_active(state: SceneState) -> jax.Array:
    return jnp.sum(state.active.astype(jnp.int32))


def render_view(
    params: GaussianParams,
    active: jax.Array,
    c2w: jax.Array,              # [3, 4]
    intr: CameraIntrinsics,      # static (shapes)
    cfg: RenderConfig,
    bg: jax.Array,               # [3] or [H, W, 3]
    fx=None, fy=None, cx=None, cy=None,  # dynamic intrinsics (default intr)
    rgb_only: bool = False,
    mean2d_tap: Optional[jax.Array] = None,  # [M, 2] zeros; grad tap for densify
    cull_intr: Optional[CameraIntrinsics] = None,  # frustum override
    pixel_offset_y=0,            # slab row offset (tile-sharded render)
    light_pos: Optional[jax.Array] = None,     # [3] PBR point light
    light_color: Optional[jax.Array] = None,   # [3]
) -> Dict[str, jax.Array]:
    """Render one view.  The TPU analog of render_one
    (gs/gaussian_splatting.py:1198-1420).

    Returns dict with ``rgb`` [H,W,3] (+ ``depth``, ``opacity``,
    ``z_var``, ``T``, ``radii2d``, ``visible`` unless ``rgb_only``).
    """
    fx = intr.fx if fx is None else fx
    fy = intr.fy if fy is None else fy
    cx = intr.cx if cx is None else cx
    cy = intr.cy if cy is None else cy

    mean, qvec, svec, color, alpha = activate(params, cfg)
    if cfg.sh_degree > 0:
        # view-dependent color: sigmoid(sum coeffs * Y(dir)) with dir from
        # camera to Gaussian center.  The reference SH kernel evaluates the
        # direction once per tile (vol_render_sh.h:48-65); per-Gaussian
        # directions are strictly more accurate and cost one fused matmul.
        K = cfg.sh_degree ** 2
        coeffs = params.color.reshape(params.color.shape[0], 3, K)
        dirs = mean - c2w[:3, 3][None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        color = eval_sh_color(coeffs, dirs)

    if cfg.normal_as_rgb:
        # debug view (reference forward(), gs/gaussian_splatting.py:1424-1427)
        color = (scene_normals(params, active, cfg) + 1.0) * 0.5
    elif cfg.pbr and params.specular is not None and light_pos is not None:
        # specular shading added on the albedo (reference :1428-1452)
        normal = scene_normals(params, active, cfg)
        spec = act("sigmoid")(params.specular)
        color = color + shaded_color(light_pos, light_color, normal, spec,
                                     mean, c2w[:3, 3])

    # frustum culling (culling.h:11-34 semantics).  cull_intr lets
    # tile-sharded slab renders cull with the FULL camera (a slab's
    # symmetric frustum would wrongly cull its own content).
    normals, pts = get_frustum(c2w, cull_intr or intr)
    radii = jnp.max(svec, axis=-1) * cfg.frustum_culling_radius
    cull = sphere_in_frustum(mean, radii, normals, pts)

    proj = project_gaussians(mean, qvec, svec, c2w,
                             detach_depth=cfg.depth_detach, near=cfg.near)
    vis = active & cull & proj.in_front

    mean2d = proj.mean2d
    if mean2d_tap is not None:
        mean2d = mean2d + mean2d_tap

    backend = cfg.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    # Mosaic requires 128-divisible lane blocks: compiled Pallas kernels
    # cannot run with a smaller streaming chunk (BASELINE.md: "chunk 128
    # is the Mosaic lane-alignment floor").  Clamp transparently — the
    # segments are identical, only alignment padding grows — so small-
    # chunk configs (tests, CPU smoke) run unchanged on the chip.
    chunk = cfg.chunk
    if backend == "pallas" and not cfg.pallas_interpret:
        chunk = max(chunk, 128)

    conic, _ = conic_from_cov2d(proj.cov2d)
    n_tiles_pad = (-(-intr.w // cfg.tile_size)) * (-(-intr.h // cfg.tile_size))
    pad_budget = int(n_tiles_pad * chunk * cfg.pad_frac
                     + chunk - 1) // chunk * chunk
    # binning layout: "padded" (default — measured faster at the 100K/512²
    # workload: the compact walk's extra boundary windows offset its
    # binning/pack savings, BASELINE.md round 3) or "compact" (padding-
    # free; wins when alignment padding dominates — sparse scenes on
    # large tile grids).  Compact needs the Pallas resident-cotangent
    # backward.
    from ..ops.pallas_raster import _RESIDENT_BUDGET
    ch_guess = 8 if (3 if rgb_only else 6) + 2 <= 8 else 16
    P_tile = cfg.tile_size * cfg.tile_size
    compact_ok = (cfg.binning_layout == "compact"
                  and backend == "pallas"
                  and n_tiles_pad * ch_guess * P_tile * 4 <= _RESIDENT_BUDGET)
    bins = bin_gaussians(
        jax.lax.stop_gradient(mean2d), jax.lax.stop_gradient(proj.cov2d),
        jax.lax.stop_gradient(proj.depth), vis,
        fx, fy, cx, cy, intr.w, intr.h, cfg.tile_size, cfg.dup_cap,
        chunk=chunk, tile_culling_radius=cfg.tile_culling_radius,
        pixel_offset_y=pixel_offset_y,
        alpha=jax.lax.stop_gradient(alpha), pad_budget=pad_budget,
        layout="compact" if compact_ok else "padded")

    if rgb_only:
        feats = color
    else:
        feats = [color, proj.depth[:, None], (proj.depth * proj.depth)[:, None]]
        if cfg.render_normal:
            # [0,1]-encoded normals as 3 extra channels of the ONE pass
            # (the reference composites normals in a separate launch;
            # estimator_loss_step expects out["normal"] in that encoding)
            feats.append((scene_normals(params, active, cfg) + 1.0) * 0.5)
        feats = jnp.concatenate(feats, axis=-1)

    oy = jnp.asarray(pixel_offset_y, jnp.float32)
    topleft = (-cx / fx, (oy - cy) / fy)
    psz = (1.0 / fx, 1.0 / fy)
    kw = {}
    if backend == "pallas":
        raster = rasterize_tiles_pallas
        if cfg.pallas_interpret:
            kw["interpret"] = True
        kw["mxu_scans"] = cfg.mxu_scans
        kw["fast_fwd_cumprod"] = cfg.fast_fwd_cumprod
    else:
        raster = rasterize_tiles
    img, T = raster(
        mean2d, conic, alpha, feats, bins, topleft, psz,
        w=intr.w, h=intr.h, tile_size=cfg.tile_size, chunk=chunk,
        T_thresh=cfg.T_thresh, **kw)

    if bg.ndim == 1:
        bg = bg[None, None, :]
    rgb = img[..., :3] + T[..., None] * bg

    out = {"rgb": rgb, "T": T, "n_dup": bins.total}
    if not rgb_only:
        depth = img[..., 3]
        z2 = img[..., 4]
        out.update(
            depth=depth,
            opacity=1.0 - T,
            z_var=z2 - depth * depth,
            radii2d=jnp.where(vis, screen_radii(proj.cov2d), 0.0),
            visible=vis,
        )
        if cfg.render_normal:
            out["normal"] = img[..., 5:8]
    return out


def render_batch(params, active, c2ws, intr, cfg, bgs, fxs=None, fys=None,
                 cxs=None, cys=None, rgb_only=False, mean2d_taps=None,
                 tile_mesh=None, light_pos=None, light_color=None):
    """vmap of :func:`render_view` over a batch of cameras.

    c2ws [B,3,4]; bgs [B,3] or [B,H,W,3]; optional per-sample dynamic
    intrinsics [B] (reference CameraPoseProvider samples per-view focal,
    data/__init__.py:151-230).  Passing ``tile_mesh`` renders each view
    tile-sharded over that mesh's "tile" axis (multi-chip training).

    Batching is ``lax.map`` (scan), NOT vmap: the TPU executes XLA ops
    serially, so scanning views costs nothing over batching them — but
    vmap turns the pipeline's hot row-gathers (duplicate pack,
    expansion) into BATCHED 3-D gathers whose TPU emitter runs ~8-10x
    slower per row than the flat 2-D row-gather form (measured
    round 5: pack gather 21.0 ms batched vs ~2.6 ms as 4 single-view
    gathers at 65K Gaussians / 512² batch 4 — the "batch glue" that
    made the train step 2.5x the sum of its frames).
    """
    B = c2ws.shape[0]
    if light_pos is None:
        light_pos = jnp.zeros((B, 3), jnp.float32)
        light_color = jnp.ones((B, 3), jnp.float32)
        use_light = None
    else:
        use_light = True
    if tile_mesh is not None:
        from ..parallel.sharded_render import render_view_tile_sharded
        fn = lambda c2w, bg, fx, fy, cx, cy, tap, lp, lc: \
            render_view_tile_sharded(
                params, active, c2w, intr, cfg, bg, tile_mesh,
                fx=fx, fy=fy, cx=cx, cy=cy, rgb_only=rgb_only,
                mean2d_tap=tap)
    else:
        fn = lambda c2w, bg, fx, fy, cx, cy, tap, lp, lc: render_view(
            params, active, c2w, intr, cfg, bg, fx, fy, cx, cy,
            rgb_only=rgb_only, mean2d_tap=tap,
            light_pos=lp if use_light else None,
            light_color=lc if use_light else None)
    ones = jnp.ones((B,), jnp.float32)
    fxs = ones * intr.fx if fxs is None else fxs
    fys = ones * intr.fy if fys is None else fys
    cxs = ones * intr.cx if cxs is None else cxs
    cys = ones * intr.cy if cys is None else cys
    taps = (jnp.zeros((B,) + params.mean.shape[:1] + (2,), jnp.float32)
            if mean2d_taps is None else mean2d_taps)
    if tile_mesh is not None:
        # shard_map'd body: keep vmap (the sharded render manages its
        # own per-view collectives; scan-of-shard_map is not supported
        # everywhere and the multichip path trades differently)
        return jax.vmap(fn)(c2ws, bgs, fxs, fys, cxs, cys, taps,
                            light_pos, light_color)
    return jax.lax.map(lambda a: fn(*a),
                       (c2ws, bgs, fxs, fys, cxs, cys, taps,
                        light_pos, light_color))
