"""Training orchestration: the TPU analog of the reference Trainer.

Re-designs trainer.py:62-621 of gsgen3d/gsgen for JAX: the hot path is
ONE jitted function (render -> guidance -> penalties -> grads -> Adam ->
densify-stat accumulation) over static shapes; the host loop evaluates
``C()`` schedules into scalars, samples camera poses (numpy), and
triggers the (separately jitted) densify/prune events on their
schedule, exactly mirroring the reference's step structure:

  update(step) -> train_step x grad_accum -> optimizer step ->
  post_backward stats -> periodic eval/save -> densify -> prune
  (trainer.py:576-621)
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cameras import CameraPoseProvider, CameraSamplerConfig
from ..guidance.mock import MockGuidance
from ..models.background import (BackgroundConfig, apply_background,
                                 init_background)
from ..models.density import (DensifyConfig, PruneConfig, densify, prune,
                              should_run)
from ..models.init import InitConfig, initialize
from ..models.scene import (GaussianParams, RenderConfig, SceneState,
                            num_active, render_batch)
from ..ops.camera import CameraIntrinsics, get_rays_d
from ..utils.schedule import C, make_lr_schedule
from .losses import PENALTIES
from .optimizer import AdamState, adam_init, adam_update


@dataclasses.dataclass
class LossConfig:
    """conf/base.yaml:44-50."""

    sds: Any = 0.1
    vsd: Any = 1.0
    lora: Any = 1.0
    sparsity: Any = 0.0
    opague: Any = 0.0          # sic — reference spelling
    z_var: Any = 0.0
    # image-to-3D (trainer.py:641-695) + aux point guidance (:458-466)
    image: Any = 1000.0
    depth: Any = 10.0
    aux_guidance: Any = 0.0    # e.g. [2000, 0.01, 0, 2001]


@dataclasses.dataclass
class TrainerConfig:
    max_steps: int = 15000
    batch_size: int = 4
    grad_accum: int = 1
    seed: int = 0
    use_bg: bool = True
    rgb_only: bool = False
    # per-field lr specs (conf/base.yaml:12-25)
    lr: Dict[str, Any] = dataclasses.field(default_factory=lambda: dict(
        mean=[0.005, 3.0e-5, 15000, "exp"],
        svec=[0.003, 0.001, 15000, "exp"],
        qvec=0.003, color=0.01, alpha=0.003, bg=0.003,
        # trainable guidance params (VSD LoRA; reference lora_lr
        # stable_diffusion_vsd.py:135)
        guidance=1e-4))
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    # name -> dict(type=..., value=C-spec) (conf/base.yaml:172-175)
    penalty: Dict[str, Dict] = dataclasses.field(default_factory=lambda: {
        "alpha": {"type": "center_weighted", "value": 0.0}})
    log_period: int = 100
    save_period: int = 2000
    # DPT estimator losses (reference trainer.py:101-107,424-456):
    # name -> dict(enabled=..., value=C-spec, checkpoint=path)
    estimators: Dict[str, Dict] = dataclasses.field(default_factory=dict)
    # bucketed duplicate capacity: the reference allocates the exact
    # N_with_dub per frame via a host sync (gs/culling.py:34); with
    # static shapes we pick a power-of-two bucket from the previous
    # frames' observed totals (each bucket = one cached executable)
    auto_dup_bucket: bool = True
    dup_bucket_min: int = 1 << 14
    # steps of lead before a reso milestone to compile the next reso's
    # executables in the background (c2f curriculum; ~35 s per compile)
    reso_prewarm_lead: int = 500
    eval_image_period: int = 100       # conf/base.yaml:36-42
    eval_video_period: int = 500
    # sample images from the guidance's own scheduler (SDS text2img /
    # VSD sample+sample_lora, guidance/samplers.py) every N steps
    # (0 = off) — the "what does the prior think" eval view
    guidance_eval_period: int = 0
    guidance_eval_steps: int = 25      # sampler steps for the eval
    eval_elevation: float = 45.0
    eval_n_frames: int = 30
    eval_camera_distance: float = 2.5
    # XLA profiler capture window [start_step, end_step) -> Perfetto
    # trace in <run_dir>/profile (the reference's nsight brackets,
    # gs/renderer.py:698-806); None disables
    profile_steps: Any = None
    # per-field value stats every N steps (0 = off); scalar form of the
    # reference's histogram logging (gs/gaussian_splatting.py:1489-1564)
    field_stats_period: int = 0


class TrainState(NamedTuple):
    scene: SceneState
    bg: dict
    gp: Any               # trainable guidance params (e.g. VSD LoRA); {} else
    opt: AdamState        # over (GaussianParams, bg, gp)
    key: jax.Array
    step: jax.Array


class Trainer:
    """Host-side orchestration around the jitted step."""

    def __init__(self,
                 cfg: TrainerConfig,
                 rcfg: RenderConfig,
                 init_cfg: InitConfig,
                 bg_cfg: BackgroundConfig,
                 data_cfg: CameraSamplerConfig,
                 guidance: Optional[MockGuidance] = None,
                 dcfg: DensifyConfig = DensifyConfig(),
                 pcfg: PruneConfig = PruneConfig(),
                 init_points: Optional[np.ndarray] = None,
                 init_colors: Optional[np.ndarray] = None,
                 init_raw: Optional[Dict[str, np.ndarray]] = None,
                 prompt_processor: Optional[Any] = None,
                 image_target: Optional[Any] = None,    # sit3d ImageTarget
                 aux_guidance: Optional[Any] = None,    # PointEAuxGuidance
                 grad_mask: Optional[jnp.ndarray] = None,
                 mask_steps: tuple = (-1, -1),          # (start, end)
                 tile_mesh: Optional[Any] = None,       # Mesh for tile sharding
                 estimators: Optional[Dict[str, Any]] = None,  # name -> DPTEstimator
                 logger: Optional[Any] = None):
        self.cfg = cfg
        self.rcfg = rcfg
        self.bg_cfg = bg_cfg
        self.dcfg = dcfg
        self.pcfg = pcfg
        self.guidance = guidance or MockGuidance()
        self.prompt_processor = prompt_processor
        self.image_target = image_target
        self.aux_guidance = aux_guidance
        self.grad_mask = grad_mask
        self.mask_steps = mask_steps
        self.tile_mesh = tile_mesh
        self.data = CameraPoseProvider(data_cfg, seed=cfg.seed)
        self.logger = logger

        # DPT estimator losses (reference estimator_loss_step,
        # trainer.py:424-456); estimators can be injected for tests
        if estimators is None:
            estimators = {}
            for name, d in cfg.estimators.items():
                if not d.get("enabled", False):
                    continue
                from ..priors.dpt import DPTEstimator
                if not d.get("checkpoint"):
                    raise ValueError(
                        f"estimators.{name}.checkpoint required (omnidata "
                        f".ckpt asset; see gsgen_tpu/priors/dpt.py)")
                estimators[name] = DPTEstimator.from_checkpoint(
                    d["checkpoint"], mode=name)
        self.estimators = estimators
        if "normal" in self.estimators and not rcfg.render_normal:
            rcfg = dataclasses.replace(rcfg, render_normal=True)
            self.rcfg = rcfg

        key = jax.random.PRNGKey(cfg.seed)
        k_init, k_bg, k_state = jax.random.split(key, 3)
        scene = initialize(k_init, init_cfg, rcfg,
                           points=init_points, colors=init_colors,
                           raw_values=init_raw)
        bg = init_background(k_bg, bg_cfg)
        gp = getattr(self.guidance, "trainable_params", {})
        opt = adam_init((scene.params, bg, gp))
        self.state = TrainState(scene=scene, bg=bg, gp=gp, opt=opt,
                                key=k_state, step=jnp.zeros((), jnp.int32))

        self.lr_fns = {k: make_lr_schedule(v, cfg.max_steps)
                       for k, v in cfg.lr.items()}
        self.dup_bucket = rcfg.dup_cap
        self._prewarm_threads = {}
        self._last_abstract = None
        self.compile_log = []
        self._step_cache: Dict[Any, Callable] = {}
        self._densify_jit = jax.jit(densify, static_argnames=("cfg", "rcfg"))
        self._prune_jit = jax.jit(prune, static_argnames=("cfg", "rcfg"))

    def load(self, ckpt_path: str) -> int:
        """Resume from a checkpoint written by ``fit`` (reference
        Trainer.load, trainer.py:232-253: rebuild from cfg then restore
        raw params).  Build this Trainer with the same configs first;
        the current state acts as the shape template."""
        from ..io.checkpoint import load_checkpoint
        self.state, step = load_checkpoint(ckpt_path, self.state)
        return step

    # ---- schedules (host side) ----
    def sched_scalars(self, step: int) -> Dict[str, float]:
        c = lambda v: C(v, step, self.cfg.max_steps)
        s = {
            "w_sds": c(self.cfg.loss.sds),
            "w_vsd": c(self.cfg.loss.vsd),
            "w_lora": c(self.cfg.loss.lora),
            "w_sparsity": c(self.cfg.loss.sparsity),
            "w_opague": c(self.cfg.loss.opague),
            "w_z_var": c(self.cfg.loss.z_var),
        }
        for f, fn in self.lr_fns.items():
            s[f"lr_{f}"] = fn(step)
        for name, p in self.cfg.penalty.items():
            s[f"w_pen_{name}"] = c(p["value"])
        if hasattr(self.guidance, "sched_scalars"):
            s.update(self.guidance.sched_scalars(step, self.cfg.max_steps))
        if self.image_target is not None:
            s["w_image"] = c(self.cfg.loss.image)
            s["w_depth"] = c(self.cfg.loss.depth)
        if self.aux_guidance is not None:
            s["w_aux"] = c(self.cfg.loss.aux_guidance)
        for name in self.estimators:
            s[f"w_est_{name}"] = c(
                self.cfg.estimators.get(name, {}).get("value", 1.0))
        ms, me = self.mask_steps
        s["grad_mask_on"] = 1.0 if (self.grad_mask is not None
                                    and ms <= step <= me) else 0.0
        return s

    # ---- the jitted train step ----
    def _build_step(self, intr: CameraIntrinsics, bucket=None):
        cfg, bg_cfg = self.cfg, self.bg_cfg
        rcfg = self._effective_rcfg(bucket)
        guidance = self.guidance
        penalty_cfg = cfg.penalty

        def loss_fn(params: GaussianParams, bgp, gp, taps,
                    scene: SceneState, batch, sched, key, gfrozen,
                    prev_mean):
            B = batch["c2w"].shape[0]
            k_bg, k_g = jax.random.split(key)
            if bg_cfg.type == "mlp":
                dirs = jax.vmap(lambda c: get_rays_d(c, intr))(batch["c2w"])
            else:
                dirs = jnp.zeros((B, 1, 1, 3))
            bgs = jax.vmap(
                lambda d, k: apply_background(bgp, bg_cfg, d, k, training=True)
            )(dirs, jax.random.split(k_bg, B))
            if not cfg.use_bg:
                bgs = jnp.zeros_like(bgs)

            lights = {}
            if rcfg.pbr and "light_pos" in batch:
                lights = dict(light_pos=batch["light_pos"],
                              light_color=batch["light_color"])
            outs = render_batch(
                params, scene.active, batch["c2w"], intr, rcfg, bgs,
                batch["fx"], batch["fy"], batch["cx"], batch["cy"],
                rgb_only=cfg.rgb_only, mean2d_taps=taps,
                tile_mesh=self.tile_mesh, **lights)

            embedding = (self.prompt_processor()
                         if self.prompt_processor is not None else None)
            g = guidance.loss(
                {"frozen": gfrozen, "train": gp}, outs["rgb"], embedding,
                batch["elevation"], batch["azimuth"],
                batch["camera_distance"], k_g, sched,
                c2ws=batch["c2w"], fxs=batch["fx"], fys=batch["fy"],
                cxs=batch["cx"], cys=batch["cy"])

            loss = sched["w_sds"] * g.get("loss_sds", 0.0)
            if "loss_vsd" in g:
                loss = loss + sched["w_vsd"] * g["loss_vsd"]
            if "loss_lora" in g:
                loss = loss + sched["w_lora"] * g["loss_lora"]
            metrics = {f"loss_{k[5:]}" if k.startswith("loss_") else k: v
                       for k, v in g.items()}
            if self.image_target is not None and "is_original" in batch:
                from .sit3d import sit3d_losses
                sl = sit3d_losses(outs, batch, self.image_target, sched)
                loss = (loss + sched["w_image"] * sl["loss_image"]
                        + sched["w_depth"] * sl["loss_depth"])
                metrics.update(sl)
            if self.aux_guidance is not None:
                from ..models.scene import activate as _activate
                _, _, _, col, _ = _activate(params, rcfg)
                emb_aux = embedding.text if embedding is not None else None
                ag = self.aux_guidance.loss(
                    self.aux_guidance.params, params.mean, col, scene.active,
                    emb_aux, k_g)
                loss = loss + sched["w_aux"] * ag["loss_aux"]
                metrics.update(ag)
            for name, est in self.estimators.items():
                # reference estimator_loss_step (trainer.py:424-456): run
                # DPT on the rendered rgb, compare with the rendered
                # depth (1 - pearson) / normal map (mse); grads flow
                # through DPT back into the render
                pred = est.estimate(
                    outs["rgb"].reshape((-1,) + outs["rgb"].shape[-3:]))
                if name == "depth":
                    from .losses import pearson_depth_loss
                    per = jax.vmap(pearson_depth_loss)(
                        pred[..., 0], outs["depth"].reshape(pred[..., 0].shape))
                    est_loss = jnp.mean(per)
                else:
                    nrm = outs["normal"].reshape(pred.shape)
                    est_loss = jnp.mean((nrm - jnp.clip(pred, 0., 1.)) ** 2)
                loss = loss + sched[f"w_est_{name}"] * est_loss
                metrics[f"loss_est_{name}"] = est_loss
            if not cfg.rgb_only:
                # trainer.py:345-383
                sparsity = jnp.mean(jnp.sqrt(outs["opacity"] ** 2 + 0.01))
                o = jnp.clip(outs["opacity"], 1e-3, 1.0 - 1e-3)
                opague = jnp.mean(-(o * jnp.log(o) + (1 - o) * jnp.log(1 - o)))
                z_var = jnp.mean(outs["z_var"] / o * (o > 0.5))
                loss = (loss + sched["w_sparsity"] * sparsity
                        + sched["w_opague"] * opague
                        + sched["w_z_var"] * z_var)
                metrics.update(loss_sparsity=sparsity, loss_opague=opague,
                               loss_z_var=z_var)
            for name, p in penalty_cfg.items():
                fn = PENALTIES[name]
                if name == "alpha":
                    kw = dict(cfg=rcfg, kind=p.get("type", "center_weighted"))
                elif name == "compat":
                    kw = dict(cfg=rcfg, kind=p.get("type", "l1"))
                elif name == "mean":
                    kw = dict(kind=p.get("type", "uniform_l1"))
                elif name == "scale":
                    kw = dict(cfg=rcfg)
                elif name == "move":
                    kw = dict(prev_mean=prev_mean)
                else:
                    kw = {}
                pen = fn(params, scene.active, **kw)
                loss = loss + sched[f"w_pen_{name}"] * pen
                metrics[f"pen_{name}"] = pen
            metrics["loss_total"] = loss
            metrics["n_dup_max"] = jnp.max(outs["n_dup"])
            aux = {
                "radii2d": outs.get("radii2d"),
                "visible": outs.get("visible"),
                "metrics": metrics,
            }
            return loss, aux

        def train_step(state: TrainState, batches, sched, gfrozen,
                       prev_mean):
            """batches: pytree with leading axis [grad_accum, B, ...]."""
            scene = state.scene
            key, k_loop = jax.random.split(state.key)
            A = cfg.grad_accum
            keys = jax.random.split(k_loop, A)

            grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2, 3), has_aux=True)
            gsum = jax.tree_util.tree_map(
                jnp.zeros_like, (scene.params, state.bg, state.gp))
            tap_grads, vis_list, radii_list = [], [], []
            aux = None
            for a in range(A):  # static unroll; A is small (1-4)
                batch = jax.tree_util.tree_map(lambda x: x[a], batches)
                taps = jnp.zeros(
                    (batch["c2w"].shape[0],) + scene.params.mean.shape[:1] + (2,),
                    jnp.float32)
                grads, aux = grad_fn(scene.params, state.bg, state.gp, taps,
                                     scene, batch, sched, keys[a], gfrozen,
                                     prev_mean)
                gsum = jax.tree_util.tree_map(
                    jnp.add, gsum, (grads[0], grads[1], grads[2]))
                tap_grads.append(grads[3])
                if aux["visible"] is not None:
                    vis_list.append(aux["visible"])
                    radii_list.append(aux["radii2d"])
            gscene = jax.tree_util.tree_map(lambda x: x / A, gsum[0])
            gbg = jax.tree_util.tree_map(lambda x: x / A, gsum[1])
            ggp = jax.tree_util.tree_map(lambda x: x / A, gsum[2])
            if self.grad_mask is not None:
                # freeze masked rows while the mask window is on
                # (register_mask, gs/gaussian_splatting.py:341-366)
                keep = 1.0 - sched["grad_mask_on"] * \
                    self.grad_mask.astype(jnp.float32)
                gscene = jax.tree_util.tree_map(
                    lambda x: x * keep.reshape((-1,) + (1,) * (x.ndim - 1)),
                    gscene)

            # per-field lr pytree (specular/normal default to the color
            # lr like the reference param group, gs/gaussian_splatting.py:304-309)
            has = scene.params
            lr_scene = GaussianParams(
                mean=sched["lr_mean"], qvec=sched["lr_qvec"],
                svec=sched["lr_svec"], color=sched["lr_color"],
                alpha=sched["lr_alpha"],
                specular=(sched.get("lr_specular", sched["lr_color"])
                          if has.specular is not None else None),
                normal=(sched.get("lr_normal", sched["lr_color"])
                        if has.normal is not None else None))
            lr_bg = jax.tree_util.tree_map(lambda _: sched["lr_bg"], state.bg)
            lr_gp = jax.tree_util.tree_map(
                lambda _: sched.get("lr_guidance", 1e-4), state.gp)
            (new_params, new_bg, new_gp), opt = adam_update(
                (gscene, gbg, ggp), state.opt,
                (scene.params, state.bg, state.gp),
                (lr_scene, lr_bg, lr_gp))

            # densify stats (update_densify_info,
            # gs/gaussian_splatting.py:464-469: accum += ||d loss/d mean2d||
            # per visible view; cnt += visibility)
            tg = jnp.concatenate(tap_grads, axis=0)        # [A*B, M, 2]
            gnorm = jnp.linalg.norm(tg, axis=-1)           # [A*B, M]
            grad_accum_new = scene.grad_accum + jnp.sum(gnorm, axis=0)
            if vis_list:
                vis = jnp.concatenate(vis_list, axis=0)    # [A*B, M]
                grad_cnt_new = scene.grad_cnt + jnp.sum(vis, axis=0)
                r = jnp.max(jnp.concatenate(radii_list, axis=0), axis=0)
                max_radii2d = jnp.maximum(scene.max_radii2d, r)
            else:
                grad_cnt_new = scene.grad_cnt + jnp.sum(gnorm > 0, axis=0)
                max_radii2d = scene.max_radii2d
            scene = scene._replace(grad_accum=grad_accum_new,
                                   grad_cnt=grad_cnt_new,
                                   max_radii2d=max_radii2d,
                                   params=new_params)
            new_state = TrainState(scene=scene, bg=new_bg, gp=new_gp,
                                   opt=opt, key=key, step=state.step + 1)
            return new_state, aux["metrics"]

        return jax.jit(train_step)

    def _effective_rcfg(self, bucket=None):
        bucket = self.dup_bucket if bucket is None else bucket
        if bucket == self.rcfg.dup_cap:
            return self.rcfg
        return dataclasses.replace(self.rcfg, dup_cap=bucket)

    def _get_step_fn(self, intr: CameraIntrinsics):
        key = (intr, self.dup_bucket)
        if key not in self._step_cache:
            # a compile-ahead thread may already be building it
            fut = self._prewarm_threads.pop(key, None)
            if fut is not None:
                fut.join()
            if key not in self._step_cache:
                self._step_cache[key] = self._build_step(intr)
        return self._step_cache[key]

    def _prewarm_bucket(self, intr: CameraIntrinsics, bucket: int):
        """Compile the NEXT dup bucket's executable on a host thread
        while training continues on the current one (VERDICT round-2
        item 7: densify growth otherwise stalls the loop for the full
        compile time when the bucket trigger fires).  XLA compilation
        releases the GIL, so this overlaps with stepping; shapes are
        taken from the live step (capacity is static, so only the
        bucket differs)."""
        key = (intr, bucket)
        if (key in self._step_cache or key in self._prewarm_threads
                or self._last_abstract is None):
            return
        abstract = self._last_abstract

        def compile_it():
            import time as _t
            t0 = _t.perf_counter()
            # one background compile at a time: concurrent compiles
            # through the remote-compile tunnel are flaky (round-4 c2f
            # soak: "response body closed before all bytes were read"
            # killed a prewarm thread and the milestone then stalled
            # the full compile time) and contend for host CPU anyway
            with self._prewarm_lock:
                for attempt in range(2):
                    try:
                        # bucket passed explicitly: the main thread keeps
                        # stepping on self.dup_bucket (no shared mutation)
                        fn = self._build_step(intr, bucket=bucket)
                        compiled = fn.lower(*abstract).compile()
                        self._step_cache[key] = compiled
                        self.compile_log.append(
                            {"bucket": bucket,
                             "prewarm_s": _t.perf_counter() - t0})
                        return
                    except Exception as e:      # transient tunnel error
                        err = e
                self.compile_log.append(
                    {"bucket": bucket, "prewarm_failed": repr(err)})

        import threading
        if not hasattr(self, "_prewarm_lock"):
            self._prewarm_lock = threading.Lock()
        t = threading.Thread(target=compile_it, daemon=True)
        self._prewarm_threads[key] = t
        t.start()

    def _adjust_dup_bucket(self, n_dup_max: int, intr=None):
        """Grow on (near-)overflow, shrink when persistently oversized.

        Shrinks are prewarmed like growths: the round-4 c2f soak caught
        a 25 s stall from an UN-prewarmed shrink recompile (64² phase,
        few duplicates).  At half streak the half bucket compiles on a
        background thread; the shrink itself waits until that
        executable exists — a shrink only saves memory, so deferring it
        costs nothing.
        """
        cap = self.dup_bucket
        if n_dup_max > 0.7 * cap:
            self.dup_bucket = cap * 2
            self._shrink_streak = 0
        elif n_dup_max < 0.15 * cap and cap > self.cfg.dup_bucket_min:
            self._shrink_streak = getattr(self, "_shrink_streak", 0) + 1
            if self._shrink_streak >= 10 and intr is not None:
                self._prewarm_bucket(intr, cap // 2)
            if self._shrink_streak >= 20:
                if intr is None or (intr, cap // 2) in self._step_cache:
                    self.dup_bucket = cap // 2
                    self._shrink_streak = 0
                # else: hold at the current bucket until the prewarm
                # thread lands the executable
        else:
            self._shrink_streak = 0

    # ---- host loop ----
    def train_step(self, step: int) -> Dict[str, float]:
        self.data.update(step)
        intr = self.data.intrinsics()
        if getattr(self, "_last_intr", None) != intr:
            # reso switch: jump straight onto the bucket the milestone
            # prewarm predicted (and compiled) — staying on the old
            # bucket would immediately overflow and stall on a fresh
            # compile (round-4 c2f soak)
            cand = sorted(
                [b for (i2, b) in self._step_cache if i2 == intr]
                + [b for (i2, b) in self._prewarm_threads if i2 == intr])
            if cand and cand[0] > self.dup_bucket:
                self.dup_bucket = cand[0]
            self._last_intr = intr
        sched = {k: (jnp.int32(v) if isinstance(v, int) else jnp.float32(v))
                 for k, v in self.sched_scalars(step).items()}
        batches = [self.data.get_batch() for _ in range(self.cfg.grad_accum)]
        stacked = {k: jnp.asarray(np.stack([b[k] for b in batches]))
                   for k in batches[0]}
        fn = self._get_step_fn(intr)
        gfrozen = getattr(self.guidance, "frozen_params",
                          getattr(self.guidance, "params", {}))
        # move-penalty reference point: positions BEFORE the previous
        # optimizer update (a one-step trust region on mean)
        prev_mean = getattr(self, "_prev_mean", None)
        if prev_mean is None or prev_mean.shape != self.state.scene.params.mean.shape:
            prev_mean = self.state.scene.params.mean
        pre_step_mean = self.state.scene.params.mean
        self.state, metrics = fn(self.state, stacked, sched, gfrozen,
                                 prev_mean)
        self._prev_mean = pre_step_mean
        # bucket feedback only every 10 steps: int() forces a host sync,
        # which would otherwise serialize the async dispatch pipeline
        if self.cfg.auto_dup_bucket and step % 10 == 0:
            self._last_abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
                if hasattr(x, "shape") else x,
                (self.state, stacked, sched, gfrozen, prev_mean))
            n_dup = int(metrics["n_dup_max"])
            self._adjust_dup_bucket(n_dup, intr)
            # approaching the x2 growth trigger (0.7): compile ahead.
            # 0.35 leaves a full occupancy doubling of lead time — at
            # production densify cadence (period >= 1000 steps,
            # conf/base.yaml:153-163) that is hundreds of steps, far
            # beyond the ~35 s compile (BASELINE.md round-3 table)
            if n_dup > 0.35 * self.dup_bucket:
                self._prewarm_bucket(intr, self.dup_bucket * 2)
            # resolution milestones are KNOWN ahead of time: compile the
            # next reso's executable (and the bucket the duplicate count
            # will land in — footprints scale ~(r2/r1)²) before the
            # switch.  Round-4 c2f soak: each un-prewarmed reso switch
            # stalled ~30 s, plus another ~30 s when the first steps at
            # the new reso immediately overflowed the old bucket.
            nxt = self.data.next_reso_change(step)
            if nxt is not None and step >= nxt[0] - self.cfg.reso_prewarm_lead:
                m_step, next_reso = nxt
                cur_reso = self.data.reso
                intr_next = self.data.intrinsics(reso=next_reso)
                need = max(n_dup, 1) * (next_reso / max(cur_reso, 1)) ** 2
                b = self.cfg.dup_bucket_min
                while b < need:
                    b *= 2
                self._prewarm_bucket(intr_next, b)
                self._prewarm_bucket(intr_next, b * 2)
        return metrics

    def density_step(self, step: int) -> Dict[str, Any]:
        info = {}
        if should_run(step, self.dcfg.enabled, self.dcfg.warm_up,
                      self.dcfg.end, self.dcfg.period):
            key, k = jax.random.split(self.state.key)
            scene, opt, dinfo = self._densify_jit(
                self.state.scene, self.state.opt, self.dcfg, self.rcfg, k)
            # adam moments for bg are untouched (leading dims differ)
            self.state = self.state._replace(scene=scene, opt=opt, key=key)
            info.update({k_: int(v) for k_, v in dinfo.items()})
        if should_run(step, self.pcfg.enabled, self.pcfg.warm_up,
                      self.pcfg.end, self.pcfg.period):
            r2 = C(self.pcfg.radii2d_thresh, step)
            at = C(self.pcfg.alpha_thresh, step)
            scene, opt, pinfo = self._prune_jit(
                self.state.scene, self.state.opt, self.pcfg, self.rcfg,
                jnp.float32(r2), jnp.float32(at))
            self.state = self.state._replace(scene=scene, opt=opt)
            info.update({k_: int(v) for k_, v in pinfo.items()})
        return info

    def fit(self, n_steps: Optional[int] = None,
            callback: Optional[Callable[[int, Dict], None]] = None):
        """The train loop (trainer.py:576-621).

        ``n_steps`` runs that many MORE steps; default runs to
        ``cfg.max_steps`` TOTAL — a resumed trainer continues to the
        trajectory end, not for another full trajectory (reference
        train_loop iterates range(self.step, cfg.max_steps)).
        """
        start = int(self.state.step)
        n = (n_steps if n_steps is not None
             else max(self.cfg.max_steps - start, 0))
        eval_rng = np.random.default_rng(self.cfg.seed + 1)
        prof = self.cfg.profile_steps
        for step in range(start, start + n):
            if prof is not None and step == int(prof[0]):
                from ..utils import profiling
                logdir = (str(self.logger.dir / "profile")
                          if self.logger is not None else "profile")
                self._trace = profiling.trace(logdir)
                self._trace.__enter__()
            metrics = self.train_step(step)
            dinfo = self.density_step(step)
            if prof is not None and step + 1 == int(prof[1]) \
                    and getattr(self, "_trace", None) is not None:
                jax.block_until_ready(self.state.scene.params.mean)
                self._trace.__exit__(None, None, None)
                self._trace = None
            if callback is not None:
                callback(step, {**metrics, **dinfo})
            if self.logger is not None:
                self._periodic_logging(step, metrics, eval_rng)
        return self.state

    def _periodic_logging(self, step: int, metrics: Dict,
                          eval_rng: np.random.Generator):
        from .evaluation import eval_image, eval_video
        from ..io.checkpoint import save_checkpoint
        cfg = self.cfg
        log = self.logger
        if step % cfg.log_period == 0:
            m = {k: float(v) for k, v in metrics.items() if jnp.ndim(v) == 0}
            m["num_gaussians"] = int(num_active(self.state.scene))
            m.update({k: float(v) for k, v in self.sched_scalars(step).items()})
            log.log_scalars(step, m)
        if cfg.field_stats_period and step % cfg.field_stats_period == 0:
            from ..utils.profiling import field_stats
            p = self.state.scene.params
            log.log_scalars(step, field_stats(
                {f: getattr(p, f) for f in p._fields}))
        intr = self.data.intrinsics()
        if cfg.eval_image_period and step % cfg.eval_image_period == 0:
            img = eval_image(self.state.scene, intr, self.rcfg, eval_rng,
                             cfg.eval_elevation, cfg.eval_camera_distance)
            log.log_image(step, "eval/image", img)
        if cfg.eval_video_period and step % cfg.eval_video_period == 0 \
                and step > 0:
            frames = eval_video(self.state.scene, intr, self.rcfg,
                                cfg.eval_n_frames,
                                elevation=cfg.eval_elevation,
                                camera_distance=cfg.eval_camera_distance)
            log.log_video(step, "eval/orbit", frames)
        if cfg.guidance_eval_period and step % cfg.guidance_eval_period == 0 \
                and step > 0 and hasattr(self.guidance, "sample") \
                and self.prompt_processor is not None:
            img = self._guidance_sample(step)
            if img is not None:
                log.log_image(step, "eval/guidance_sample", img)
        if cfg.save_period and step % cfg.save_period == 0 and step > 0:
            save_checkpoint(log.ckpt_dir, step, self.state)

    def _guidance_sample(self, step: int):
        """One CFG sample from the guidance's scheduler at a front-ish
        eval pose (reference VSD sample()/sample_lora() visualization,
        stable_diffusion_vsd.py:540-676)."""
        import numpy as np
        emb = self.prompt_processor()
        key = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed + 7), step)
        el = jnp.asarray([15.0]); az = jnp.asarray([30.0])
        cd = jnp.asarray([2.5])
        gp = {"frozen": getattr(self.guidance, "frozen_params",
                                getattr(self.guidance, "params", {})),
              "train": self.state.gp}
        try:
            img = self.guidance.sample(gp, emb, el, az, cd, key,
                                       num_steps=self.cfg.guidance_eval_steps)
        except TypeError:
            return None
        return np.clip(np.asarray(img[0]), 0.0, 1.0)
