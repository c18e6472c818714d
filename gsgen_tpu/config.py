"""Config system: YAML tree -> typed dataclass configs -> Trainer.

Replaces the reference's hydra/OmegaConf stack (conf/ tree,
utils/misc.py C() specs — see gsgen_tpu.utils.schedule) with plain YAML
+ dataclasses: ``load_config`` reads a YAML file, applies dotted-path
CLI overrides (``prompt.prompt="a corgi"`` — same UX as hydra,
main.py:10-33 in gsgen3d/gsgen), and ``build_trainer`` wires every
subsystem.  ``C()`` schedule specs pass through as lists untouched.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml

from .data.cameras import CameraSamplerConfig
from .guidance.mock import MockGuidance
from .guidance.sds import SDSConfig, SDSGuidance
from .models.background import BackgroundConfig
from .models.density import DensifyConfig, PruneConfig
from .models.init import InitConfig
from .models.scene import RenderConfig
from .prompt.processors import PromptProcessor, PromptProcessorConfig
from .training.trainer import LossConfig, Trainer, TrainerConfig


def _field_default(f: dataclasses.Field):
    if f.default is not dataclasses.MISSING:
        return f.default
    if f.default_factory is not dataclasses.MISSING:
        return f.default_factory()
    return None


def _from_dict(cls, d: Optional[Dict]) -> Any:
    """Build dataclass ``cls`` from a dict, recursing into dataclass
    fields; unknown keys are an error (catches config typos).  Lists
    become tuples where the field default is a tuple (frozen/static
    configs must stay hashable for jit)."""
    d = dict(d or {})
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(d) - set(fields)
    if unknown:
        raise KeyError(f"unknown {cls.__name__} keys: {sorted(unknown)}")
    kwargs = {}
    for name, val in d.items():
        default = _field_default(fields[name])
        if dataclasses.is_dataclass(default) and isinstance(val, dict):
            kwargs[name] = _from_dict(type(default), val)
        elif isinstance(val, list) and isinstance(default, tuple):
            kwargs[name] = tuple(tuple(v) if isinstance(v, list) else v
                                 for v in val)
        else:
            kwargs[name] = val
    return cls(**kwargs)


def set_dotted(d: Dict, key: str, value):
    parts = key.split(".")
    cur = d
    for p in parts[:-1]:
        cur = cur.setdefault(p, {})
    cur[parts[-1]] = value


def parse_override(s: str):
    """key=value with YAML-typed value (hydra-style CLI override)."""
    key, _, raw = s.partition("=")
    return key, yaml.safe_load(raw)


def deep_merge(base: Dict, over: Dict) -> Dict:
    """Recursive dict merge; ``over`` wins, nested dicts merge."""
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _resolve_include(name: str, rel_to: Path) -> Path:
    """An include names another config: relative to the including file's
    directory first, then the configs root (the including file's nearest
    ancestor named ``configs``); ``.yaml`` is appended if missing."""
    cand = [name] if name.endswith(".yaml") else [name + ".yaml"]
    roots = [rel_to]
    for p in rel_to.parents:
        if p.name == "configs":
            roots.append(p)
            break
    else:
        roots.append(rel_to.parent if rel_to.name != "configs" else rel_to)
    # user configs living OUTSIDE the tree (e.g. generated sweep/test
    # yamls) still compose against the working directory's library
    roots.append(Path.cwd() / "configs")
    for root in roots:
        for c in cand:
            p = root / c
            if p.exists():
                return p
    raise FileNotFoundError(
        f"include '{name}' not found under {[str(r) for r in roots]}")


def _load_yaml_tree(path: Path, _seen=None) -> Dict:
    """Load one YAML file, recursively resolving its ``include:`` list
    (the composition analog of the reference's hydra defaults list,
    conf/base.yaml + # @package headers): includes merge in order, the
    file's own keys override them."""
    _seen = set() if _seen is None else _seen
    path = path.resolve()
    if path in _seen:
        raise ValueError(f"include cycle through {path}")
    _seen.add(path)
    cfg = yaml.safe_load(path.read_text()) or {}
    includes = cfg.pop("include", None) or []
    if isinstance(includes, str):
        includes = [includes]
    merged: Dict = {}
    for inc in includes:
        merged = deep_merge(merged,
                            _load_yaml_tree(_resolve_include(inc, path.parent),
                                            _seen=set(_seen)))
    return deep_merge(merged, cfg)


def load_config(path: str | Path, overrides: Optional[List[str]] = None
                ) -> Dict:
    cfg = _load_yaml_tree(Path(path))
    for ov in overrides or []:
        k, v = parse_override(ov)
        set_dotted(cfg, k, v)
    return cfg


def _build_prompt_processor(prompt_d: Dict) -> PromptProcessor:
    """PromptProcessor with a real CLIP/T5 encoder when prompt.model_id
    points at a local model dir (mock embeddings otherwise)."""
    pcfg = _from_dict(PromptProcessorConfig, prompt_d)
    from .prompt.encoders import build_encode_fn
    return PromptProcessor(pcfg, encode_fn=build_encode_fn(pcfg.model_id))


def _build_backbone(g_d: Dict, vsd: Optional[Dict] = None):
    """Pop backbone config keys; None means MockUNet default.

    ``vsd`` (lora_rank, camera_condition_dim) upgrades the UNet preset
    with attention-LoRA adapters + a camera class embedding — the
    reference attaches LoRAAttnProcessor + TimestepEmbedding(16, 1280)
    to unet_lora (stable_diffusion_vsd.py:145-179)."""
    kind = g_d.pop("backbone", "mock")
    preset = g_d.pop("backbone_preset", "tiny")
    weights = g_d.pop("weights_path", None)
    # bf16 halves the frozen score network's time on TPU (the reference
    # pipeline runs fp16, stable_diffusion.py:76); fp32 stays default
    dtype = g_d.pop("backbone_dtype", None)
    # attention core: "auto" (fused flash kernel at the 4096-token
    # level on TPU) | "on" | "off" — see unet2d.set_fused_attention
    fused_attn = g_d.pop("fused_attention", None)
    if fused_attn is not None:
        from .guidance.unet2d import set_fused_attention
        set_fused_attention(str(fused_attn))
    if kind == "mock":
        return None
    if kind == "sd_unet":
        from .guidance.sd_unet import (IF_PIXEL, SD15, SD21, TINY,
                                       SDUNetBackbone,
                                       load_diffusers_weights)
        cfg = {"tiny": TINY, "sd15": SD15, "sd21": SD21,
               "if_pixel": IF_PIXEL}[preset]
        if vsd:
            cfg = dataclasses.replace(
                cfg, lora_rank=int(vsd.get("lora_rank", 4)),
                class_embed_proj_dim=int(
                    vsd.get("camera_condition_dim", 16)))
        latent = 8 if preset == "tiny" else 64
        use_vae = preset != "if_pixel"
        if weights:
            return load_diffusers_weights(weights, cfg, latent_size=latent,
                                          use_vae=use_vae,
                                          compute_dtype=dtype)
        return SDUNetBackbone(cfg, latent_size=latent, use_vae=use_vae,
                              compute_dtype=dtype)
    raise NotImplementedError(f"backbone {kind}")


def build_trainer(cfg: Dict, logger=None) -> Trainer:
    rcfg_d = dict(cfg.get("renderer", {}))
    dcfg_d = rcfg_d.pop("densify", {})
    pcfg_d = rcfg_d.pop("prune", {})
    bg_d = rcfg_d.pop("background", {})
    # the reference nests the alpha/compat penalty under renderer
    # (conf/renderer/*.yaml "penalty:"); route it to the trainer's
    # penalty config so presets mirror 1:1
    renderer_penalty = rcfg_d.pop("penalty", None)
    rcfg = _from_dict(RenderConfig, rcfg_d)
    dcfg = _from_dict(DensifyConfig, dcfg_d)
    pcfg = _from_dict(PruneConfig, pcfg_d)
    bg_cfg = _from_dict(BackgroundConfig, bg_d)

    tr_d = dict(cfg.get("trainer", {}))
    loss_d = tr_d.pop("loss", {})
    # reference keeps estimators at the top level (conf/base.yaml
    # estimators.depth/normal with enabled/value); accept both spots
    if "estimators" in cfg:
        tr_d.setdefault("estimators", cfg["estimators"])
    tcfg = _from_dict(TrainerConfig, tr_d)
    tcfg = dataclasses.replace(tcfg, loss=_from_dict(LossConfig, loss_d))
    if renderer_penalty is not None:
        tcfg = dataclasses.replace(tcfg, penalty=renderer_penalty)

    data_d = dict(cfg.get("data", {}))
    data_d.setdefault("batch_size", tcfg.batch_size)
    data_d.setdefault("max_steps", tcfg.max_steps)
    data_cfg = _from_dict(CameraSamplerConfig, data_d)

    # prior-specific init keys (checkpoint paths, sampler knobs) ride the
    # same `init:` block as the reference's conf/base.yaml but are not
    # InitConfig fields — split them off before the typo check
    _INIT_PASSTHROUGH = {
        "z_scale", "random_exceed", "seed", "point_e_base",
        "point_e_upsample", "clip_model_dir", "karras_steps",
        "shap_e_decoder", "shap_e_text300m", "shap_e_latent", "grid_size",
        "mesh", "flip_yz", "flip_xy", "ckpt_path", "image",
        "point_e_image_base", "clip_vision_dir"}
    init_d = dict(cfg.get("init", {}))
    init_extra = {k: init_d.pop(k) for k in list(init_d)
                  if k in _INIT_PASSTHROUGH}
    init_cfg = _from_dict(InitConfig, init_d)

    prompt_d = dict(cfg.get("prompt", {}))
    g_d = dict(cfg.get("guidance", {}))
    g_type = g_d.pop("type", "mock")
    prompt_processor = None
    if g_type == "mock":
        # a CLI override guidance.type=mock on a diffusion config leaves
        # sds-only keys behind; ignore anything MockGuidance doesn't take
        import inspect
        accepted = set(
            inspect.signature(MockGuidance.__init__).parameters) - {"self"}
        guidance = MockGuidance(
            **{k: v for k, v in g_d.items() if k in accepted})
    elif g_type in ("sds", "deep_floyd", "if"):
        prompt_processor = _build_prompt_processor(prompt_d)
        if g_type in ("deep_floyd", "if"):
            # DeepFloyd runs SDS in PIXEL space at 64^2 with CFG 20
            # (reference guidance/deep_floyd.py:25-120, conf/guidance/if.yaml)
            g_d.setdefault("rgb_as_latents", True)
            g_d.setdefault("guidance_scale", 20.0)
        backbone = _build_backbone(g_d)
        scfg = _from_dict(SDSConfig, g_d)
        guidance = SDSGuidance(scfg, backbone)
    elif g_type == "vsd":
        from .guidance.vsd import VSDConfig, VSDGuidance
        prompt_processor = _build_prompt_processor(prompt_d)
        backbone = _build_backbone(
            g_d, vsd={"lora_rank": g_d.get("lora_rank", 4),
                      "camera_condition_dim":
                          g_d.get("camera_condition_dim", 16)})
        guidance = VSDGuidance(_from_dict(VSDConfig, g_d), backbone)
    else:
        raise NotImplementedError(f"guidance type {g_type}")

    # auxiliary point-cloud guidance (reference conf/base.yaml:176-190,
    # aux_guidance_step trainer.py:458-466)
    aux_guidance = None
    aux_d = dict(cfg.get("auxiliary", {}))
    if aux_d.pop("enabled", False):
        from .guidance.point_e_aux import PointEAuxConfig, PointEAuxGuidance
        aux_type = aux_d.pop("type", "point_e")
        if aux_type != "point_e":
            raise NotImplementedError(f"auxiliary type {aux_type}")
        clip_dir = aux_d.pop("clip_model_id", None)
        acfg = _from_dict(PointEAuxConfig, aux_d)
        cond_vec = None
        if clip_dir:
            import jax.numpy as _jnp
            from .prompt.encoders import build_clip_textvec_fn
            cond_vec = _jnp.asarray(build_clip_textvec_fn(clip_dir)(
                [prompt_d.get("prompt", "")])[0])
        aux_guidance = PointEAuxGuidance(acfg, cond_vec=cond_vec)

    init_points = init_colors = init_raw = None
    if init_cfg.type == "point_cloud":
        from .priors import load_point_cloud
        init_points, init_colors = load_point_cloud(cfg["init_asset"])
    elif init_cfg.type == "mesh":
        # area-weighted even surface sampling (reference
        # mesh_initlization, utils/initialize.py:285-333)
        from .priors import mesh_init_arrays
        init_points, init_colors = mesh_init_arrays(
            init_extra["mesh"], num_points=init_cfg.num_points,
            mean_std=init_cfg.mean_std,
            flip_yz=init_extra.get("flip_yz", False),
            flip_xy=init_extra.get("flip_xy", False),
            seed=init_extra.get("seed", 0))
        init_cfg = dataclasses.replace(init_cfg, type="point_cloud")
    elif init_cfg.type == "ckpt":
        # fresh-run init from a trained scene's raw params (reference
        # from_ckpt, utils/initialize.py:335-356) — NOT full resume
        from .io.checkpoint import scene_arrays_from_checkpoint
        init_raw = scene_arrays_from_checkpoint(init_extra["ckpt_path"])
    elif init_cfg.type == "point_e_image":
        # image-conditioned Point-E (reference point_e_image_initialize,
        # utils/initialize.py:410-439): grid-conditioned base +
        # upsampler, CFG 3.0 both stages
        from .priors import point_e_image_init_arrays
        image = init_extra.get("image") or (cfg.get("image") or {}).get(
            "path")
        assert image, "init.type=point_e_image needs init.image (or " \
            "image.path for the sit3d mode)"
        init_points, init_colors = point_e_image_init_arrays(
            image, num_points=init_cfg.num_points,
            mean_std=init_cfg.mean_std, facex=init_cfg.facex,
            seed=init_extra.get("seed", 0),
            base_weights=init_extra.get("point_e_image_base"),
            upsample_weights=init_extra.get("point_e_upsample"),
            clip_model_dir=init_extra.get("clip_vision_dir"),
            karras_steps=tuple(init_extra.get("karras_steps", (64, 64))))
        # facex already applied to the arrays; don't re-rotate
        init_cfg = dataclasses.replace(init_cfg, type="point_cloud",
                                       facex=False)
    elif init_cfg.type in ("point_e", "shap_e"):
        # generative 3D prior at trainer init (reference
        # utils/initialize.py:110-228): asset cache or the in-process
        # two-stage point-e diffusion sampler
        init_d = dict(init_extra)
        prompt_text = cfg.get("prompt", {}).get("prompt", "")
        if init_cfg.type == "point_e":
            from .priors import point_e_init_arrays
            init_points, init_colors = point_e_init_arrays(
                prompt_text, num_points=init_cfg.num_points,
                mean_std=init_cfg.mean_std,
                z_scale=init_d.get("z_scale", 1.0),
                random_exceed=init_d.get("random_exceed", False),
                seed=init_d.get("seed", 0),
                base_weights=init_d.get("point_e_base"),
                upsample_weights=init_d.get("point_e_upsample"),
                clip_model_dir=init_d.get("clip_model_dir"),
                karras_steps=tuple(init_d.get("karras_steps", (64, 64))))
        else:
            from .priors import shap_e_init_arrays
            init_points, init_colors = shap_e_init_arrays(
                prompt_text, num_points=init_cfg.num_points,
                mean_std=init_cfg.mean_std,
                z_scale=init_d.get("z_scale", 1.0),
                seed=init_d.get("seed", 0),
                decoder_weights=init_d.get("shap_e_decoder"),
                text_model_weights=init_d.get("shap_e_text300m"),
                latent_path=init_d.get("shap_e_latent"),
                clip_model_dir=init_d.get("clip_model_dir"),
                grid_size=init_d.get("grid_size", 128))
        if cfg.get("init", {}).get("random_color", False):
            init_colors = None       # fall through to random colors
        init_cfg = dataclasses.replace(init_cfg, type="point_cloud")

    # image-to-3D: image.path (+ optional depth/mask .npy) switches to a
    # single-view sampler, image init with frozen front points, and the
    # original-view photometric losses (reference sit3d mode)
    extra = {}
    img_d = cfg.get("image")
    # an image: block without a path (e.g. the data/sit3d preset's
    # original_view_prob default) configures but does not ACTIVATE the
    # image-to-3D mode
    if img_d and not img_d.get("path"):
        img_d = None
    if img_d:
        import dataclasses as _dc
        import jax
        import jax.numpy as jnp
        import numpy as np
        from .data.cameras import SingleViewCameraPoseProvider
        from .ops.camera import CameraIntrinsics
        from .training.sit3d import ImageTarget, image_initialize
        import imageio.v2 as imageio
        rgba = np.asarray(imageio.imread(img_d["path"])).astype(np.float32) / 255.0
        if rgba.shape[-1] != 4 and img_d.get("auto_matte", True):
            # the reference expects inputs pre-matted by rembg
            # (utils/background_removal.py); for RGB inputs the in-repo
            # classical matte estimates alpha (utils/matting.py) —
            # disable with image.auto_matte=false to treat all pixels
            # as foreground
            from .utils.matting import ensure_rgba
            rgba = ensure_rgba(rgba)
        rgb = rgba[..., :3]
        mask = (rgba[..., 3] > 0.5 if rgba.shape[-1] == 4
                else np.ones(rgba.shape[:2], bool))
        if img_d.get("depth"):
            depth = np.load(img_d["depth"]).astype(np.float32)
        elif img_d.get("dpt_checkpoint"):
            # reference trainer.py:137-146: DPT monocular depth,
            # recentered on the foreground mean, scaled, shifted to the
            # camera distance
            from .priors.dpt import DPTEstimator
            est = DPTEstimator.from_checkpoint(img_d["dpt_checkpoint"],
                                               mode="depth")
            d = np.asarray(est(jnp.asarray(rgb)[None])[0, ..., 0])
            depth = ((d - d[mask].mean())
                     * float(img_d.get("depth_scale", 100.0))
                     + float(img_d.get("distance", 2.5))).astype(np.float32)
        else:
            depth = np.full(rgb.shape[:2],
                            float(img_d.get("default_depth", 2.5)), np.float32)
        target = ImageTarget(image=jnp.asarray(rgb), depth=jnp.asarray(depth),
                             mask=jnp.asarray(mask))
        reso = rgb.shape[0]
        intr = CameraIntrinsics.from_reso(reso)
        c2w = jnp.asarray(np.array(
            [[0, 0, -1, float(img_d.get("distance", 2.5))],
             [1, 0, 0, 0], [0, -1, 0, 0]], np.float32))  # front view (+x cam)
        state, gmask = image_initialize(
            jax.random.PRNGKey(tcfg.seed), init_cfg, rcfg, target, intr, c2w,
            grad_mask=img_d.get("grad_mask", True))
        extra = dict(image_target=target, grad_mask=gmask,
                     mask_steps=tuple(img_d.get("mask_steps", (0, 1000))))

    trainer = Trainer(cfg=tcfg, rcfg=rcfg, init_cfg=init_cfg, bg_cfg=bg_cfg,
                      data_cfg=data_cfg, guidance=guidance, dcfg=dcfg,
                      pcfg=pcfg, init_points=init_points,
                      init_colors=init_colors, init_raw=init_raw,
                      aux_guidance=aux_guidance,
                      prompt_processor=prompt_processor, logger=logger,
                      **extra)
    if img_d:
        trainer.state = trainer.state._replace(scene=state)
        trainer.data = SingleViewCameraPoseProvider(
            data_cfg, seed=tcfg.seed,
            original_view_prob=float(img_d.get("original_view_prob", 0.5)))
    return trainer
