"""Shap-E decode-from-latent: latent -> NeRSTF weights -> SDF grid ->
mesh vertices + vertex colors.

JAX re-implementation of the reference's vendored shap-e decode path
(utils/shap_e_helper.py + shap_e/ in gsgen3d/gsgen's /root/reference):

* ``bottleneck_to_params``: the 1024x1024 latent is a stack of
  "parameter vectors"; each NeRSTF MLP tensor is produced by a
  per-tensor channels projection ``einsum('vd,vcd->vc')`` (+ optional
  LayerNorm / learned gain) over its slice of latent rows
  (shap_e/models/transmitter/params_proj.py:93-176, base.py:176-199),
* the NeRSTF meta-MLP: NeRF positional encoding (encoding.py:200-214)
  -> relu MLP whose weights come from the latent; output heads
  (sdf / density / stf channels) per the direction-dependent index
  mapping (nerstf/mlp.py:118-165); directions are zero-encoded when
  absent (encoding.py:180-194, decode_latent_mesh passes none),
* mesh extraction: SDF on a ``grid_size**3`` lattice over the bounding
  volume, a -1 border to close surfaces, marching cubes, then the
  texture head queried at the vertices, sigmoid + sRGB->linear
  (stf/renderer.py:170-268).  Marching cubes runs on this framework's
  native C++ extension (marching tetrahedra — same zero level set,
  different triangulation than shap-e's mc.py; only vertices/colors
  are consumed for Gaussian init, utils/initialize.py:170-228).

The exact architecture hyperparameters live in shap-e's DOWNLOADED
config yamls (not vendored in the reference), so everything here is
INFERRED from the checkpoint state dict at load time: projection
shapes give each meta tensor's geometry, the MLP layer chain gives
widths, presence of norm/gain keys selects the projection variant.
Text-conditioned latent GENERATION (text300M) reuses the generic
karras/heun sampler from :mod:`.point_e_sampler` — the shap-e sampling
stack is the same k-diffusion code (shap_e/diffusion/k_diffusion.py ==
point_e/diffusion/k_diffusion.py).
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SDF_ACT = "tanh"


def posenc_nerf(x: jax.Array, min_deg: int = 0, max_deg: int = 15
                ) -> jax.Array:
    """[x | sin(x*2^k) | sin(x*2^k + pi/2)] (encoding.py:200-214)."""
    if min_deg == max_deg:
        return x
    scales = 2.0 ** jnp.arange(min_deg, max_deg, dtype=x.dtype)
    xb = (x[..., None, :] * scales[:, None]).reshape(*x.shape[:-1], -1)
    emb = jnp.sin(jnp.concatenate([xb, xb + math.pi / 2.0], axis=-1))
    return jnp.concatenate([x, emb], axis=-1)


def posenc_v1(x: jax.Array) -> jax.Array:
    """[cos(x*2^k) | sin(x*2^k)] interleaved per scalar (encoding.py:9-13)."""
    freqs = 2.0 ** jnp.arange(0, 10, dtype=x.dtype)
    f = x.reshape(-1, 1) * freqs[None]
    out = jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=1)
    return out.reshape(*x.shape[:-1], -1)


_POSENC = {"nerf": posenc_nerf, "v1": posenc_v1}
_DIR_DIM = {"nerf": lambda: posenc_nerf(jnp.zeros((1, 3)), 0, 8).shape[-1],
            "v1": lambda: 16}


@dataclasses.dataclass
class ShapEProjection:
    """One meta-tensor's channels projection (params_proj.py:93-136)."""

    weight: np.ndarray          # [vectors, channels, d_latent]
    bias: np.ndarray            # [vectors, channels]
    shape: Tuple[int, ...]      # final tensor shape
    ln_scale: Optional[np.ndarray] = None   # use_ln variant
    ln_bias: Optional[np.ndarray] = None
    gain: Optional[np.ndarray] = None       # learned_scale variant

    def __call__(self, x_vd: jax.Array) -> jax.Array:
        h = jnp.einsum("vd,vcd->vc", x_vd, self.weight)
        if self.ln_scale is not None:
            mu = jnp.mean(h, axis=-1, keepdims=True)
            var = jnp.var(h, axis=-1, keepdims=True)
            h = (h - mu) / jnp.sqrt(var + 1e-5)
            h = h * self.ln_scale + self.ln_bias
        elif self.gain is not None:
            h = h * self.gain[None, :]
        return (h + self.bias).reshape(self.shape)


@dataclasses.dataclass
class ShapEDecoder:
    """The transmitter/vector-decoder decode path, checkpoint-driven."""

    projections: Dict[str, ShapEProjection]     # meta-tensor name -> proj
    direct: Dict[str, np.ndarray]               # non-meta renderer params
    layer_dims: List[Tuple[int, int]]           # (d_in, d_out) per layer
    d_latent: int
    latent_ctx: int
    posenc_version: str = "nerf"
    insert_direction_at: Optional[int] = None
    latent_warp: str = "identity"               # identity | tan2
    n_output: int = 5        # sdf(1) + density(1) + stf channels(3)
    bbox: float = 1.0        # BoundingBoxVolume half-side

    # ------------------------------------------------------------------
    @classmethod
    def from_state_dict(cls, state: Dict[str, np.ndarray],
                        posenc_version: str = "nerf",
                        latent_warp: str = "identity",
                        bbox: float = 1.0) -> "ShapEDecoder":
        """Parse a shap-e transmitter / vector_decoder torch state dict.

        Keys matched anywhere in the tree:
          *params_proj.projections.<name>.proj.{weight,bias}
          *params_proj.projections.<name>.{norm.{weight,bias} | gain}
          *renderer.*mlp.{i}.{weight,bias}     (non-meta layers)
        Sanitized names use ``__`` for ``.`` (params_proj.py:199).
        """
        state = {k: np.asarray(v) for k, v in state.items()}
        proj_re = re.compile(
            r"params_proj\.projections\.([A-Za-z0-9_]+)\.(proj\.weight|"
            r"proj\.bias|norm\.weight|norm\.bias|gain)$")
        # INSERTION order matters: the latent rows are sliced per tensor
        # in param_shapes order == the checkpoint's key order
        # (ChannelsParamsProj.forward, params_proj.py:166-174)
        groups: Dict[str, Dict[str, np.ndarray]] = {}
        for k, v in state.items():
            m = proj_re.search(k)
            if m:
                groups.setdefault(m.group(1), {})[m.group(2)] = v
        if not groups:
            raise ValueError(
                "no params_proj.projections.* keys found — not a shap-e "
                f"transmitter/decoder checkpoint ({len(state)} keys)")

        # meta tensor shapes: mlp.{i}.weight is [out, in]; bias [out].
        # channels = last dim, vectors = prod/channels
        # (flatten_param_shapes, params_proj.py:13-18)
        projections: Dict[str, ShapEProjection] = {}
        order: List[str] = []
        layer_w: Dict[int, Tuple[int, int]] = {}
        d_latent = None
        for name_s, g in groups.items():
            full = name_s.replace("__", ".")
            m = re.search(r"(mlp\.(\d+)\.(weight|bias))$", full)
            if m is None:
                raise ValueError(f"unrecognized meta tensor {full!r}")
            # canonical key: strip the submodel prefix (nerstf./sdf./tf.)
            name = m.group(1)
            pw = g["proj.weight"]                     # [v*c, d_latent]
            pb = g["proj.bias"]
            d_latent = pw.shape[1]
            li, kind = int(m.group(2)), m.group(3)
            order.append(name)
            if kind == "weight":
                # weight [out, in] flattens to (vectors=out, channels=in)
                # (flatten_param_shapes); resolved in the second pass
                # once the layer's bias has fixed `out`
                groups[name_s]["_total"] = pw.shape[0]
            else:
                # bias [out] flattens to (vectors=1, channels=out)
                out = pw.shape[0]
                projections[name] = ShapEProjection(
                    weight=pw.reshape(1, out, d_latent),
                    bias=pb.reshape(1, out), shape=(out,),
                    ln_scale=g.get("norm.weight"), ln_bias=g.get("norm.bias"),
                    gain=g.get("gain"))
                layer_w[li] = (layer_w.get(li, (None, None))[0], out)

        # second pass: weight tensors need (out, in); out comes from the
        # bias of the same layer (always meta together in released ckpts)
        for name_s, g in groups.items():
            full = name_s.replace("__", ".")
            m = re.search(r"(mlp\.(\d+)\.weight)$", full)
            if m is None:
                continue
            name = m.group(1)
            li = int(m.group(2))
            total = g["_total"]
            out = layer_w[li][1]
            assert out is not None and total % out == 0, (name, total, out)
            inn = total // out
            layer_w[li] = (inn, out)
            pw, pb = g["proj.weight"], g["proj.bias"]
            projections[name] = ShapEProjection(
                weight=pw.reshape(out, inn, d_latent),
                bias=pb.reshape(out, inn),
                shape=(out, inn),
                ln_scale=g.get("norm.weight"), ln_bias=g.get("norm.bias"),
                gain=g.get("gain"))

        # restore checkpoint ordering for the latent row slicing
        projections = {n: projections[n] for n in order}

        # non-meta renderer MLP layers (plain weights in the checkpoint)
        direct: Dict[str, np.ndarray] = {}
        for k, v in state.items():
            m = re.search(r"renderer\..*?(mlp\.\d+\.(?:weight|bias))$", k)
            if m and "params_proj" not in k:
                direct[m.group(1)] = v
                lm = re.search(r"mlp\.(\d+)\.weight$", k)
                if lm:
                    layer_w[int(lm.group(1))] = (v.shape[1], v.shape[0])

        n_layers = max(layer_w) + 1
        layer_dims = [layer_w[i] for i in range(n_layers)]
        latent_ctx = sum(
            int(np.prod(p.shape)) // p.shape[-1]
            for n, p in projections.items())
        n_output = layer_dims[-1][1]
        return cls(projections=projections, direct=direct,
                   layer_dims=layer_dims, d_latent=d_latent,
                   latent_ctx=latent_ctx, posenc_version=posenc_version,
                   insert_direction_at=cls._infer_direction_slot(
                       layer_dims, posenc_version),
                   latent_warp=latent_warp, n_output=n_output, bbox=bbox)

    @staticmethod
    def _infer_direction_slot(layer_dims, posenc_version):
        """A layer whose d_in exceeds the previous d_out by the direction
        encoding width takes the concatenated direction."""
        d_dir = int(_DIR_DIM[posenc_version]())
        for i in range(1, len(layer_dims)):
            if layer_dims[i][0] == layer_dims[i - 1][1] + d_dir:
                return i
        return None

    # ------------------------------------------------------------------
    def unwarp(self, latent: jax.Array) -> jax.Array:
        if self.latent_warp == "tan2":
            scale = np.tan(np.tan(1.0))
            return jnp.arctan(jnp.arctan(latent * scale))
        return latent

    def mlp_params(self, latent: jax.Array) -> Dict[str, jax.Array]:
        """latent [latent_ctx * d_latent] (or [ctx, d]) -> tensor dict
        (ChannelsDecoder.bottleneck_to_params, base.py:192-199)."""
        x = self.unwarp(latent).reshape(self.latent_ctx, self.d_latent)
        out = dict(self.direct)
        start = 0
        for name, proj in self.projections.items():
            v = int(np.prod(proj.shape)) // proj.shape[-1]
            out[name] = proj(x[start:start + v])
            start += v
        return out

    def query(self, params: Dict[str, jax.Array], pos: jax.Array
              ) -> Dict[str, jax.Array]:
        """NeRSTF query at [Q, 3] positions, no direction (stf mode,
        render_with_direction=False): direction channels zero-filled."""
        h = _POSENC[self.posenc_version](pos)
        n = len(self.layer_dims)
        for i in range(n):
            if i == self.insert_direction_at:
                d_dir = int(_DIR_DIM[self.posenc_version]())
                h = jnp.concatenate(
                    [h, jnp.zeros(h.shape[:-1] + (d_dir,), h.dtype)], -1)
            w = params[f"mlp.{i}.weight"]
            b = params[f"mlp.{i}.bias"]
            h = h @ w.T + b
            if i < n - 1:
                h = jax.nn.relu(h)
        # direction-dependent-shape head map (nerstf/mlp.py:127-146):
        # sdf (0:1), density (1:2), stf channels (2:5)
        return {
            "sdf": jnp.tanh(h[..., 0:1]),
            "density": jnp.exp(h[..., 1:2]),
            "channels": jax.nn.sigmoid(h[..., 2:5]),
        }

    # ------------------------------------------------------------------
    def decode_mesh(self, latent, grid_size: int = 128,
                    query_batch: int = 65536, output_srgb: bool = True
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """latent -> (verts [V, 3], rgb [V, 3] in [0, 1]) — the
        decode_latent_mesh path (stf/renderer.py:170-268)."""
        from ..native.mcubes import marching_cubes

        params = self.mlp_params(jnp.asarray(latent))
        lo, hi = -self.bbox, self.bbox
        idx = np.arange(grid_size, dtype=np.float32)
        coords = lo + idx / (grid_size - 1) * (hi - lo)
        xs, ys, zs = np.meshgrid(coords, coords, coords, indexing="ij")
        pts = np.stack([xs, ys, zs], axis=-1).reshape(-1, 3)

        qfn = jax.jit(lambda p: self.query(params, p)["sdf"][..., 0])
        sdf = np.concatenate([
            np.asarray(qfn(jnp.asarray(pts[i:i + query_batch])))
            for i in range(0, pts.shape[0], query_batch)])
        field = sdf.reshape(grid_size, grid_size, grid_size)
        # -1 border closes all surfaces (stf/renderer.py:201-210)
        full = np.full((grid_size + 2,) * 3, -1.0, np.float32)
        full[1:-1, 1:-1, 1:-1] = field
        verts, faces = marching_cubes(full, 0.0)
        if verts.shape[0] == 0:
            return (np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.float32))
        # grid-index -> world: the reference SQUEEZES the padded grid
        # onto the bbox — index range [0, grid+1] -> [lo, hi]
        # (shap_e/rendering/mc.py:114-115) — mirror it exactly
        verts_w = verts / (grid_size + 1) * (hi - lo) + lo

        cfn = jax.jit(lambda p: self.query(params, p)["channels"])
        rgb = np.concatenate([
            np.asarray(cfn(jnp.asarray(verts_w[i:i + query_batch])))
            for i in range(0, verts_w.shape[0], query_batch)])
        if output_srgb:
            rgb = np.where(rgb <= 0.04045, rgb / 12.92,
                           ((rgb + 0.055) / 1.055) ** 2.4)
        return verts_w.astype(np.float32), rgb.astype(np.float32)


# ---------------------------------------------------------------------------
# text -> latent (text300M) via the shared karras sampler
# ---------------------------------------------------------------------------


def text300m_config_from_state(state: Dict[str, np.ndarray]):
    """Infer the text300M transformer geometry from its checkpoint
    (the config yaml is a download, not vendored): the model is the
    same CLIP-textvec point-diffusion transformer family as point-e
    (shap_e/models/generation/transformer.py) over latent rows."""
    from ..guidance.point_e import PointEConfig
    w_in = np.asarray(state["input_proj.weight"])     # [width, C_in]
    w_out = np.asarray(state["output_proj.weight"])   # [C_out, width]
    clip_w = np.asarray(state["clip_embed.weight"])   # [width, F]
    layers = 1 + max(int(m.group(1)) for k in state
                     if (m := re.match(r"backbone\.resblocks\.(\d+)\.", k)))
    width = w_in.shape[0]
    # head COUNT is not recoverable from tensor shapes (attention is
    # head-agnostic in the fused qkv layout); 64-wide heads are the
    # family convention (point_e/models/configs.py widths/heads)
    heads = max(1, width // 64)
    return PointEConfig(
        input_channels=w_in.shape[1], output_channels=w_out.shape[0],
        n_ctx=1024, width=width, layers=layers, heads=heads,
        clip_feature_dim=clip_w.shape[1])


def sample_shap_e_latent(base_weights, textvec, key,
                         karras_steps: int = 64, guidance_scale: float = 15.0,
                         sigma_min: float = 1e-3, sigma_max: float = 160.0,
                         cfg=None) -> jax.Array:
    """Text -> shap-e latent via karras/heun sampling
    (utils/shap_e_helper.py:17-42: 64 steps, CFG 15, sigma 1e-3..160,
    churn 0).  ``base_weights``: text300M state dict / safetensors path.
    Returns the flattened latent [latent_ctx * d_latent]."""
    from ..guidance.convert import load_safetensors
    from ..guidance.point_e import PointEModel
    from .point_e_sampler import make_stage_sampler

    state = (load_safetensors(base_weights)
             if isinstance(base_weights, str) else base_weights)
    state = {k: v for k, v in state.items() if not k.startswith("clip.")}
    mcfg = cfg or text300m_config_from_state(state)
    model = PointEModel(mcfg)
    model.load_weights(state)

    sample, smax = make_stage_sampler(
        lambda p, x, t, cond=None, low_res=None:
            model.apply(p, x, t, cond=cond),
        karras_steps, sigma_min, sigma_max, 0.0, guidance_scale,
        "cosine", 1024, mcfg.input_channels)
    if textvec is None:
        textvec = jnp.zeros((1, mcfg.clip_feature_dim))
    if textvec.ndim == 1:
        textvec = textvec[None]
    cond2 = jnp.concatenate([textvec, jnp.zeros_like(textvec)], axis=0)
    k0, k1 = jax.random.split(key)
    x_T = jax.random.normal(
        k0, (1, mcfg.input_channels, mcfg.n_ctx)) * smax
    # shap-e latents: x IS the latent (channels-first rows == latent
    # vectors); no channel scale/bias in the shap-e diffusion config
    lat = sample(model.params, x_T, cond2, None, k1)
    return lat[0].T.reshape(-1)
