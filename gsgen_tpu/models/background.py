"""Background models: random / fixed / learned-const / SH-encoded MLP.

Functional JAX re-design of the reference backgrounds
(gs/backgrounds.py:13-114 in gsgen3d/gsgen).  Each background is a
``(init_fn, apply_fn)`` pair: ``init(key, cfg) -> params-pytree`` (empty
dict when nothing is learnable) and
``apply(params, dirs, key, training) -> bg`` returning either a
constant color [3] or a full image [H, W, 3] — both accepted by
``render_view``.

The MLP background replaces tinycudann's FullyFusedMLP + SH encoding
(gs/backgrounds.py:88-114) with a small dense JAX net over
:func:`gsgen_tpu.ops.sh.eval_sh_basis` features; on TPU the two matmuls
fuse into the surrounding graph.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.sh import eval_sh_basis


@dataclasses.dataclass(frozen=True)
class BackgroundConfig:
    type: str = "random"                 # random | fixed | learned_const | mlp
    range: Tuple[float, float] = (0.0, 1.0)   # random color range
    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)   # fixed
    initial_color: Tuple[float, float, float] = (0.5, 0.5, 0.5)  # learned_const
    random_aug: bool = False
    random_aug_prob: float = 0.0
    # mlp
    sh_degree: int = 3
    hidden: int = 16
    n_layers: int = 2


def init_background(key, cfg: BackgroundConfig):
    if cfg.type == "learned_const":
        return {"bg_color": jnp.asarray(cfg.initial_color, jnp.float32)}
    if cfg.type == "mlp":
        in_dim = cfg.sh_degree ** 2
        dims = [in_dim] + [cfg.hidden] * cfg.n_layers + [3]
        params = {}
        for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
            key, k1 = jax.random.split(key)
            params[f"w{i}"] = jax.random.normal(k1, (a, b)) * (2.0 / a) ** 0.5
            params[f"b{i}"] = jnp.zeros((b,))
        return params
    return {}


def _base_bg(params, cfg: BackgroundConfig, dirs, key, training: bool):
    """The get_bg dispatch (gs/backgrounds.py:21-114 semantics)."""
    if cfg.type == "random":
        lo, hi = cfg.range
        color = jax.lax.cond(
            jnp.asarray(training),
            lambda k: jax.random.uniform(k, (3,)) * (hi - lo) + lo,
            lambda k: jnp.zeros((3,)),
            key)
        return color
    if cfg.type == "fixed":
        return jnp.asarray(cfg.color, jnp.float32)
    if cfg.type == "learned_const":
        return params["bg_color"]
    if cfg.type == "mlp":
        d = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        x = eval_sh_basis(d, cfg.sh_degree)
        n_layers = sum(1 for k in params if k.startswith("w")) - 1
        for i in range(n_layers):
            x = jax.nn.relu(x @ params[f"w{i}"] + params[f"b{i}"])
        x = x @ params[f"w{n_layers}"] + params[f"b{n_layers}"]
        return jnp.nan_to_num(jax.nn.sigmoid(x))
    raise NotImplementedError(f"background type {cfg.type}")


def apply_background(params, cfg: BackgroundConfig, dirs, key,
                     training: bool = True):
    """Returns bg color [3] or image [H, W, 3].

    ``random_aug`` wrapper (gs/backgrounds.py:24-36): with prob
    ``1 - random_aug_prob`` replace the model bg with a random constant
    color during training.
    """
    k_aug, k_bg = jax.random.split(key)
    bg = _base_bg(params, cfg, dirs, k_bg, training)
    if cfg.random_aug and cfg.type != "fixed":
        rand_color = jax.random.uniform(k_aug, (3,))
        use_model = (jax.random.uniform(k_aug, ()) < cfg.random_aug_prob)
        use_model = use_model | jnp.logical_not(jnp.asarray(training))
        if bg.ndim == 1:
            bg = jnp.where(use_model, bg, rand_color)
        else:
            bg = jnp.where(use_model, bg, rand_color[None, None, :])
    return bg
