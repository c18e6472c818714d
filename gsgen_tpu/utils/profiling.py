"""Profiling: jax.profiler traces (Perfetto/XPlane) + field statistics.

TPU-native replacement for the reference's observability layer in
gsgen3d/gsgen: tic()/toc() wall-clock pairs (utils/misc.py:53-83),
cudaEvent GpuTimer (gs/src/include/common.h:96-123), nsight capture
brackets (gs/renderer.py:698-806), and the wandb.watch parameter/grad
histograms (trainer.py:212-216, gs/gaussian_splatting.py:1489-1564).

On TPU the authoritative tools are the XLA profiler (one trace file
viewable in Perfetto / TensorBoard) and explicit device-time
measurement; host-side wall-clock pairs mislead under async dispatch.
"""

from __future__ import annotations

import contextlib
from typing import Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profiler trace into ``logdir``.

    View with Perfetto (ui.perfetto.dev) or TensorBoard's profile
    plugin.  Degrades to a no-op with a warning if the profiler is
    unsupported on the attached platform (e.g. a tunneled chip).
    """
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:                                # pragma: no cover
        print(f"[profiling] trace unavailable: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:                        # pragma: no cover
                print(f"[profiling] stop_trace failed: {e}")


def annotate(name: str):
    """Named region visible in the trace timeline (the nsight-bracket
    analog).  Usable as a context manager or decorator."""
    return jax.profiler.TraceAnnotation(name)


@jax.jit
def _field_stats_device(tree):
    out = {}
    for name, x in tree.items():
        x = jnp.asarray(x, jnp.float32)
        out[f"{name}/min"] = jnp.min(x)
        out[f"{name}/max"] = jnp.max(x)
        out[f"{name}/mean"] = jnp.mean(x)
        out[f"{name}/rms"] = jnp.sqrt(jnp.mean(x * x))
    return out


def field_stats(tree, prefix: str = "fields") -> Dict[str, float]:
    """min/max/mean/rms per leaf of a {name: array} dict — the scalar
    form of the reference's per-field histogram logging
    (gs/gaussian_splatting.py:1489-1564).  One fused device program,
    one host transfer."""
    dense = {k: v for k, v in tree.items()
             if v is not None and jnp.ndim(v) > 0}
    if not dense:
        return {}
    stats = _field_stats_device(dense)
    return {f"{prefix}/{k}": float(v) for k, v in stats.items()}
