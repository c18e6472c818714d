"""Test configuration: force an 8-device virtual CPU mesh.

Must set the env vars BEFORE jax is imported anywhere, so this file
avoids importing jax at module scope until after os.environ is set.
"""

import os

# Force CPU: the driver environment presets JAX_PLATFORMS=axon (one real
# TPU chip via a tunnel) — unit tests want the 8-device virtual CPU mesh.
# Set GSGEN_TEST_TPU=1 to run the suite on the real chip instead.
# NOTE: /root/.axon_site/sitecustomize.py imports jax at interpreter
# startup, so the env var is already consumed — the jax.config.update
# below (after the import) is what actually takes effect.
if not os.environ.get("GSGEN_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("GSGEN_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: grad-through-scan compiles are minutes on
# CPU; cache them across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
