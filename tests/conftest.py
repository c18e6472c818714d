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


# ---------------------------------------------------------------------------
# Test tiers: `pytest -m "not slow"` is the tight verify loop (<3 min on
# CPU); the slow tier holds torch-oracle comparisons and at-scale /
# compile-heavy cases.  Marking is centralized here so test files stay
# clean; a test counts as slow if its module OR its name is listed.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

_SLOW_MODULES = {
    "test_scale_parity",     # 100K/512^2 oracle comparisons
    "test_vsd",              # LoRA UNet grad compiles
    "test_dpt",              # transformers torch oracle
    "test_sd_unet",          # SD-shape UNet compiles
    "test_convert",          # UNet round-trip at preset scale
    "test_text_encoders",    # CLIP/T5 torch oracles
    "test_debias_lpips",     # BERT/LPIPS torch oracles
    "test_upsampler",        # IF-II-style diffusion upsampler
    "test_sit3d",            # image-to-3D training loops
    "test_unet_oracle",      # independent torch UNet implementation
    "test_shap_e",           # shap-e torch oracles + latent sampling
    "test_quality_gate",     # thresholded 150-step recon gate
    "test_main_journey",     # full main.py journey (compile-heavy)
}
_SLOW_TESTS = {
    "test_pbr_render_and_grads",
    "test_pbr_through_trainer",
    "test_pbr_densify_carries_fields",
    "test_estimated_normals_render",
    "test_trainer_with_tile_mesh",
    "test_compact_layout_matches_padded",
    "test_compact_layout_multi_tile_windows",
    "test_grid_transformer_matches_reference_plumbing",
    "test_image_sampler_end_to_end_tiny",
    "test_tile_sharded_gradients_psum",
    "test_full_sharded_train_step",
    "test_gauss_tile_2d_mesh",
    "test_aabb_covers_rendered_support_subpixel",
    "test_pallas_backward_with_early_exit_grads",
    "test_pressure_scene_gradients",
    "test_one_gaussian_center_peak",
    "test_grid_scene_coverage",
    "test_trainer_end_to_end_loss_decreases",
    "test_render_view_channels",
    "test_aux_guidance_with_real_point_e",
    "test_clip_image_encoder_in_make_it_3d",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.split("[")[0]
        if mod in _SLOW_MODULES or name in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
