"""gsgen-tpu: TPU-native text-to-3D Gaussian splatting.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
gsgen3d/gsgen.  See README.md for the design and PARITY.md for the
component-by-component map to the reference.
"""

__version__ = "0.1.0"

# The public API re-exports live in submodules to keep `import gsgen_tpu`
# free of jax-compile side effects; the canonical entry points are:
#   gsgen_tpu.config.load_config / build_trainer      (training)
#   gsgen_tpu.models.scene.render_view / render_batch (rendering)
#   gsgen_tpu.io.export.to_ply / to_splat / to_mesh   (export)
#   gsgen_tpu.io.viewer.SceneViewer                   (viewing)
