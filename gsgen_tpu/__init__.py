"""gsgen_tpu — a TPU-native text-to-3D Gaussian Splatting framework.

A from-scratch JAX / XLA / Pallas rebuild of the capabilities of
gsgen3d/gsgen (GSGEN: Text-to-3D using Gaussian Splatting, arXiv
2309.16585).  The reference is a single-GPU PyTorch + custom-CUDA
system; this framework is designed TPU-first:

* the rasterizer is a pair of Pallas kernels (forward compositing with
  fused RGB/depth/opacity/z-var channels, and an analytic backward)
  driven by a sort-based tile binner with fully static shapes,
* gradient reduction is deterministic (matmul/cumsum reductions instead
  of CUDA atomics),
* scale-out uses ``jax.sharding.Mesh`` + ``shard_map`` with XLA
  collectives over ICI (cameras over a ``data`` axis, image tiles over a
  ``tile`` axis) rather than NCCL,
* densify/prune are functional capacity+mask updates compatible with
  ``jit`` (no optimizer-state surgery).
"""

__version__ = "0.1.0"
