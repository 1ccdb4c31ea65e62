"""empanada_tpu: a TPU-native (JAX/XLA/Pallas) framework for panoptic
segmentation of 2D and 3D electron-microscopy volumes.

Re-implements the capabilities of volume-em/empanada-napari (the "empanada"
core library plus the napari plugin runtime) with a TPU-first design:

- model forward passes are flax modules compiled by XLA (bfloat16, MXU-sized)
- panoptic post-processing (center NMS, offset grouping, semantic/instance
  merge) is a single jitted graph with static shapes instead of the
  reference's shape-dynamic TorchScript kernels
- the RLE/stitching layer runs on host with vectorized numpy + a native C++
  kernel library (replacing the reference's numba nopython kernels)
- multi-device scaling uses jax.sharding meshes over ICI instead of NCCL DDP
"""

__version__ = "0.1.0"
