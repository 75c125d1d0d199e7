"""soccerplayershapepose_tpu — TPU-native soccer player shape & pose reconstruction.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
pipeline ``xhuan8/SoccerPlayerShapePose`` (PyTorch/CUDA, single-GPU), re-designed
TPU-first:

* the math core (SMPL linear-blend-skinning, batched projection, Gaussian heatmap
  synthesis, differentiable silhouette rasterization) runs as fused XLA/Pallas
  programs over *batches of players* instead of one crop at a time,
* the render-and-compare fitting loops (single-view / multi-view / broadcast-view)
  run fully on device under ``lax.scan`` with per-sample best-iterate tracking,
* scaling is expressed with ``jax.sharding`` meshes (data parallel over player
  crops, model-parallel vertex/pixel sharding for the body model and rasterizer).

Package layout mirrors the build plan in SURVEY.md §7.
"""

__version__ = "0.1.0"
