"""gslidar_tpu — TPU-native panoramic Gaussian-splatting LiDAR framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
GS-LiDAR (ICLR 2025, "Generating Realistic LiDAR Point Clouds with Panoramic
Gaussian Splatting"), designed TPU-first:

* the differentiable panoramic 2DGS rasterizer is a sort/scan formulation
  (no atomics, deterministic) with a Pallas per-tile compositing kernel on
  the hot path (reference: diff-gaussian-rasterization-2d/, CUDA),
* the Gaussian point model is a fixed-capacity pytree with an alive mask so
  densification never changes shapes under jit
  (reference: scene/gaussian_model.py),
* training steps are single fused jit programs; multi-chip scaling uses
  jax.sharding.Mesh + shard_map over the gaussian/tile axes.
"""

__version__ = "0.1.0"
