"""FreeGaussian-TPU: a TPU-native dynamic 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas implementation of the full FreeGaussian pipeline
(annotation-free control of articulated objects via 3D Gaussian splats with
flow derivatives), designed TPU-first:

- differentiable tile rasterizer: XLA segmented sort for binning + Pallas
  16x16-tile kernels with analytic backward and absgrad accumulation
- padded-capacity Gaussian parameter pytrees so adaptive density control
  (split/dup/cull) runs under jit with static shapes
- SE(3) deformation field + control field as flax MLPs
- multi-chip scaling via jax.sharding.Mesh (data / tile axes) with psum
  gradient reduction

Reference behavior parity target: Tavish9/freegaussian (nerfstudio plugin on
top of gsplat CUDA kernels).
"""

__version__ = "0.1.0"
