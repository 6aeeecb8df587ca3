"""TPU-native 3D Gaussian splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
project Kirkice/3DGaussian (see SURVEY.md): a differentiable Gaussian splat
renderer (projection, screen-space footprint, SH degree-1 color, alpha/depth
aux outputs), a multiview fitting loop (Adam on raw-parameterized params with
L1 + silhouette + depth losses and densify/prune), depth-sorted compositing,
and npz import/export compatible with the reference viewers.

Layout:
  core/      Gaussians pytree, camera math, render config, validation
  ops/       renderer implementations (pure-jnp oracle + Pallas kernels)
  models/    parameterization (raw <-> activated), init, capacity management
  fit/       losses, jit train step, densify/prune, trainer
  parallel/  device mesh, sharded training step
  io/        npz (reference schema), images, orbax checkpoints
  cli/       fit / render / view command-line entry points
"""

from tpu_gaussians.core.types import Camera, Gaussians, RenderConfig
from tpu_gaussians.core import camera
from tpu_gaussians.ops.dispatch import render

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "Gaussians",
    "RenderConfig",
    "camera",
    "render",
    "__version__",
]
