"""Projection of Gaussian centers to screen space + footprint sigmas.

Semantics contract (must match the reference differentiable renderer,
torch_renderer.py:57-78 `_project` and :146-150 sigma):

  p_cam  = view @ [mean, 1]
  p_clip = proj @ p_cam
  w_safe = 1 if |w| < 1e-8 else w          (safe divide, :67)
  ndc    = p_clip.xyz / w_safe
  px     = (ndc_x * 0.5 + 0.5) * (W - 1)
  py     = (1 - (ndc_y * 0.5 + 0.5)) * (H - 1)   (y-flip, :72)
  valid  = (-1 <= ndc_z <= 1) and (w != 0)
  z_abs  = max(|p_cam_z|, 1e-6)
  sigma_x = max(|scale_x| * 0.5 * W * |proj[0,0]| / z_abs, 1.0)
  sigma_y = max(|scale_y| * 0.5 * H * |proj[1,1]| / z_abs, 1.0)

All float32; fully differentiable (jax.grad traces through).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from tpu_gaussians.core.types import Array


class ScreenSplats(NamedTuple):
    """Per-Gaussian screen-space quantities for one camera."""

    px: Array       # (N,) pixel-center x
    py: Array       # (N,) pixel-center y (y-down)
    z_abs: Array    # (N,) |camera-space z|, clamped >= 1e-6
    valid: Array    # (N,) float32 {0,1} visibility mask
    sigma_x: Array  # (N,) screen-space stddev in x, clamped >= 1
    sigma_y: Array  # (N,) screen-space stddev in y, clamped >= 1


def project(
    means: Array,
    view: Array,
    proj: Array,
    width: int,
    height: int,
    scales: Array,
) -> ScreenSplats:
    """Project Gaussian centers and compute axis-aligned screen sigmas.

    means (N,3), scales (N,3), view/proj (4,4) -> ScreenSplats of (N,) arrays.
    """
    n = means.shape[0]
    ones = jnp.ones((n, 1), dtype=means.dtype)
    p_obj = jnp.concatenate([means, ones], axis=1)  # (N,4)

    # precision="highest": on TPU, plain f32 matmuls run as bf16 MXU passes;
    # the projection must stay true f32 for parity with the torch reference.
    p_cam = jnp.matmul(p_obj, view.T, precision="highest")   # (N,4)
    p_clip = jnp.matmul(p_cam, proj.T, precision="highest")  # (N,4)

    w = p_clip[:, 3:4]
    w_safe = jnp.where(jnp.abs(w) < 1e-8, jnp.ones_like(w), w)
    ndc = p_clip[:, :3] / w_safe

    px = (ndc[:, 0] * 0.5 + 0.5) * (width - 1)
    py = (1.0 - (ndc[:, 1] * 0.5 + 0.5)) * (height - 1)

    valid = (
        (ndc[:, 2] >= -1.0) & (ndc[:, 2] <= 1.0) & (w[:, 0] != 0.0)
    ).astype(jnp.float32)
    z_abs = jnp.maximum(jnp.abs(p_cam[:, 2]), 1e-6)

    fx = jnp.abs(proj[0, 0])
    fy = jnp.abs(proj[1, 1])
    sigma_x = jnp.maximum(jnp.abs(scales[:, 0]) * 0.5 * width * fx / z_abs, 1.0)
    sigma_y = jnp.maximum(jnp.abs(scales[:, 1]) * 0.5 * height * fy / z_abs, 1.0)

    return ScreenSplats(px=px, py=py, z_abs=z_abs, valid=valid,
                        sigma_x=sigma_x, sigma_y=sigma_y)


def camera_z(means: Array, view: Array) -> Array:
    """Signed camera-space z of each center (for depth sorting,
    renderer_cpu.cpp:137-146 convention: larger z = closer)."""
    return jnp.matmul(means, view[2, :3].T, precision="highest") + view[2, 3]
