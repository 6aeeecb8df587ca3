"""View-dependent color: RGB passthrough or SH degree-1 evaluation.

Contract (torch_renderer.py:86-106 `_eval_colors`):
  RGB (N,3): returned as-is.
  SH  (N,4,3): c = dc + c1x*dir_x + c1y*dir_y + c1z*dir_z, where
    dir = normalize(cam_pos - mean), cam_pos = inv(view)[:3,3],
    with the same 1e-8 norm guard.
The caller clamps the result to [0,1] (torch_renderer.py:144).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_gaussians.core.camera import camera_position_from_view
from tpu_gaussians.core.types import Array


def eval_colors(colors_or_sh: Array, means: Array, view: Array) -> Array:
    """Evaluate per-Gaussian RGB for one camera. Differentiable."""
    c = colors_or_sh
    if c.ndim == 2 and c.shape[1] == 3:
        return c
    if c.ndim == 3 and c.shape[1] == 4 and c.shape[2] == 3:
        cam_pos = camera_position_from_view(view)
        dirs = cam_pos[None, :] - means
        dirs = dirs / (jnp.linalg.norm(dirs, axis=1, keepdims=True) + 1e-8)
        dc = c[:, 0, :]
        out = (
            dc
            + c[:, 1, :] * dirs[:, 0:1]
            + c[:, 2, :] * dirs[:, 1:2]
            + c[:, 3, :] * dirs[:, 2:3]
        )
        return out
    raise ValueError("colors must be (N,3) or SH coeffs (N,4,3)")
