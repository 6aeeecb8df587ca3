"""Shared renderer plumbing: per-Gaussian screen prep and pixel resolve.

Splits the render pipeline so the O(N) per-Gaussian stage and the O(HW)
resolve stage are plain differentiable jnp, while the O(N*HW) splat
accumulation in the middle is pluggable (pure-jnp scan or Pallas kernel).

Footprints are expressed as screen-space conics: the accumulation stage
evaluates  w = op * exp(-0.5*(a dx^2 + 2 b dx dy + c dy^2))  for every
(gaussian, pixel) pair. Two footprint models produce the conic:

  "axis" — the reference's axis-aligned sigma (torch_renderer.py:146-150):
           a = 1/sigma_x^2, b = 0, c = 1/sigma_y^2
  "ewa"  — full quaternion+scale 3D covariance projected by the EWA
           Jacobian (ops/ewa.py; the BASELINE north-star superset)

Accumulator layout: the splat stage reduces per-Gaussian features through
the weights into a per-pixel accumulator
  acc[p, :] = sum_i w_ip * feat[i, :]
with feat = [r, g, b, 1, z_abs]  ->  acc columns = [R, G, B, Wsum, D].
This single (HW, F) matmul-style reduction covers color, weight-sum and
depth in one pass (vs three separate accumulators at
torch_renderer.py:158-160).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from tpu_gaussians.core.types import Array, Gaussians
from tpu_gaussians.ops.ewa import axis_aligned_conic, ewa_conic
from tpu_gaussians.ops.projection import ScreenSplats, project
from tpu_gaussians.ops.sh import eval_colors

# Feature-column layout for the splat accumulator.
FEAT_DIM = 5  # [r, g, b, 1, z]
COL_R, COL_G, COL_B, COL_W, COL_D = range(FEAT_DIM)


class SplatInputs(NamedTuple):
    """Per-Gaussian inputs to the splat accumulation, all screen-space."""

    px: Array       # (N,)
    py: Array       # (N,)
    conic_a: Array  # (N,) conic xx coefficient
    conic_b: Array  # (N,) conic xy coefficient (0 for axis-aligned)
    conic_c: Array  # (N,) conic yy coefficient
    sigma_x: Array  # (N,) effective x stddev in px (culling/bbox only)
    sigma_y: Array  # (N,) effective y stddev in px (culling/bbox only)
    op_eff: Array   # (N,) effective opacity = max(op,0) * valid * alive
    feats: Array    # (N, FEAT_DIM) = [r, g, b, 1, z_abs]


def prepare_splats(
    g: Gaussians, view: Array, proj: Array, width: int, height: int,
    footprint: str = "axis",
) -> SplatInputs:
    """O(N) per-Gaussian stage: projection, footprint conic, color eval,
    masking.

    "axis" matches torch_renderer.py:143-150 (+ color clamp :144, opacity
    clamp :177, validity mask :185) with the alive-capacity mask folded in.
    """
    s: ScreenSplats = project(g.means, view, proj, width, height, g.scales)
    colors = eval_colors(g.sh if g.use_sh else g.colors, g.means, view)
    colors = jnp.clip(colors, 0.0, 1.0)

    if footprint == "ewa":
        quats = g.quats
        if quats is None:
            quats = jnp.zeros((g.capacity, 4), jnp.float32).at[:, 0].set(1.0)
        conic = ewa_conic(g.means, g.scales, quats, view, proj, width, height)
    else:
        conic = axis_aligned_conic(s.sigma_x, s.sigma_y)

    op_eff = jnp.maximum(g.opacities, 0.0) * s.valid * g.alive_mask()

    feats = jnp.concatenate(
        [colors, jnp.ones_like(s.z_abs)[:, None], s.z_abs[:, None]], axis=1
    )
    return SplatInputs(
        px=s.px, py=s.py,
        conic_a=conic.a, conic_b=conic.b, conic_c=conic.c,
        sigma_x=conic.sigma_x, sigma_y=conic.sigma_y,
        op_eff=op_eff, feats=feats,
    )


def resolve_accum(
    acc: Array, background: Array, height: int, width: int
) -> Tuple[Array, Array, Array]:
    """O(HW) resolve of the weighted-average compositing mode.

    acc (H*W, FEAT_DIM) -> (image (H,W,3), alpha (H,W), depth (H,W)),
    matching torch_renderer.py:192-203 exactly:
      out   = clip((bg + R) / (1 + Wsum), 0, 1)
      alpha = clip(Wsum / (1 + Wsum), 0, 1)
      depth = max(D / (Wsum + 1e-6), 0)
    """
    rgb = acc[:, COL_R : COL_B + 1].reshape(height, width, 3)
    wsum = acc[:, COL_W].reshape(height, width)
    d = acc[:, COL_D].reshape(height, width)

    denom = 1.0 + wsum
    image = jnp.clip((background[None, None, :] + rgb) / denom[..., None], 0.0, 1.0)
    alpha = jnp.clip(wsum / denom, 0.0, 1.0)
    depth = jnp.maximum(d / (wsum + 1e-6), 0.0)
    return image, alpha, depth


def pixel_grid(height: int, width: int) -> Tuple[Array, Array]:
    """Flattened pixel-center coordinates gx, gy of shape (H*W,)
    (pixel centers at +0.5, torch_renderer.py:153-155)."""
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return gx.reshape(-1), gy.reshape(-1)
