"""Raw (pre-activation) Gaussian parameterization at fixed capacity.

Re-designs the reference's dynamically-sized parameter dict
(fit_multiview_stub.py:114-137 `_build_params`) as a fixed-capacity pytree
with an alive mask, so the jit-compiled train step never changes shape when
densify/prune runs. Activation functions match the reference exactly:

  scales    = softplus(scales_raw) + 1e-3     (fit_multiview_stub.py:269)
  opacities = sigmoid(opacities_raw)          (:270)
  colors    = sigmoid(colors_raw)             (:275)
  sh        = sh_raw (used directly)          (:273)

Initial distributions (fit_multiview_stub.py:119-135):
  means       ~ (U(0,1) - 0.5) * 1.2  = U(-0.6, 0.6)
  scales_raw  = -2.2
  opacities_raw = -2.2
  colors_raw  ~ 0.1 * U(0,1)
  sh_raw      = zeros, dc row = 0.1 * U(0,1)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from tpu_gaussians.core.types import Array, Gaussians


@dataclass(frozen=True)
class RawParams:
    """Trainable leaves (all float32, capacity C rows; dead rows inert)."""

    means: Array          # (C, 3)
    scales_raw: Array     # (C, 3)
    opacities_raw: Array  # (C,)
    colors_raw: Optional[Array] = None  # (C, 3) xor sh_raw
    sh_raw: Optional[Array] = None      # (C, 4, 3)
    alive: Optional[Array] = None       # (C,) float32 {0,1}; non-trainable
    quats_raw: Optional[Array] = None   # (C, 4) wxyz; EWA footprint only

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def use_sh(self) -> bool:
        return self.sh_raw is not None

    def alive_mask(self) -> Array:
        if self.alive is None:
            return jnp.ones((self.capacity,), dtype=jnp.float32)
        return self.alive

    def num_alive(self) -> Array:
        return jnp.sum(self.alive_mask()).astype(jnp.int32)

    def replace(self, **kw) -> "RawParams":
        return dataclasses.replace(self, **kw)

    def trainable(self) -> dict:
        """The optimizer-visible leaves (excludes the alive mask), in the
        spirit of the reference's params dict (fit_multiview_stub.py:123-135)."""
        out = {
            "means": self.means,
            "scales_raw": self.scales_raw,
            "opacities_raw": self.opacities_raw,
        }
        if self.use_sh:
            out["sh_raw"] = self.sh_raw
        else:
            out["colors_raw"] = self.colors_raw
        if self.quats_raw is not None:
            out["quats_raw"] = self.quats_raw
        return out

    def with_trainable(self, leaves: dict) -> "RawParams":
        return self.replace(**leaves)


jax.tree_util.register_dataclass(
    RawParams,
    data_fields=["means", "scales_raw", "opacities_raw", "colors_raw",
                 "sh_raw", "alive", "quats_raw"],
    meta_fields=[],
)


def init_params(
    key: Array, num_gaussians: int, capacity: int, use_sh: bool = False,
    use_quats: bool = False, sh_degree: int = 1,
) -> RawParams:
    """Random init matching the reference distributions, padded to capacity.

    Rows [0, num_gaussians) are alive; the rest are zero-initialized dead
    capacity for future densification.

    sh_degree (with use_sh): 1 -> (C,4,3) reference convention; 2/3 ->
    (C,9|16,3) standard 3DGS real SH, dc initialized so the degree-0
    color matches the reference's 0.1*U(0,1) init.
    """
    if num_gaussians > capacity:
        raise ValueError(f"num_gaussians {num_gaussians} > capacity {capacity}")
    c = capacity
    k_means, k_col = jax.random.split(key)

    means = jnp.zeros((c, 3), jnp.float32)
    means = means.at[:num_gaussians].set(
        (jax.random.uniform(k_means, (num_gaussians, 3)) - 0.5) * 1.2
    )
    scales_raw = jnp.full((c, 3), -2.2, jnp.float32)
    opacities_raw = jnp.full((c,), -2.2, jnp.float32)
    alive = (jnp.arange(c) < num_gaussians).astype(jnp.float32)

    # Identity rotation init for the EWA footprint (wxyz = [1,0,0,0]).
    quats_raw = None
    if use_quats:
        quats_raw = jnp.zeros((c, 4), jnp.float32).at[:, 0].set(1.0)

    if use_sh:
        from tpu_gaussians.ops.sh import SH_C0, sh_bands

        bands = sh_bands(sh_degree)
        dc = 0.1 * jax.random.uniform(k_col, (num_gaussians, 3))
        if bands > 4:  # 3DGS convention: color = 0.5 + C0 * dc
            dc = (dc - 0.5) / SH_C0
        sh_raw = jnp.zeros((c, bands, 3), jnp.float32)
        sh_raw = sh_raw.at[:num_gaussians, 0, :].set(dc)
        return RawParams(means=means, scales_raw=scales_raw,
                         opacities_raw=opacities_raw, sh_raw=sh_raw,
                         alive=alive, quats_raw=quats_raw)

    colors_raw = jnp.zeros((c, 3), jnp.float32)
    colors_raw = colors_raw.at[:num_gaussians].set(
        0.1 * jax.random.uniform(k_col, (num_gaussians, 3))
    )
    return RawParams(means=means, scales_raw=scales_raw,
                     opacities_raw=opacities_raw, colors_raw=colors_raw,
                     alive=alive, quats_raw=quats_raw)


def init_params_from_points(
    key: Array, points: Array, rgb: Array, capacity: int,
    use_sh: bool = False, use_quats: bool = False, sh_degree: int = 1,
) -> RawParams:
    """3DGS-style initialization from an SfM point cloud (e.g. COLMAP
    points3D): means = points, color init from the point RGB, per-point
    scale from the nearest-neighbor distance (isotropic), opacity raw
    -2.2 like the reference init.

    points (P,3) / rgb (P,3 in [0,1]); P > capacity is subsampled
    uniformly. NN distance is estimated against <=4096 random anchors
    (exact for P <= 4096) — the 3DGS recipe clamps scales to sane
    bounds anyway.
    """
    import numpy as np

    pts = np.asarray(points, np.float32).reshape(-1, 3)
    col = np.clip(np.asarray(rgb, np.float32).reshape(-1, 3), 0.0, 1.0)
    p = pts.shape[0]
    if p == 0:
        raise ValueError("init_params_from_points: empty point cloud")
    k_sub, k_anchor = jax.random.split(key)
    if p > capacity:
        sel = np.asarray(jax.random.choice(
            k_sub, p, (capacity,), replace=False))
        pts, col = pts[sel], col[sel]
        p = capacity

    # Per-point NN distance against a random anchor subset.
    n_anchor = min(p, 4096)
    anchor_idx = (np.arange(p) if n_anchor == p else np.asarray(
        jax.random.choice(k_anchor, p, (n_anchor,), replace=False)))
    anchors = pts[anchor_idx]
    d2 = (np.sum(pts * pts, 1)[:, None] + np.sum(anchors * anchors, 1)[None]
          - 2.0 * pts @ anchors.T)
    d2[np.arange(p)[:, None] == anchor_idx[None, :]] = np.inf
    nn = np.sqrt(np.maximum(np.min(d2, axis=1), 1e-12))
    extent = float(np.linalg.norm(pts.max(0) - pts.min(0)) + 1e-6)
    nn = np.clip(nn, 1e-4 * extent, 0.1 * extent)
    # softplus(raw) + 1e-3 = nn  ->  raw = softplus^-1(nn - 1e-3)
    y = np.maximum(nn - 1e-3, 1e-6)
    scales_val = (y + np.log1p(-np.exp(-np.maximum(y, 1e-6)))
                  ).astype(np.float32)

    c = capacity
    means = jnp.zeros((c, 3), jnp.float32).at[:p].set(jnp.asarray(pts))
    scales_raw = jnp.full((c, 3), -2.2, jnp.float32).at[:p].set(
        jnp.asarray(np.repeat(scales_val[:, None], 3, axis=1)))
    opacities_raw = jnp.full((c,), -2.2, jnp.float32)
    alive = (jnp.arange(c) < p).astype(jnp.float32)
    quats_raw = None
    if use_quats:
        quats_raw = jnp.zeros((c, 4), jnp.float32).at[:, 0].set(1.0)

    if use_sh:
        from tpu_gaussians.ops.sh import SH_C0, sh_bands

        bands = sh_bands(sh_degree)
        dc = jnp.asarray(col)
        if bands > 4:  # 3DGS convention: color = 0.5 + C0 * dc
            dc = (dc - 0.5) / SH_C0
        sh_raw = jnp.zeros((c, bands, 3), jnp.float32)
        sh_raw = sh_raw.at[:p, 0, :].set(dc)
        return RawParams(means=means, scales_raw=scales_raw,
                         opacities_raw=opacities_raw, sh_raw=sh_raw,
                         alive=alive, quats_raw=quats_raw)

    # colors = sigmoid(colors_raw): invert with a clamp away from {0,1}.
    cc = np.clip(col, 1e-4, 1.0 - 1e-4)
    colors_val = np.log(cc) - np.log1p(-cc)
    colors_raw = jnp.zeros((c, 3), jnp.float32).at[:p].set(
        jnp.asarray(colors_val.astype(np.float32)))
    return RawParams(means=means, scales_raw=scales_raw,
                     opacities_raw=opacities_raw, colors_raw=colors_raw,
                     alive=alive, quats_raw=quats_raw)


def raw_from_gaussians(g, capacity: int = 0) -> RawParams:
    """Invert the reference activations: activated Gaussians -> RawParams
    padded to `capacity` (0 = exactly the alive count). Used to warm-start
    a fit from an exported npz/ply (--init_npz)."""
    import numpy as np

    alive = np.asarray(g.alive_mask()) > 0.5
    means = np.asarray(g.means, np.float32)[alive]
    scales = np.asarray(g.scales, np.float32)[alive]
    op = np.asarray(g.opacities, np.float32)[alive]
    n = means.shape[0]
    c = max(capacity, n)

    y = np.maximum(scales - 1e-3, 1e-6)
    scales_raw_v = (y + np.log1p(-np.exp(-y))).astype(np.float32)
    opc = np.clip(op, 1e-6, 1.0 - 1e-6)
    op_raw_v = (np.log(opc) - np.log1p(-opc)).astype(np.float32)

    means_j = jnp.zeros((c, 3), jnp.float32).at[:n].set(jnp.asarray(means))
    scales_j = jnp.full((c, 3), -2.2, jnp.float32).at[:n].set(
        jnp.asarray(scales_raw_v))
    op_j = jnp.full((c,), -2.2, jnp.float32).at[:n].set(
        jnp.asarray(op_raw_v))
    alive_j = (jnp.arange(c) < n).astype(jnp.float32)
    quats_j = None
    if g.quats is not None:
        q = np.asarray(g.quats, np.float32)[alive]
        quats_j = jnp.zeros((c, 4), jnp.float32).at[:, 0].set(1.0)
        quats_j = quats_j.at[:n].set(jnp.asarray(q))

    if g.use_sh:
        sh = np.asarray(g.sh, np.float32)[alive]
        sh_j = jnp.zeros((c,) + sh.shape[1:], jnp.float32).at[:n].set(
            jnp.asarray(sh))
        return RawParams(means=means_j, scales_raw=scales_j,
                         opacities_raw=op_j, sh_raw=sh_j, alive=alive_j,
                         quats_raw=quats_j)
    col = np.clip(np.asarray(g.colors, np.float32)[alive], 1e-4, 1 - 1e-4)
    col_raw_v = (np.log(col) - np.log1p(-col)).astype(np.float32)
    col_j = jnp.zeros((c, 3), jnp.float32).at[:n].set(
        jnp.asarray(col_raw_v))
    return RawParams(means=means_j, scales_raw=scales_j,
                     opacities_raw=op_j, colors_raw=col_j, alive=alive_j,
                     quats_raw=quats_j)


def activate(raw: RawParams) -> Gaussians:
    """Raw -> render-ready activated Gaussians (reference activations).

    Quaternions pass through raw (normalized inside the EWA conic math,
    ops/ewa.py quat_to_rot)."""
    return Gaussians(
        means=raw.means,
        scales=jax.nn.softplus(raw.scales_raw) + 1e-3,
        opacities=jax.nn.sigmoid(raw.opacities_raw),
        colors=None if raw.use_sh else jax.nn.sigmoid(raw.colors_raw),
        sh=raw.sh_raw if raw.use_sh else None,
        alive=raw.alive_mask(),
        quats=raw.quats_raw,
    )
