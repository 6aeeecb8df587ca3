"""Multiview fitting loss: L1 recon + silhouette + depth + regularizers.

Semantics contract (fit_multiview_stub.py:277-308):

  per view i:
    recon_i = mean|pred_i - target_i|
    sil_i   = mean|alpha_i - mask_i|                (if masks given)
    d_pred  = depth_i / (max(depth_i) + 1e-6)
    depth_i = mean|d_pred - depth_gt_i|             (if depth maps given)
    loss_i  = recon_i + silhouette_weight*sil_i + depth_weight*depth_i
  loss = mean_i(loss_i) + reg_opacity*mean(opacities) + reg_scale*mean(scales)

TPU re-design: the reference's serial per-view Python loop
(fit_multiview_stub.py:278-305) becomes a vmap over a (V,...) view batch —
one big batched render per step — and the parameter-mean regularizers
average over *alive* Gaussians only (the capacity mask replaces dynamic N).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_gaussians.core.types import Array, Camera, RenderConfig
from tpu_gaussians.models.gaussian_model import RawParams, activate
from tpu_gaussians.ops.dispatch import render_accum


@dataclass(frozen=True)
class LossConfig:
    """Loss weights; defaults match the reference CLI
    (fit_multiview_stub.py:222-227)."""

    silhouette_weight: float = 0.2
    depth_weight: float = 0.05
    reg_opacity: float = 0.001
    reg_scale: float = 0.001

    def __hash__(self):
        return hash((self.silhouette_weight, self.depth_weight,
                     self.reg_opacity, self.reg_scale))


def loss_fn(
    raw: RawParams,
    cameras: Camera,
    targets: Array,                # (V, H, W, 3)
    masks: Optional[Array],        # (V, H, W) or None
    depths: Optional[Array],       # (V, H, W) or None
    render_config: RenderConfig,
    loss_config: LossConfig,
) -> Tuple[Array, dict]:
    """Scalar loss + metrics dict. Differentiable in `raw`."""
    g = activate(raw)

    def render_view(view, proj):
        return render_accum(g, view, proj, render_config)

    pred, alpha, depth = jax.vmap(render_view)(cameras.view, cameras.proj)

    recon = jnp.mean(jnp.abs(pred - targets), axis=(1, 2, 3))  # (V,)
    per_view = recon

    sil = jnp.zeros_like(recon)
    if masks is not None and loss_config.silhouette_weight > 0.0:
        sil = jnp.mean(jnp.abs(alpha - masks), axis=(1, 2))
        per_view = per_view + loss_config.silhouette_weight * sil

    dl = jnp.zeros_like(recon)
    if depths is not None and loss_config.depth_weight > 0.0:
        d_max = jnp.max(depth, axis=(1, 2), keepdims=True)
        d_pred = depth / (d_max + 1e-6)
        dl = jnp.mean(jnp.abs(d_pred - depths), axis=(1, 2))
        per_view = per_view + loss_config.depth_weight * dl

    alive = g.alive_mask()
    n_alive = jnp.maximum(jnp.sum(alive), 1.0)
    mean_op = jnp.sum(g.opacities * alive) / n_alive
    mean_scale = jnp.sum(g.scales * alive[:, None]) / (n_alive * 3.0)
    reg = (loss_config.reg_opacity * mean_op
           + loss_config.reg_scale * mean_scale)

    loss = jnp.mean(per_view) + reg

    metrics = {
        "loss": loss,
        "recon": jnp.mean(recon),
        "silhouette": jnp.mean(sil),
        "depth": jnp.mean(dl),
        "reg": reg,
        "psnr": psnr(pred, targets),
        "n_alive": n_alive,
    }
    return loss, metrics


def psnr(pred: Array, target: Array) -> Array:
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
