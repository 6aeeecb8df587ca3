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
from tpu_gaussians.ops.dispatch import render_accum, render_sorted


@dataclass(frozen=True)
class LossConfig:
    """Loss weights; defaults match the reference CLI
    (fit_multiview_stub.py:222-227). ssim_weight is a TPU-native
    extension (the 3DGS training recipe's D-SSIM term; the reference is
    L1-only) — 0.0 keeps exact reference semantics."""

    silhouette_weight: float = 0.2
    depth_weight: float = 0.05
    reg_opacity: float = 0.001
    reg_scale: float = 0.001
    ssim_weight: float = 0.0

    def __hash__(self):
        return hash((self.silhouette_weight, self.depth_weight,
                     self.reg_opacity, self.reg_scale, self.ssim_weight))


def loss_fn(
    raw: RawParams,
    cameras: Camera,
    targets: Array,                # (V, H, W, 3)
    masks: Optional[Array],        # (V, H, W) or None
    depths: Optional[Array],       # (V, H, W) or None
    render_config: RenderConfig,
    loss_config: LossConfig,
) -> Tuple[Array, dict]:
    """Scalar loss + metrics dict. Differentiable in `raw`.

    render_config.mode selects the compositing model: "accum" (the
    reference's weighted-average training path, torch_renderer.py:192-196)
    or "sorted" (depth-sorted front-to-back alpha blending — the 3DGS
    training recipe, differentiable via the fused Pallas VJP). Both modes
    emit an expected-depth aux, so the full loss stack (L1 + silhouette +
    depth supervision, fit_multiview_stub.py:299-303) runs in either."""
    g = activate(raw)

    if render_config.mode == "sorted":
        def render_view(view, proj):
            return render_sorted(g, view, proj, render_config,
                                 return_stats=True)
    else:
        def render_view(view, proj):
            return render_accum(g, view, proj, render_config,
                                return_stats=True)

    pred, alpha, depth, ostats = jax.vmap(render_view)(
        cameras.view, cameras.proj)

    recon = jnp.mean(jnp.abs(pred - targets), axis=(1, 2, 3))  # (V,)
    per_view = recon

    sil = jnp.zeros_like(recon)
    if masks is not None and loss_config.silhouette_weight > 0.0:
        sil = jnp.mean(jnp.abs(alpha - masks), axis=(1, 2))
        per_view = per_view + loss_config.silhouette_weight * sil

    ssim_v = jnp.zeros_like(recon)
    if loss_config.ssim_weight > 0.0:
        ssim_v = ssim(pred, targets)                       # (V,)
        per_view = per_view + loss_config.ssim_weight * (1.0 - ssim_v)

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
        "ssim": jnp.mean(ssim_v),
        "n_alive": n_alive,
        # Binner overflow counters summed over views (zeros on exact
        # paths) — a nonzero value means this step's render dropped
        # (gaussian, tile) work to a capacity/budget; see
        # ops/pallas/sorted.py _bin_pairs_2d for the exact semantics.
        # float32 so the counters survive pmean in sharded steps.
        "binner_dropped_pairs": jnp.sum(
            ostats["dropped_pairs"]).astype(jnp.float32),
        "binner_full_tiles": jnp.sum(
            ostats["full_tiles"]).astype(jnp.float32),
        "binner_clipped_rect_pairs": jnp.sum(
            ostats["clipped_rect_pairs"]).astype(jnp.float32),
    }
    return loss, metrics


def psnr(pred: Array, target: Array) -> Array:
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def _gauss_kernel(size: int = 11, sigma: float = 1.5) -> Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _blur(x: Array, k: Array) -> Array:
    """Separable gaussian filter over (B, H, W), VALID padding."""
    size = k.shape[0]
    kh = k.reshape(1, 1, size, 1)
    kw = k.reshape(1, 1, 1, size)
    x = x[:, None, :, :]                                   # NCHW, C=1
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    # precision="highest": TPU default conv precision rounds to bf16,
    # which moves reported SSIM by ~1e-3 — too coarse for an eval metric.
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     precision="highest")
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     precision="highest")
    return x[:, 0, :, :]


def ssim(pred: Array, target: Array, size: int = 11,
         sigma: float = 1.5) -> Array:
    """Per-view SSIM of (V, H, W, 3) batches (standard 11x11 gaussian
    window, C1/C2 for unit dynamic range). Differentiable; used as the
    3DGS-style D-SSIM loss term and by the eval CLI."""
    v = pred.shape[0]
    k = _gauss_kernel(size, sigma)
    # channels into the batch axis: (V*3, H, W)
    p = pred.transpose(0, 3, 1, 2).reshape(-1, *pred.shape[1:3])
    t = target.transpose(0, 3, 1, 2).reshape(-1, *target.shape[1:3])

    mu_p = _blur(p, k)
    mu_t = _blur(t, k)
    mu_pp = _blur(p * p, k) - mu_p * mu_p
    mu_tt = _blur(t * t, k) - mu_t * mu_t
    mu_pt = _blur(p * t, k) - mu_p * mu_t

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    s = ((2 * mu_p * mu_t + c1) * (2 * mu_pt + c2)) / (
        (mu_p * mu_p + mu_t * mu_t + c1) * (mu_pp + mu_tt + c2))
    return jnp.mean(s.reshape(v, -1), axis=1)              # (V,)
