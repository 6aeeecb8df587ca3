"""Densify & prune at fixed capacity — jit-compatible, no reallocations.

Reproduces the reference algorithm (fit_multiview_stub.py:140-197
`_densify_and_prune`) on fixed-capacity arrays with an alive mask:

  prune:   keep alive rows with sigmoid(op_raw) > prune_opacity; if fewer
           than 64 survive, keep the top-min(64, n_alive) by opacity (:153-157)
  compact: survivors move to the front, order preserved (the masked analog
           of the reference's boolean-index gather :159-163)
  densify: add_n = min(capacity - n, floor(n * densify_ratio)) (:166-167);
           clone the top-add_n ranked Gaussians with positional jitter
           0.25 * scales * N(0,1) (:170-172), child opacity_raw -= 0.1 (:174)
  split:   (3DGS extension, off by default) cloned Gaussians whose max
           activated scale exceeds split_scale_thresh are SPLIT instead:
           both parent and child scales shrink by split_shrink (3DGS
           uses 1.6) and the child keeps the parent opacity — the
           original 3DGS over-reconstruction remedy

Everything is gather/scatter at capacity C — shapes never change, so the
train step never recompiles (SURVEY.md §7 "Densify/prune under jit").

Clone ranking: `clone_metric="opacity"` matches the reference (:170);
`"grad"` ranks by the accumulated positional-gradient norm from TrainState
(the BASELINE north-star upgrade, like the original 3DGS paper's
densify-by-gradient criterion).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_gaussians.core.types import Array
from tpu_gaussians.models.gaussian_model import RawParams


@dataclass(frozen=True)
class DensifyConfig:
    """Defaults match the reference CLI (fit_multiview_stub.py:217-220)."""

    densify_interval: int = 80
    prune_interval: int = 80
    densify_ratio: float = 0.15
    prune_opacity: float = 0.05
    min_keep: int = 64            # survivor floor (:154-157)
    clone_metric: str = "opacity"  # "opacity" (reference) | "grad"
    jitter_scale: float = 0.25     # positional jitter factor (:171)
    split_scale_thresh: float = 0.0  # 3DGS split threshold (world units);
                                     # 0 = off (reference behavior)
    split_shrink: float = 1.6        # 3DGS split scale divisor


def _inverse_permutation(perm: Array) -> Array:
    """pos[i] = rank of row i under perm (perm sorted-best-first)."""
    c = perm.shape[0]
    return jnp.zeros((c,), jnp.int32).at[perm].set(jnp.arange(c, dtype=jnp.int32))


def _inv_softplus(y: Array) -> Array:
    """softplus^-1 on positive y: y + log1p(-exp(-y)), stable for y > 0."""
    y = jnp.maximum(y, 1e-6)
    return y + jnp.log1p(-jnp.exp(-y))


@partial(jax.jit, static_argnames=("densify_ratio", "prune_opacity",
                                   "min_keep", "clone_metric", "jitter_scale",
                                   "split_scale_thresh", "split_shrink"))
def _densify_and_prune_impl(
    raw: RawParams,
    grad_norm_accum: Array,
    grad_steps: Array,
    key: Array,
    densify_ratio: float,
    prune_opacity: float,
    min_keep: int,
    clone_metric: str,
    jitter_scale: float,
    split_scale_thresh: float,
    split_shrink: float,
) -> Tuple[RawParams, dict]:
    c = raw.capacity
    alive = raw.alive_mask() > 0.5
    op = jax.nn.sigmoid(raw.opacities_raw)
    op_rank = jnp.where(alive, op, -1.0)

    # --- prune with survivor floor ---
    n_alive = jnp.sum(alive)
    keep_thresh = alive & (op > prune_opacity)
    n_keep_thresh = jnp.sum(keep_thresh)

    rank = jnp.argsort(-op_rank, stable=True)
    pos = _inverse_permutation(rank)
    floor_n = jnp.minimum(min_keep, n_alive)
    top_mask = (pos < floor_n) & alive

    keep = jnp.where(n_keep_thresh < min_keep, top_mask, keep_thresh)
    n = jnp.sum(keep)

    # --- order-preserving compaction: survivors to the front ---
    order = jnp.argsort(jnp.logical_not(keep), stable=True)
    gather = lambda a: None if a is None else a[order]
    means = gather(raw.means)
    scales_raw = gather(raw.scales_raw)
    op_raw = gather(raw.opacities_raw)
    colors_raw = gather(raw.colors_raw)
    sh_raw = gather(raw.sh_raw)
    quats_raw = gather(raw.quats_raw)
    grad_acc = grad_norm_accum[order]
    alive_new = jnp.arange(c) < n

    # --- clone selection ---
    op_c = jax.nn.sigmoid(op_raw)
    if clone_metric == "grad":
        steps = jnp.maximum(grad_steps.astype(jnp.float32), 1.0)
        metric = grad_acc / steps
    else:
        metric = op_c
    metric = jnp.where(alive_new, metric, -1.0)

    room = c - n
    add_n = jnp.minimum(room, jnp.floor(n.astype(jnp.float32)
                                        * densify_ratio).astype(jnp.int32))
    add_n = jnp.maximum(add_n, 0)

    src = jnp.argsort(-metric, stable=True)        # best-first source rows
    j = jnp.arange(c, dtype=jnp.int32)
    write_mask = j < add_n
    dest = jnp.where(write_mask, n + j, c)         # c = out-of-bounds, dropped

    scales_act = jax.nn.softplus(scales_raw) + 1e-3
    noise = jax.random.normal(key, (c, 3), jnp.float32)
    child_means = means[src] + jitter_scale * scales_act[src] * noise

    child_scales_raw = scales_raw[src]
    child_op_raw = op_raw[src] - 0.1
    if split_scale_thresh > 0.0:
        # 3DGS split: over-sized sources shrink (parent AND child) by
        # split_shrink; split children keep the parent opacity.
        split = (jnp.max(scales_act[src], axis=1) > split_scale_thresh)
        shrunk = _inv_softplus(
            jnp.maximum(scales_act[src] / split_shrink - 1e-3, 1e-6))
        child_scales_raw = jnp.where(split[:, None], shrunk,
                                     child_scales_raw)
        child_op_raw = jnp.where(split, op_raw[src], child_op_raw)
        # Shrink the parents in place (only rows that were actually
        # cloned): scatter back through src with out-of-bounds drop.
        parent_dest = jnp.where(write_mask & split, src, c)
        scales_raw = scales_raw.at[parent_dest].set(shrunk, mode="drop")

    def scatter(base, child_vals):
        if base is None:
            return None
        return base.at[dest].set(child_vals, mode="drop")

    new_raw = RawParams(
        means=scatter(means, child_means),
        scales_raw=scatter(scales_raw, child_scales_raw),
        opacities_raw=scatter(op_raw, child_op_raw),
        colors_raw=scatter(colors_raw,
                           None if colors_raw is None else colors_raw[src]),
        sh_raw=scatter(sh_raw, None if sh_raw is None else sh_raw[src]),
        alive=(j < n + add_n).astype(jnp.float32),
        quats_raw=scatter(quats_raw,
                          None if quats_raw is None else quats_raw[src]),
    )

    stats = {
        "n_before": n_alive.astype(jnp.int32),
        "n_pruned": (n_alive - n).astype(jnp.int32),
        "n_cloned": add_n.astype(jnp.int32),
        "n_after": (n + add_n).astype(jnp.int32),
    }
    return new_raw, stats


def densify_and_prune(
    raw: RawParams,
    key: Array,
    config: DensifyConfig,
    *,
    densify_ratio: Optional[float] = None,
    grad_norm_accum: Optional[Array] = None,
    grad_steps: Optional[Array] = None,
) -> Tuple[RawParams, dict]:
    """Run one densify/prune pass. `densify_ratio` overrides the config
    value (the reference zeroes it when only the prune interval fires,
    fit_multiview_stub.py:322)."""
    ratio = config.densify_ratio if densify_ratio is None else densify_ratio
    if grad_norm_accum is None:
        grad_norm_accum = jnp.zeros((raw.capacity,), jnp.float32)
    if grad_steps is None:
        grad_steps = jnp.zeros((), jnp.int32)
    return _densify_and_prune_impl(
        raw, grad_norm_accum, grad_steps, key,
        densify_ratio=float(ratio),
        prune_opacity=float(config.prune_opacity),
        min_keep=int(config.min_keep),
        clone_metric=str(config.clone_metric),
        jitter_scale=float(config.jitter_scale),
        split_scale_thresh=float(config.split_scale_thresh),
        split_shrink=float(config.split_shrink),
    )
