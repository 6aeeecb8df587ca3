"""Jit-compiled training step: Adam on raw params + per-Gaussian grad stats.

The TPU re-design of the reference's hot loop (fit_multiview_stub.py:265-316):
one fully-jitted step renders every view (vmapped), computes the loss stack,
backprops, and applies optax Adam (lr default 0.02, :262). Buffers are
donated so params/opt-state update in place on device.

Additionally tracks a per-Gaussian positional-gradient-norm accumulator
(`grad_norm_accum`), the statistic the north star uses to upgrade
densification from opacity-ranked cloning (fit_multiview_stub.py:170) to
gradient-ranked cloning (BASELINE.json north_star).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from tpu_gaussians.core.types import Array, Camera, RenderConfig
from tpu_gaussians.fit.loss import LossConfig, loss_fn
from tpu_gaussians.models.gaussian_model import RawParams


@dataclass(frozen=True)
class TrainState:
    raw: RawParams
    opt_state: optax.OptState
    grad_norm_accum: Array  # (C,) running sum of |dL/d mean_i|_2
    grad_steps: Array       # scalar int32


jax.tree_util.register_dataclass(
    TrainState,
    data_fields=["raw", "opt_state", "grad_norm_accum", "grad_steps"],
    meta_fields=[],
)


def make_optimizer(lr: float = 0.02) -> optax.GradientTransformation:
    """Adam with the reference's hyperparameters (torch defaults:
    betas (0.9, 0.999), eps 1e-8; fit_multiview_stub.py:262).

    r4 negative result: optax.flatten(adam) — one concatenated vector
    instead of per-leaf moment math, aimed at the ~11.5 us Adam/misc
    fusion bucket in the flagship step trace — measured 157.1 vs
    129.0 us/step. The ravel+concat+slice+reshape plumbing costs more
    than the small per-leaf fusions it replaces. Keep per-leaf Adam."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def init_state(raw: RawParams, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        raw=raw,
        opt_state=tx.init(raw.trainable()),
        grad_norm_accum=jnp.zeros((raw.capacity,), jnp.float32),
        grad_steps=jnp.zeros((), jnp.int32),
    )


def reset_optimizer(state: TrainState, tx: optax.GradientTransformation) -> TrainState:
    """Fresh Adam state + cleared grad stats — the reference drops optimizer
    state after every densify/prune (fit_multiview_stub.py:325)."""
    return dataclasses.replace(
        state,
        opt_state=tx.init(state.raw.trainable()),
        grad_norm_accum=jnp.zeros_like(state.grad_norm_accum),
        grad_steps=jnp.zeros_like(state.grad_steps),
    )


def make_train_step(
    tx: optax.GradientTransformation,
    render_config: RenderConfig,
    loss_config: LossConfig,
    has_masks: bool,
    has_depths: bool,
    donate: bool = True,
    jit: bool = True,
):
    """Build the jitted step(state, cameras, targets, masks, depths) fn.

    masks/depths must be passed as arrays when has_masks/has_depths, else
    ignored (pass zeros); staticness of the presence flags keeps the traced
    graph free of None-branches.
    """

    def step(
        state: TrainState,
        cameras: Camera,
        targets: Array,
        masks: Array,
        depths: Array,
        means_lr_scale: Array = 1.0,
    ) -> Tuple[TrainState, dict]:
        """means_lr_scale (traced scalar ok): multiplies the Adam UPDATE
        for `means` only — Adam normalizes gradient scale away, so
        scaling its update is exactly a per-param learning rate. Drives
        the 3DGS-style positional lr decay without touching optimizer
        state (which the trainer resets at densify events)."""
        raw = state.raw

        def f(trainable):
            r = raw.with_trainable(trainable)
            return loss_fn(
                r, cameras, targets,
                masks if has_masks else None,
                depths if has_depths else None,
                render_config, loss_config,
            )

        (loss, metrics), grads = jax.value_and_grad(f, has_aux=True)(
            raw.trainable()
        )

        updates, opt_state = tx.update(grads, state.opt_state, raw.trainable())
        updates = dict(updates)
        updates["means"] = updates["means"] * means_lr_scale
        new_raw = raw.with_trainable(
            optax.apply_updates(raw.trainable(), updates)
        )

        gnorm = jnp.linalg.norm(grads["means"], axis=1)  # (C,)
        new_state = TrainState(
            raw=new_raw,
            opt_state=opt_state,
            grad_norm_accum=state.grad_norm_accum + gnorm,
            grad_steps=state.grad_steps + 1,
        )
        metrics["grad_norm_mean"] = jnp.mean(gnorm)
        return new_state, metrics

    if not jit:
        return step
    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)
