"""Sharded training step: views/rows per chip, params replicated.

The distributed fit (SURVEY.md §7 F8). The per-step computation is
  grads = (1/V) * sum_v grad(loss_v)       [+ replicated regularizer term]
With targets sharded over the "views" axis and params replicated, GSPMD
compiles the mean-over-views into a gradient all-reduce over ICI — the
same math as the reference's serial view loop (fit_multiview_stub.py:278-308)
but executed V/num_shards views per chip. Row sharding additionally splits
the image dimension (valid because the accumulation mode is
order-independent per pixel).

Checked by tests/test_sharded.py: sharded step == single-device step to
float tolerance on a forced 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import optax
from jax.sharding import Mesh

from tpu_gaussians.core.types import Camera, RenderConfig
from tpu_gaussians.fit.loss import LossConfig
from tpu_gaussians.fit.step import TrainState, make_train_step
from tpu_gaussians.parallel.mesh import replicated, view_sharding


def make_sharded_train_step(
    tx: optax.GradientTransformation,
    render_config: RenderConfig,
    loss_config: LossConfig,
    has_masks: bool,
    has_depths: bool,
    mesh: Mesh,
    shard_rows: bool = False,
):
    """jit the train step with explicit input shardings on `mesh`.

    Argument layout matches fit.step.make_train_step:
      (state, cameras, targets (V,H,W,3), masks (V,H,W), depths (V,H,W)).
    State is replicated; per-view arrays shard over axis 0 (+ image rows
    over the "rows" axis when shard_rows).
    """

    # Reuse the single-device step body; GSPMD handles distribution.
    step = make_train_step(
        tx, render_config, loss_config, has_masks, has_depths, jit=False,
    )

    repl = replicated(mesh)
    row_dim_img = 1 if shard_rows else None
    state_sh = repl
    cam_sh = Camera(
        view=view_sharding(mesh, 3), proj=view_sharding(mesh, 3)
    )
    in_shardings = (
        state_sh,
        cam_sh,
        view_sharding(mesh, 4, row_dim=row_dim_img),
        view_sharding(mesh, 3, row_dim=row_dim_img),
        view_sharding(mesh, 3, row_dim=row_dim_img),
    )
    return jax.jit(
        step,
        in_shardings=in_shardings,
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
