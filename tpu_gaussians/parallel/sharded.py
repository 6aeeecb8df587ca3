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


def make_shardmap_train_step(
    tx: optax.GradientTransformation,
    render_config: RenderConfig,
    loss_config: LossConfig,
    has_masks: bool,
    has_depths: bool,
    mesh: Mesh,
):
    """Explicit-collective variant: shard_map over the views axis with a
    hand-placed psum gradient all-reduce.

    Mathematically identical to make_sharded_train_step (GSPMD derives the
    same collective); this version makes the communication explicit —
    per-shard local loss/grads, `jax.lax.pmean` over "views" — which is
    the shape the overlap optimizations (chunked psum interleaved with the
    backward sweep) attach to. Requires the regularizer-consistent local
    loss: per-view terms divide by the GLOBAL view count via pmean, and
    the replicated regularizer is identical on every shard, so pmean of
    local grads equals the global gradient.
    """
    import jax.numpy as jnp
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from tpu_gaussians.fit.loss import loss_fn
    from tpu_gaussians.parallel.mesh import VIEW_AXIS

    def local_grads(raw, cameras, targets, masks, depths):
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
        return loss, metrics, grads

    def step(state, cameras, targets, masks, depths):
        def shard_body(raw, view, proj, targets, masks, depths):
            # raw enters as a real shard_map argument (replicated spec),
            # NOT a closure capture: captured global arrays carry their
            # Auto-mesh NamedSharding into the Manual context and break
            # tracing in multi-process runs.
            cams = Camera(view=view, proj=proj)
            loss, metrics, grads = local_grads(
                raw, cams, targets, masks, depths)
            # Mean over view shards == global mean over views (each shard
            # computes the mean over its local views; shards are equal-sized).
            grads = jax.lax.pmean(grads, VIEW_AXIS)
            loss = jax.lax.pmean(loss, VIEW_AXIS)
            metrics = jax.lax.pmean(metrics, VIEW_AXIS)
            return loss, metrics, grads

        return _apply_grads(state, shard_body, mesh, cameras, targets,
                            masks, depths, tx)

    return jax.jit(step)


def make_overlapped_train_step(
    tx: optax.GradientTransformation,
    render_config: RenderConfig,
    loss_config: LossConfig,
    has_masks: bool,
    has_depths: bool,
    mesh: Mesh,
    n_chunks: int = 4,
):
    """Gradient all-reduce OVERLAPPED with the backward sweep (SURVEY.md
    §7 hard part 5; the north star's "gradient all-reduce overlapped with
    the backward tile sweep", BASELINE.json:5).

    Mechanism: one monolithic backward produces every gradient at once,
    so a single trailing pmean is a hard barrier — nothing can hide its
    latency. Instead the local view batch is split into `n_chunks`
    equal groups; each group runs its own fwd+bwd and issues its own
    pmean immediately. Chunk c's all-reduce has NO data dependence on
    chunk c+1's render/backward, so XLA's latency-hiding scheduler
    (async collectives on TPU) executes the collective for chunk c on
    the ICI DMA engines while the VPU/MXU compute chunk c+1 — hiding
    (n_chunks-1)/n_chunks of the all-reduce time. The final gradient is
    the mean over chunk pmeans, which equals the barrier version's
    global mean exactly in real arithmetic (equal-sized chunks; the
    replicated regularizer is averaged over chunks, i.e. counted once).

    Parity vs make_shardmap_train_step is float-tolerance-tested on the
    virtual 8-device mesh (tests/test_sharded.py); step-time vs barrier
    is measured by bench/scaling.py --overlap.
    """
    import jax.numpy as jnp
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from tpu_gaussians.fit.loss import loss_fn
    from tpu_gaussians.parallel.mesh import VIEW_AXIS

    def local_grads(raw, cameras, targets, masks, depths):
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
        return loss, metrics, grads

    def step(state, cameras, targets, masks, depths):
        def shard_body(raw, view, proj, targets, masks, depths):
            v_local = view.shape[0]
            k = max(1, min(n_chunks, v_local))
            while v_local % k:
                k -= 1  # equal chunks required for exact mean-of-means
            cvs = v_local // k

            losses, mets, reduced = [], [], []
            # Unrolled python loop (k is small + static): every chunk's
            # pmean is an independent collective the scheduler can
            # overlap with the next chunk's fwd+bwd.
            for c in range(k):
                sl = slice(c * cvs, (c + 1) * cvs)
                loss_c, met_c, grads_c = local_grads(
                    raw, Camera(view=view[sl], proj=proj[sl]),
                    targets[sl], masks[sl], depths[sl])
                reduced.append(jax.lax.pmean(grads_c, VIEW_AXIS))
                losses.append(loss_c)
                mets.append(met_c)

            inv_k = 1.0 / k
            grads = jax.tree.map(
                lambda *gs: sum(gs) * inv_k, *reduced)
            loss = jax.lax.pmean(
                sum(losses) * inv_k, VIEW_AXIS)
            metrics = jax.lax.pmean(
                jax.tree.map(lambda *ms: sum(ms) * inv_k, *mets),
                VIEW_AXIS)
            return loss, metrics, grads

        return _apply_grads(state, shard_body, mesh, cameras, targets,
                            masks, depths, tx)

    return jax.jit(step)


def _apply_grads(state, shard_body, mesh, cameras, targets, masks, depths,
                 tx):
    """Shared tail of the shard_map step variants: run `shard_body` over
    the views axis, apply the optax update, accumulate grad stats."""
    import jax.numpy as jnp
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from tpu_gaussians.parallel.mesh import VIEW_AXIS

    vspec = P(VIEW_AXIS)
    loss, metrics, grads = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), vspec, vspec, vspec, vspec, vspec),
        out_specs=(P(), P(), P()),
        check_vma=False,  # scan carries inside the renderer are
                          # device-local; skip varying-axes typing
    )(state.raw, cameras.view, cameras.proj, targets, masks, depths)

    updates, opt_state = tx.update(grads, state.opt_state,
                                   state.raw.trainable())
    new_raw = state.raw.with_trainable(
        optax.apply_updates(state.raw.trainable(), updates)
    )
    gnorm = jnp.linalg.norm(grads["means"], axis=1)
    new_state = TrainState(
        raw=new_raw,
        opt_state=opt_state,
        grad_norm_accum=state.grad_norm_accum + gnorm,
        grad_steps=state.grad_steps + 1,
    )
    metrics["grad_norm_mean"] = jnp.mean(gnorm)
    return new_state, metrics
