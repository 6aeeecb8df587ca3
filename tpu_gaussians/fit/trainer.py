"""Fitting orchestration: the L4 layer (reference: fit_multiview_stub.main,
:200-382) as a reusable library entry.

Drives the jitted train step, fires densify/prune on the reference's
intervals with the reference's optimizer-reset semantics (:318-325), logs
loss (print cadence + loss.txt + structured metrics.jsonl), and emits the
three reference artifacts: gaussians_fitted.npz / loss.txt /
preview_view0.png (:339-380).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_gaussians.core import camera as cam
from tpu_gaussians.core.types import Camera, RenderConfig
from tpu_gaussians.fit.densify import DensifyConfig, densify_and_prune
from tpu_gaussians.fit.loss import LossConfig
from tpu_gaussians.fit.step import (
    init_state,
    make_optimizer,
    make_train_step,
)
from tpu_gaussians.io import image as im
from tpu_gaussians.io.npz import save_raw_npz
from tpu_gaussians.models.gaussian_model import activate, init_params
from tpu_gaussians.utils.config import FitConfig


@dataclass
class FitResult:
    raw: object
    loss_log: list
    cameras: Camera
    wall_time_s: float


def load_dataset(config: FitConfig):
    """Targets + optional masks/depths + cameras, as device-ready arrays."""
    paths = im.list_target_paths(config.targets_dir)
    targets = im.load_targets(paths, config.width, config.height)

    masks = im.load_optional_stem_matched(
        paths, config.masks_dir or None, config.width, config.height
    )
    if masks is None and config.silhouette_weight > 0.0:
        masks = im.estimate_masks(targets, config.mask_thresh)
    depths = im.load_optional_stem_matched(
        paths, config.depth_dir or None, config.width, config.height
    )

    if config.camera_npz:
        cameras = cam.load_cameras_npz(config.camera_npz, len(paths))
        print("Using camera poses from camera_npz")
    else:
        cameras = cam.orbit_cameras(len(paths), config.width, config.height)
        print("Using fallback orbit cameras (for best quality, provide camera_npz)")
    return targets, masks, depths, cameras


def fit(
    config: FitConfig,
    targets: np.ndarray,
    cameras: Camera,
    masks: Optional[np.ndarray] = None,
    depths: Optional[np.ndarray] = None,
    out_dir: Optional[Path] = None,
) -> FitResult:
    """Run the full fitting loop. targets (V,H,W,3); masks/depths (V,H,W)."""
    v = targets.shape[0]
    has_masks = masks is not None and config.silhouette_weight > 0.0
    has_depths = depths is not None and config.depth_weight > 0.0

    targets_j = jnp.asarray(targets, jnp.float32)
    masks_j = (jnp.asarray(masks, jnp.float32) if has_masks
               else jnp.zeros((v, config.height, config.width), jnp.float32))
    depths_j = (jnp.asarray(depths, jnp.float32) if has_depths
                else jnp.zeros((v, config.height, config.width), jnp.float32))

    # Capacity (and the initial params) BEFORE the render config: the
    # render_mode="auto" resolution is capacity-dependent, and an
    # --init_npz can raise capacity past SORTED_EWA_MIN_CAPACITY — an
    # EWA warm-start from a 100k npz must train sorted even when the
    # configured max_gaussians is small (r4 review finding).
    key = jax.random.PRNGKey(config.seed)
    key, k_init = jax.random.split(key)
    capacity = max(config.max_gaussians, config.num_gaussians)
    init_npz = getattr(config, "init_npz", "")
    if init_npz:
        from tpu_gaussians.io.npz import load_gaussians_npz
        from tpu_gaussians.models.gaussian_model import raw_from_gaussians

        g0 = load_gaussians_npz(init_npz)
        capacity = max(capacity, int(np.sum(np.asarray(g0.alive_mask()) > 0.5)))
        raw = raw_from_gaussians(g0, capacity)
        if bool(raw.use_sh) != bool(config.use_sh):
            raise ValueError(
                "--init_npz SH-ness must match --use_sh "
                f"(init has sh={raw.use_sh}, flag use_sh={config.use_sh})")
        print(f"Initialized {int(np.sum(np.asarray(raw.alive_mask()) > .5))} "
              f"gaussians from {init_npz} (capacity {capacity})")
    else:
        raw = init_params(
            k_init, config.num_gaussians, capacity, config.use_sh,
            use_quats=(getattr(config, "footprint", "axis") == "ewa"),
            sh_degree=getattr(config, "sh_degree", 1))

    from tpu_gaussians.utils.config import resolve_render_mode

    mode = resolve_render_mode(config, capacity)
    pair_k = int(getattr(config, "sorted_pair_k", 0))
    if mode == "sorted" and pair_k == 0 and config.impl != "jnp":
        # Measured init-time pair budget (r5): the generic _k_pairs
        # formula over-budgets ~4x for real scenes, and the padded pair
        # sort scales with it. Growth past the budget is observable via
        # the clipped_rect_pairs counter + lossy-render warning.
        from tpu_gaussians.models.gaussian_model import activate
        from tpu_gaussians.ops.pallas.sorted import auto_pair_k

        pair_k = auto_pair_k(
            activate(raw), cameras.view, cameras.proj, config.width,
            config.height, footprint=getattr(config, "footprint", "axis"))
        print(f"sorted pair budget k={pair_k} (measured max rect, "
              f"auto; override with --sorted_pair_k)")
    render_config = RenderConfig(
        width=config.width, height=config.height, impl=config.impl,
        footprint=getattr(config, "footprint", "axis"),
        # "auto" resolves footprint-aware (config.py resolve_render_mode:
        # ewa at >=32k capacity trains sorted, measured faster + lower
        # loss; axis trains accum, the reference semantics AND the
        # fastest r4 path).
        mode=mode,
        accum_binned=getattr(config, "accum_binned", "auto"),
        sorted_pair_k=pair_k,
        return_aux=True,
    )
    loss_config = LossConfig(
        silhouette_weight=config.silhouette_weight,
        depth_weight=config.depth_weight,
        reg_opacity=config.reg_opacity,
        reg_scale=config.reg_scale,
        ssim_weight=getattr(config, "ssim_weight", 0.0),
    )
    densify_config = DensifyConfig(
        densify_interval=config.densify_interval,
        prune_interval=config.prune_interval,
        densify_ratio=config.densify_ratio,
        prune_opacity=config.prune_opacity,
        clone_metric=config.clone_metric,
        split_scale_thresh=float(getattr(config, "split_scale_thresh", 0.0)),
        split_shrink=float(getattr(config, "split_shrink", 1.6)),
    )

    tx = make_optimizer(config.lr)
    state = init_state(raw, tx)

    checkpointer = None
    start_iter = 0
    if out_dir is not None and (config.checkpoint_every > 0 or config.resume):
        from tpu_gaussians.io.checkpoint import Checkpointer

        checkpointer = Checkpointer(Path(out_dir) / "checkpoints")
        if config.resume and checkpointer.latest_step() is not None:
            start_iter, state, key = checkpointer.restore(state, key)
            print(f"Resumed from checkpoint at iter {start_iter}")

    n_shards = getattr(config, "num_view_shards", 1)
    if n_shards > 1:
        from tpu_gaussians.parallel.mesh import make_mesh, replicated, \
            view_sharding
        from tpu_gaussians.parallel.sharded import make_sharded_train_step

        if v % n_shards != 0:
            raise ValueError(
                f"num_view_shards={n_shards} must divide view count {v}")
        mesh = make_mesh(n_shards, 1)
        step_fn = make_sharded_train_step(
            tx, render_config, loss_config, has_masks, has_depths, mesh)
        cameras = Camera(
            view=jax.device_put(cameras.view, view_sharding(mesh, 3)),
            proj=jax.device_put(cameras.proj, view_sharding(mesh, 3)),
        )
        targets_j = jax.device_put(targets_j, view_sharding(mesh, 4))
        masks_j = jax.device_put(masks_j, view_sharding(mesh, 3))
        depths_j = jax.device_put(depths_j, view_sharding(mesh, 3))
        state = jax.device_put(state, replicated(mesh))
        print(f"Sharding {v} views over {n_shards} devices")
    else:
        step_fn = None  # unsharded path runs segment-fused (below)

    # Segment fusion: steps between host events (log / densify / prune /
    # checkpoint) run inside ONE on-device fori_loop with a dynamic trip
    # count — one executable serves every segment length, and per-step
    # metrics land in a device-resident (MAX_SEG, K) buffer fetched only
    # at the end. This removes the per-step dispatch round trip entirely
    # (the reference dispatches eagerly per op, fit_multiview_stub.py:265).
    METRIC_KEYS = ("loss", "recon", "silhouette", "depth", "reg", "psnr",
                   "ssim", "n_alive", "grad_norm_mean",
                   "binner_dropped_pairs", "binner_full_tiles",
                   "binner_clipped_rect_pairs")
    MAX_SEG = 256
    warned_lossy = False  # warn ONCE when a step's render dropped work

    # 3DGS-style exponential positional-lr decay (piecewise-constant per
    # segment; exact at segment starts). means_lr_final = 1 -> constant.
    mlr_final = float(getattr(config, "means_lr_final", 1.0))

    def means_lr_at(i: int) -> float:
        if mlr_final >= 1.0 or config.iters <= 0:
            return 1.0
        return mlr_final ** (i / config.iters)

    if n_shards == 1:
        inner = make_train_step(tx, render_config, loss_config,
                                has_masks, has_depths, jit=False)

        def multi(st, cams_a, t_a, m_a, d_a, k, mlr):
            def body(i, carry):
                s, buf = carry
                s2, metrics = inner(s, cams_a, t_a, m_a, d_a,
                                    means_lr_scale=mlr)
                row = jnp.stack([metrics[mk].astype(jnp.float32)
                                 for mk in METRIC_KEYS])
                return (s2, jax.lax.dynamic_update_index_in_dim(
                    buf, row, i, 0))
            buf0 = jnp.zeros((MAX_SEG, len(METRIC_KEYS)), jnp.float32)
            return jax.lax.fori_loop(0, k, body, (st, buf0))

        multi_jit = jax.jit(multi, donate_argnums=(0,))

    opacity_reset_interval = int(getattr(config, "opacity_reset_interval", 0))

    def next_event(it: int) -> int:
        nxt = config.iters
        for interval in (config.log_every, config.densify_interval,
                         config.prune_interval, config.checkpoint_every,
                         opacity_reset_interval):
            if interval and interval > 0:
                nxt = min(nxt, ((it // interval) + 1) * interval)
        return nxt

    seg_bufs = []  # [(buf (MAX_SEG, K) device array, seg_len)]
    t0 = time.perf_counter()
    last_log_t, last_log_it = t0, start_iter
    it = start_iter
    while it < config.iters:
        if n_shards == 1:
            # First step runs alone so the reference's iter-1 log line
            # still appears (fit_multiview_stub.py:313-316).
            seg = 1 if it == start_iter else min(next_event(it) - it, MAX_SEG)
            state, buf = multi_jit(state, cameras, targets_j, masks_j,
                                   depths_j, seg,
                                   jnp.float32(means_lr_at(it)))
        else:
            seg = 1
            state, metrics = step_fn(state, cameras, targets_j, masks_j,
                                     depths_j)
            buf = jnp.stack([metrics[mk].astype(jnp.float32)
                             for mk in METRIC_KEYS])[None, :]
        seg_bufs.append((buf, seg))
        it += seg

        if it == start_iter + 1 or (config.log_every > 0
                                    and it % config.log_every == 0):
            lv = float(buf[seg - 1, 0])
            n = int(buf[seg - 1, METRIC_KEYS.index("n_alive")])
            now = time.perf_counter()
            steps = max(it - last_log_it, 1)
            rate = v * config.width * config.height * steps / max(
                now - last_log_t, 1e-9)
            last_log_t, last_log_it = now, it
            print(f"iter {it:4d}  loss={lv:.6f}  N={n}  "
                  f"{rate/1e6:.1f} Mpix/s")
            if not warned_lossy:
                dropped = float(buf[seg - 1, METRIC_KEYS.index(
                    "binner_dropped_pairs")])
                clipped = float(buf[seg - 1, METRIC_KEYS.index(
                    "binner_clipped_rect_pairs")])
                if dropped > 0 or clipped > 0:
                    warned_lossy = True
                    print(
                        f"WARNING: this step's render dropped work to "
                        f"capacity/budget limits ({dropped:.0f} pairs at "
                        f"tile capacity, {clipped:.0f} rect-budget "
                        f"overlaps; conservative W_CULL extents in accum "
                        f"mode). Counters are in metrics.jsonl; raise "
                        f"tile capacity / use accum_binned=off if "
                        f"exactness matters.")

        densify_fires = (config.densify_interval > 0
                         and it % config.densify_interval == 0)
        prune_fires = (config.prune_interval > 0
                       and it % config.prune_interval == 0)
        if densify_fires or prune_fires:
            key, k_d = jax.random.split(key)
            ratio = config.densify_ratio if densify_fires else 0.0
            new_raw, dstats = densify_and_prune(
                state.raw, k_d, densify_config, densify_ratio=ratio,
                grad_norm_accum=state.grad_norm_accum,
                grad_steps=state.grad_steps,
            )
            state = init_state(new_raw, tx)  # fresh Adam, :325

        if (opacity_reset_interval > 0 and it % opacity_reset_interval == 0
                and it < config.iters):
            # 3DGS opacity reset: clamp op <= reset value (sigmoid is
            # monotone, so clamp the raw logit) and drop optimizer state
            # so Adam's moments don't instantly undo it.
            rv = float(getattr(config, "opacity_reset_value", 0.01))
            logit = float(np.log(rv) - np.log1p(-rv))
            import dataclasses as _dc
            new_raw = _dc.replace(
                state.raw,
                opacities_raw=jnp.minimum(state.raw.opacities_raw, logit))
            state = init_state(new_raw, tx)

        if (checkpointer is not None and config.checkpoint_every > 0
                and it % config.checkpoint_every == 0):
            checkpointer.save(it, state, key)

    jax.block_until_ready(state.raw.means)
    wall = time.perf_counter() - t0

    # One batched fetch of the whole metrics history.
    if seg_bufs:
        hist = np.concatenate(
            [np.asarray(buf)[:seg] for buf, seg in seg_bufs], axis=0)
        stacked = {mk: hist[:, i] for i, mk in enumerate(METRIC_KEYS)}
    else:
        stacked = {"loss": np.zeros((0,), np.float32)}
    loss_log = [float(v) for v in stacked["loss"]]

    if out_dir is not None and config.metrics_jsonl and seg_bufs:
        out_dir.mkdir(parents=True, exist_ok=True)
        mode = "a" if start_iter > 0 else "w"
        with (out_dir / "metrics.jsonl").open(mode) as metrics_file:
            for i in range(len(loss_log)):
                metrics_file.write(json.dumps(
                    {"step": start_iter + i + 1,
                     **{k: float(stacked[k][i]) for k in stacked}}
                ) + "\n")

    return FitResult(raw=state.raw, loss_log=loss_log, cameras=cameras,
                     wall_time_s=wall)


def write_artifacts(
    out_dir: Path, result: FitResult, config: FitConfig
) -> None:
    """Emit the reference's three artifacts (fit_multiview_stub.py:339-380)."""
    out_dir.mkdir(parents=True, exist_ok=True)
    save_raw_npz(out_dir / "gaussians_fitted.npz", result.raw)
    (out_dir / "loss.txt").write_text(
        "\n".join(f"{v:.8f}" for v in result.loss_log), encoding="utf-8"
    )

    g = activate(result.raw)
    cam0 = result.cameras[0] if result.cameras.batched else result.cameras
    render_config = RenderConfig(
        width=config.width, height=config.height, impl=config.impl,
        footprint=getattr(config, "footprint", "axis"),
    )
    from tpu_gaussians.ops.dispatch import render

    # jit: eager per-op dispatch is pathologically slow on remote-compile
    # runtimes (one AOT compile per op).
    pred0 = jax.jit(
        lambda gg, view, proj: render(gg, Camera(view=view, proj=proj),
                                      render_config)
    )(g, cam0.view, cam0.proj)
    im.save_image_png(out_dir / "preview_view0.png", np.asarray(pred0))
