"""Public render entry point with implementation dispatch.

The TPU analog of the reference's backend dispatch
(renderer_dispatch.cpp:5-21): instead of a compile-time CUDA flag +
`force_cpu`, a RenderConfig.impl of "auto"/"jnp"/"pallas" selects between
the pure-jnp oracle and the fused Pallas kernels; "auto" picks Pallas on
TPU and jnp elsewhere. Both implementations are differentiable and agree
to float tolerance (enforced by tests/test_pallas_parity.py).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

from tpu_gaussians.core.types import (
    Array,
    Camera,
    Gaussians,
    RenderConfig,
    validate_camera,
    validate_gaussians,
)
from tpu_gaussians.ops import jnp_renderer
from tpu_gaussians.ops.common import prepare_splats, resolve_accum
from tpu_gaussians.ops.projection import camera_z


def _resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    return "pallas" if jax.default_backend() == "tpu" else "jnp"


_warned: set = set()


def _warn_ignored(knobs: str, path: str) -> None:
    """One-time trace-time warning when a path-specific RenderConfig knob
    is set on a path that ignores it (e.g. accum_cull='alpha' at small n
    auto-selects the dense kernels and renders exact) — so benchmarking a
    knob never silently measures the un-knobbed path."""
    msg = f"RenderConfig {knobs} ignored on the {path} path"
    if msg not in _warned:
        _warned.add(msg)
        import warnings

        warnings.warn(msg, stacklevel=3)


def zero_overflow_stats() -> dict:
    """The no-binner stats dict (dense kernels / jnp oracle are exact)."""
    return {"dropped_pairs": jnp.zeros((), jnp.int32),
            "full_tiles": jnp.zeros((), jnp.int32),
            "clipped_rect_pairs": jnp.zeros((), jnp.int32)}


def render_accum(
    g: Gaussians, view: Array, proj: Array, config: RenderConfig,
    row0: Union[Array, float, None] = None, return_stats: bool = False,
) -> Tuple[Array, ...]:
    """Weighted-average mode -> (image, alpha, depth). Differentiable.

    row0 (optional, traced ok): render the row window [row0, row0 +
    config.height) of the full frame the camera was built for — weights
    depend only on gy - py, so shifting py is exact (parallel/tiled.py).
    Projection and sigmas must be computed against the FULL frame height,
    so the camera/proj stay those of the full frame; config.height is the
    WINDOW height.

    return_stats appends the binner overflow-counter dict (zeros for the
    exact dense/jnp paths) — the runtime observability of the scale
    approximations (VERDICT r1 item #6).
    """
    s = prepare_splats(g, view, proj, config.width, config.full_height(),
                       footprint=config.footprint)
    if row0 is not None:
        s = s._replace(py=s.py - row0)
    impl = _resolve_impl(config.impl)
    stats = zero_overflow_stats()
    if impl == "pallas":
        from tpu_gaussians.ops.pallas import binned as pallas_binned
        from tpu_gaussians.ops.pallas import splat as pallas_splat

        n = s.px.shape[0]
        axis = config.footprint == "axis"
        if axis:
            # r4: the axis dense-sep kernels beat binned at every n that
            # fits VMEM (BASELINE.md r4 sweep: 100k/1024^2 dense 26.2 vs
            # binned 63.5 ms; 300k: 97.4 vs 210.7). r5: beyond the VMEM
            # capacity the sep path streams gaussian super-blocks
            # (splat.py _sep_pass_bounds) — exact and measured faster
            # than binned at 500k/1M — so binned never auto-serves axis.
            auto_binned = False
        else:
            auto_binned = n >= pallas_binned.binned_min_n(False)
        use_binned = (config.accum_binned == "on"
                      or (config.accum_binned == "auto" and auto_binned))
        if use_binned:
            acc, stats = pallas_binned.splat_accumulate_binned(
                s, config.height, config.width, axis=axis,
                return_stats=True,
                tile_capacity=config.accum_tile_capacity,
                cutoff=(pallas_binned.ALPHA_CUTOFF
                        if config.accum_cull == "alpha"
                        else pallas_binned.W_CULL),
            )
        else:
            if config.accum_cull != "exact" or config.accum_tile_capacity:
                # Static path label (no per-n text: the dedup key would
                # otherwise emit one warning per scene size and grow
                # _warned unboundedly in long-lived servers).
                _warn_ignored("accum_cull/accum_tile_capacity",
                              "dense pallas (auto chose dense: axis "
                              "always / n < binned_min_n for ewa)")
            acc = pallas_splat.splat_accumulate(
                s, config.height, config.width, axis=axis,
            )
    else:
        if config.accum_cull != "exact" or config.accum_tile_capacity:
            _warn_ignored("accum_cull/accum_tile_capacity", "jnp accum")
        acc = jnp_renderer.accumulate_jnp(
            s, config.height, config.width, chunk=config.chunk_size
        )
    out = resolve_accum(
        acc, config.background_array(), config.height, config.width
    )
    return out + (stats,) if return_stats else out


def render_sorted(
    g: Gaussians, view: Array, proj: Array, config: RenderConfig,
    row0: Union[Array, float, None] = None, return_stats: bool = False,
) -> Tuple[Array, ...]:
    """Depth-sorted front-to-back mode -> (image, alpha, depth)
    [+ binner overflow stats when return_stats].

    depth is the alpha-weighted expected camera depth (enables depth
    supervision in sorted training, fit_multiview_stub.py:299-303).

    Differentiable on BOTH paths: the jnp oracle via autodiff, the pallas
    path via a hand-fused backward kernel (ops/pallas/sorted.py
    _sorted_bwd_kernel — the BASELINE north star's per-tile fused VJP;
    the reference's own depth-sorted path is forward-only,
    renderer_cpu.cpp:125-217). row0: see render_accum.
    """
    s = prepare_splats(g, view, proj, config.width, config.full_height(),
                       footprint=config.footprint)
    if row0 is not None:
        s = s._replace(py=s.py - row0)
    z = camera_z(g.means, view)
    if _resolve_impl(config.impl) == "pallas":
        from tpu_gaussians.ops.pallas import sorted as pallas_sorted

        return pallas_sorted.sorted_composite_pallas(
            s, z, config.background_array(), config.height, config.width,
            band_capacity=config.sorted_band_capacity,
            axis=(config.footprint == "axis"),
            return_stats=return_stats,
            exit_t=(config.sorted_exit_t if config.sorted_exit_t > 0
                    else pallas_sorted.EXIT_T),
            pair_k=config.sorted_pair_k,
        )
    if (config.sorted_pair_k or config.sorted_band_capacity
            or config.sorted_exit_t):
        _warn_ignored("sorted_pair_k/exit_t/band_capacity",
                      "jnp sorted (exact)")
    out = jnp_renderer.composite_sorted(
        s, z, config.background_array(), config.height, config.width,
        chunk=min(config.chunk_size, 64),
    )
    return out + (zero_overflow_stats(),) if return_stats else out


def render(
    gaussians: Gaussians,
    camera: Camera,
    config: RenderConfig,
    validate: bool = False,
) -> Union[Array, Tuple[Array, ...]]:
    """Render a Gaussian set from one camera (or a batched camera via vmap).

    Returns image (H,W,3), or (image, alpha, depth) when
    config.return_aux (both modes emit an expected-depth aux). With a
    batched Camera (V,4,4) all outputs gain a leading V axis.
    """
    if validate:
        validate_gaussians(gaussians)
        validate_camera(camera)

    def render_one(view, proj):
        if config.mode == "sorted":
            image, alpha, depth = render_sorted(gaussians, view, proj,
                                                config)
        else:
            image, alpha, depth = render_accum(gaussians, view, proj,
                                               config)
        return (image, alpha, depth) if config.return_aux else image

    if camera.batched:
        # Sequential lax.map, NOT vmap: batch-vmapping the sorted Pallas
        # pipeline hits a deterministic TPU-runtime kernel fault at
        # specific (n, views) shape combinations (r5 bisect: n=17678 or
        # 17920 x 6 views @256^2 crashes the worker; 17408x6, 17678x5,
        # and 32768x6 all run; CPU-interpret, the binner alone, and the
        # kernel alone with synthetic data are all clean — a fused-graph
        # resonance in the closed runtime, not an indexing bug). The
        # training path (fit/loss.py) keeps its vmap: it runs at
        # 512-aligned capacity shapes, which measured clean, and its
        # throughput depends on cross-view batching. Rendering here is
        # kernel-bound per view, so the sequential map costs little.
        return jax.lax.map(
            lambda vp: render_one(vp[0], vp[1]),
            (camera.view, camera.proj))
    return render_one(camera.view, camera.proj)
