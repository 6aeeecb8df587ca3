"""Tile-binned accumulation kernels: the at-scale training path.

The dense v1/v2 accumulation kernels (ops/pallas/splat.py) cull only on
the y axis (py-sorted block ranges per pixel band), so at large N with
small splats most (gaussian, pixel) work is wasted. This module reuses
the sorted path's 2D tile binner (ops/pallas/sorted.py _bin_pairs_2d,
zsort=False — accumulation is order-independent, so lists are ordered by
opacity DESCENDING instead of depth and capacity overflow drops the
weakest gaussians) to build dense per-tile gaussian lists, and
accumulates only true (gaussian, tile) overlaps. Measured 2-3x faster
than the band kernels at 100k gaussians for fwd+bwd (1.9x @512^2,
2.9x @1024^2).

Parity: the binning cutoff is W_CULL (1e-14), the same conservative
threshold the dense kernels cull with — when nothing is budget- or
capacity-dropped (per-tile load <= tile_capacity and rects within the
pair budget, true for small/medium scenes and trained large scenes),
the binned output stays allclose with the dense oracle
(torch_renderer.py:146-196 semantics). Two documented approximations
engage at scale: per-gaussian tile rects are budgeted to k tiles
(huge-splat tails re-centered, see _tile_rects), and per-tile lists keep
only the tile_capacity STRONGEST gaussians (opacity-descending order).
Force accum_binned="off" (RenderConfig / --accum_binned) for exactness
at any cost.

Backward: hand-fused per-tile kernel (recompute-w, like the v2 backward)
emitting raw moments [Mdx, Mdy, Mxx, Mxy, Myy, M0] + g_feat per SLOT;
the O(N) chain-rule post-pass applies conic constants, and the slot->
gaussian scatter-add falls out of JAX AD through the list gather.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_gaussians.core.types import Array
from tpu_gaussians.ops.common import FEAT_DIM, SplatInputs
from tpu_gaussians.ops.pallas.sorted import (
    NBS,
    TH,
    TPS,
    TWC,
    _bin_pairs_2d,
    _k_pairs,
    crop_tiled_acc,
    moment_postpass,
    pack_gdataT,
    pack_gdataT_prio,
)
from tpu_gaussians.ops.pallas.splat import (
    FEAT_PAD,
    GD_ROWS,
    W_CULL,
    _interpret,
    _round_up,
)

# Below this many gaussians the dense v2 kernels win (binning overhead
# exceeds the culling gain); above it, binned lists win and keep winning.
BINNED_MIN_N = 32_768

# W_CULL extents (~8 sigma) are much wider than the sorted path's
# alpha-cutoff extents, so the binned-accum tile budget gets a larger
# pair budget and floor (at 1M gaussians: K=24 vs the sorted path's 12).
# Rects beyond the budget are still shrunk re-centered — a documented
# approximation for huge-splat tails, negligible for real scenes.
ACCUM_PAIR_BUDGET = 24_000_000
ACCUM_K_MIN = 16


def _binned_fwd_kernel(cnt_ref, gdense_ref, acc_ref,
                       *, tiles_x: int, chunks_per_tile: int):
    i = pl.program_id(0)  # tile
    j = pl.program_id(1)  # chunk within tile

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j * NBS < cnt_ref[0, i])
    def _():
        ty = i // tiles_x
        tx = i % tiles_x
        pix = jax.lax.broadcasted_iota(jnp.int32, (1, TPS), dimension=1)
        gx = (tx * TWC + pix % TWC).astype(jnp.float32) + 0.5   # (1, TP)
        gy = (ty * TH + pix // TWC).astype(jnp.float32) + 0.5

        acc = acc_ref[:]
        sub = NBS // 4
        for sb in range(4):
            gd = gdense_ref[sb * sub:(sb + 1) * sub, :]  # (sub, GD_ROWS)
            dx = gx - gd[:, 0:1]                 # (sub, TP)
            dy = gy - gd[:, 1:2]
            e = -0.5 * (gd[:, 2:3] * dx * dx
                        + 2.0 * gd[:, 3:4] * dx * dy
                        + gd[:, 4:5] * dy * dy)
            w = gd[:, 5:6] * jnp.exp(e)          # no cutoff: parity accum
            feats = gd[:, 6:14]                  # (sub, 8)
            acc = acc + jax.lax.dot_general(
                feats, w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision="highest",
            )                                    # (8, TP)
        acc_ref[:] = acc


def _binned_bwd_kernel(cnt_ref, gdense_ref, g8_ref, out_ref,
                       *, tiles_x: int, chunks_per_tile: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(j * NBS < cnt_ref[0, i])
    def _():
        ty = i // tiles_x
        tx = i % tiles_x
        pix = jax.lax.broadcasted_iota(jnp.int32, (1, TPS), dimension=1)
        gx = (tx * TWC + pix % TWC).astype(jnp.float32) + 0.5
        gy = (ty * TH + pix // TWC).astype(jnp.float32) + 0.5
        g8 = g8_ref[:]                           # (8, TP)

        sub = NBS // 4
        for sb in range(4):
            gd = gdense_ref[sb * sub:(sb + 1) * sub, :]
            dx = gx - gd[:, 0:1]
            dy = gy - gd[:, 1:2]
            dx2 = dx * dx
            dxy = dx * dy
            dy2 = dy * dy
            e = -0.5 * (gd[:, 2:3] * dx2 + 2.0 * gd[:, 3:4] * dxy
                        + gd[:, 4:5] * dy2)
            w = gd[:, 5:6] * jnp.exp(e)
            feats = gd[:, 6:14]

            # g_w[i,p] = sum_f feats[i,f] * g8[f,p]      (MXU)
            g_w = jnp.dot(feats, g8,
                          preferred_element_type=jnp.float32,
                          precision="highest")   # (sub, TP)
            g_e = w * g_w
            m0 = jnp.sum(g_e, axis=1, keepdims=True)
            mdx = jnp.sum(g_e * dx, axis=1, keepdims=True)
            mdy = jnp.sum(g_e * dy, axis=1, keepdims=True)
            mxx = jnp.sum(g_e * dx2, axis=1, keepdims=True)
            mxy = jnp.sum(g_e * dxy, axis=1, keepdims=True)
            myy = jnp.sum(g_e * dy2, axis=1, keepdims=True)
            # g_feat[i,f] = sum_p w[i,p] * g8[f,p]       (MXU)
            g_feat = jax.lax.dot_general(
                w, g8, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision="highest",
            )                                    # (sub, 8)
            out_ref[sb * sub:(sb + 1) * sub, :] = jnp.concatenate(
                [mdx, mdy, mxx, mxy, myy, m0, g_feat,
                 jnp.zeros((sub, GD_ROWS - 6 - FEAT_PAD), jnp.float32)],
                axis=1)


# ---------------------------------- separable kernels (axis footprint)
#
# Same rank-1 factorization as ops/pallas/splat.py's separable band
# kernels, specialized to the 16x128 tile layout with gaussians on
# sublanes: w[i,(r,c)] = op_i*exp(a2_i*tx^2)*exp(c2_i*ty^2), so a
# 128-gaussian sub-block contributes via ONE full-128x128 MXU matmul
#   acc[(f,r), c] += sum_i G2[i, f*TH+r] * Ex[i, c],
# with G2 = featsOp (x) Ey built from (sub, TH) / (sub, 8) factors. The
# backward routes cotangents through the factors (gG2 = Ex@gband^T,
# gEx = G2@gband) and contracts the (f, r) lane groups with constant 0/1
# selector matmuls. Exp count per sub-block drops from sub*TPS to
# sub*(TWC+TH) (~14x). Requires conic b == 0 (the axis footprint; its b
# is a constant so g_cb = 0 is exact); EWA keeps the general kernels.

_SUB = 128  # gaussian sub-block (full MXU contraction depth)


def _sep_tile_factors(gd, gx_c, gy_r):
    """Per-sub-block factors from a row-major gdense slice (sub, GD_ROWS):
    returns (tx, ex, ty, ey, featsop, g2)."""
    tx = gx_c - gd[:, 0:1]                   # (sub, TWC)
    a2 = -0.5 * gd[:, 2:3]
    ex = jnp.exp(a2 * (tx * tx))
    ty = gy_r - gd[:, 1:2]                   # (sub, TH)
    c2 = -0.5 * gd[:, 4:5]
    ey = jnp.exp(c2 * (ty * ty))
    featsop = gd[:, 6:14] * gd[:, 5:6]       # (sub, 8)
    g2 = jnp.concatenate(
        [featsop[:, f : f + 1] * ey for f in range(FEAT_PAD)], axis=1
    )                                        # (sub, 8*TH) lanes (f, r)
    return tx, ex, ty, ey, featsop, g2


def _sep_tile_coords(i, tiles_x: int):
    ty_t = i // tiles_x
    tx_t = i % tiles_x
    gx_c = (tx_t * TWC + jax.lax.broadcasted_iota(
        jnp.int32, (1, TWC), dimension=1)).astype(jnp.float32) + 0.5
    gy_r = (ty_t * TH + jax.lax.broadcasted_iota(
        jnp.int32, (1, TH), dimension=1)).astype(jnp.float32) + 0.5
    return gx_c, gy_r


def _binned_fwd_kernel_sep(cnt_ref, gdense_ref, acc_ref,
                           *, tiles_x: int, chunks_per_tile: int):
    i = pl.program_id(0)  # tile
    j = pl.program_id(1)  # chunk within tile

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j * NBS < cnt_ref[0, i])
    def _():
        gx_c, gy_r = _sep_tile_coords(i, tiles_x)
        acc = acc_ref[:]                     # (8*TH, TWC) rows (f, r)
        for sb in range(NBS // _SUB):
            gd = gdense_ref[sb * _SUB:(sb + 1) * _SUB, :]
            _, ex, _, _, _, g2 = _sep_tile_factors(gd, gx_c, gy_r)
            acc = acc + jax.lax.dot_general(
                g2, ex, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision="highest",
            )                                # (8*TH, TWC)
        acc_ref[:] = acc


def _binned_bwd_kernel_sep(cnt_ref, gdense_ref, gband_ref, out_ref,
                           *, tiles_x: int, chunks_per_tile: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(j * NBS < cnt_ref[0, i])
    def _():
        gx_c, gy_r = _sep_tile_coords(i, tiles_x)
        gb = gband_ref[:]                    # (8*TH, TWC) rows (f, r)
        # Constant 0/1 selectors: S sums each f-group of TH lanes,
        # T sums across f for each r (lane l = f*TH + r).
        lanes = jax.lax.broadcasted_iota(jnp.int32, (FEAT_PAD * TH, 1), 0)
        sel_f = (lanes // TH == jax.lax.broadcasted_iota(
            jnp.int32, (1, FEAT_PAD), 1)).astype(jnp.float32)
        sel_r = (lanes % TH == jax.lax.broadcasted_iota(
            jnp.int32, (1, TH), 1)).astype(jnp.float32)

        for sb in range(NBS // _SUB):
            gd = gdense_ref[sb * _SUB:(sb + 1) * _SUB, :]
            tx, ex, ty, ey, featsop, g2 = _sep_tile_factors(gd, gx_c, gy_r)

            # gG2[i, (f,r)] = sum_c gband[(f,r), c] * Ex[i, c]
            g_g2 = jax.lax.dot_general(
                ex, gb, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision="highest",
            )                                # (sub, 8*TH)
            # gEx[i, c] = sum_{(f,r)} gband[(f,r), c] * G2[i, (f,r)]
            g_ex = jax.lax.dot_general(
                g2, gb, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision="highest",
            )                                # (sub, TWC)

            # Lane-group contractions via the 0/1 selectors (exact):
            # g_featop[i, f] = sum_r gG2[i, f*TH+r] * ey[i, r]
            eyrep = jnp.concatenate([ey] * FEAT_PAD, axis=1)  # (sub, 8*TH)
            g_featop = jnp.dot(
                g_g2 * eyrep, sel_f,
                preferred_element_type=jnp.float32, precision="highest",
            )                                # (sub, 8)
            # gEy[i, r] = sum_f gG2[i, f*TH+r] * featsop[i, f]
            featsrep = jnp.concatenate(
                [featsop[:, f : f + 1] * jnp.ones((1, TH), jnp.float32)
                 for f in range(FEAT_PAD)], axis=1)           # (sub, 8*TH)
            g_ey = jnp.dot(
                g_g2 * featsrep, sel_r,
                preferred_element_type=jnp.float32, precision="highest",
            )                                # (sub, TH)

            u_x = g_ex * ex                  # (sub, TWC)
            t1 = u_x * tx
            mdx = jnp.sum(t1, axis=1, keepdims=True)          # (sub, 1)
            mxx = jnp.sum(t1 * tx, axis=1, keepdims=True)
            u_y = g_ey * ey                  # (sub, TH)
            t2 = u_y * ty
            mdy = jnp.sum(t2, axis=1, keepdims=True)
            myy = jnp.sum(t2 * ty, axis=1, keepdims=True)

            out_ref[sb * _SUB:(sb + 1) * _SUB, :] = jnp.concatenate(
                [mdx, mdy, mxx, jnp.zeros((_SUB, 1), jnp.float32), myy,
                 jnp.zeros((_SUB, 1), jnp.float32), g_featop,
                 jnp.zeros((_SUB, GD_ROWS - 6 - FEAT_PAD), jnp.float32)],
                axis=1)


def moment_postpass_opfold(gdense: Array, raw: Array) -> Array:
    """Post-pass for the separable (op-folded) backward: raw slot rows
    [Mdx, Mdy, Mxx, 0, Myy, 0, g_featop(8)] -> gdense-layout gradients.
    g_feat = op * g_featop (product rule), g_op = sum_f feats_f *
    g_featop_f; conic b is the axis constant 0 (g_cb = 0 exact)."""
    a, c = gdense[:, 2], gdense[:, 4]
    op = gdense[:, 5]
    feats = gdense[:, 6:6 + FEAT_PAD]
    mdx, mdy = raw[:, 0], raw[:, 1]
    mxx, myy = raw[:, 2], raw[:, 4]
    g_featop = raw[:, 6:6 + FEAT_PAD]
    g_head = jnp.stack(
        [a * mdx, c * mdy,
         -0.5 * mxx, jnp.zeros_like(mdx), -0.5 * myy,
         jnp.sum(feats * g_featop, axis=1)],
        axis=1)
    return jnp.concatenate(
        [g_head, g_featop * op[:, None],
         jnp.zeros_like(raw[:, 6 + FEAT_PAD:])], axis=1)


def _binned_fwd_call(gdense, cnt, tiles_x: int, n_tiles: int,
                     chunks_per_tile: int) -> Array:
    return pl.pallas_call(
        functools.partial(_binned_fwd_kernel, tiles_x=tiles_x,
                          chunks_per_tile=chunks_per_tile),
        grid=(n_tiles, chunks_per_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # cnt
            pl.BlockSpec((NBS, GD_ROWS),
                         lambda i, j: (i * chunks_per_tile + j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FEAT_PAD, TPS), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((FEAT_PAD, n_tiles * TPS),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(cnt, gdense)


def _binned_bwd_call(gdense, cnt, g8, tiles_x: int, n_tiles: int,
                     chunks_per_tile: int) -> Array:
    rows = gdense.shape[0]
    return pl.pallas_call(
        functools.partial(_binned_bwd_kernel, tiles_x=tiles_x,
                          chunks_per_tile=chunks_per_tile),
        grid=(n_tiles, chunks_per_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # cnt
            pl.BlockSpec((NBS, GD_ROWS),
                         lambda i, j: (i * chunks_per_tile + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FEAT_PAD, TPS), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),    # g8 (cotangent)
        ],
        out_specs=pl.BlockSpec((NBS, GD_ROWS),
                               lambda i, j: (i * chunks_per_tile + j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, GD_ROWS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(cnt, gdense, g8)


def _binned_fwd_call_sep(gdense, cnt, tiles_x: int, n_tiles: int,
                         chunks_per_tile: int) -> Array:
    br = FEAT_PAD * TH
    return pl.pallas_call(
        functools.partial(_binned_fwd_kernel_sep, tiles_x=tiles_x,
                          chunks_per_tile=chunks_per_tile),
        grid=(n_tiles, chunks_per_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # cnt
            pl.BlockSpec((NBS, GD_ROWS),
                         lambda i, j: (i * chunks_per_tile + j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, TWC), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * br, TWC), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(cnt, gdense)


def _binned_bwd_call_sep(gdense, cnt, gband, tiles_x: int, n_tiles: int,
                         chunks_per_tile: int) -> Array:
    rows = gdense.shape[0]
    br = FEAT_PAD * TH
    return pl.pallas_call(
        functools.partial(_binned_bwd_kernel_sep, tiles_x=tiles_x,
                          chunks_per_tile=chunks_per_tile),
        grid=(n_tiles, chunks_per_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # cnt
            pl.BlockSpec((NBS, GD_ROWS),
                         lambda i, j: (i * chunks_per_tile + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, TWC), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),    # gband (f,r) x c
        ],
        out_specs=pl.BlockSpec((NBS, GD_ROWS),
                               lambda i, j: (i * chunks_per_tile + j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, GD_ROWS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(cnt, gdense, gband)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _binned_core_sep(gdense, cnt, tiles_x, n_tiles, chunks_per_tile):
    """Separable-kernel variant of _binned_core (axis footprint only);
    same (FEAT_PAD, n_tiles*TPS) output layout."""
    return _binned_core_sep_fwd(gdense, cnt, tiles_x, n_tiles,
                                chunks_per_tile)[0]


def _sep_acc_to_tiled(out: Array, n_tiles: int) -> Array:
    """(n_tiles*8*TH, TWC) rows (tile, f, r) -> (FEAT_PAD, n_tiles*TPS)."""
    return out.reshape(n_tiles, FEAT_PAD, TH, TWC).transpose(
        1, 0, 2, 3).reshape(FEAT_PAD, n_tiles * TPS)


def _binned_core_sep_fwd(gdense, cnt, tiles_x, n_tiles, chunks_per_tile):
    out = _binned_fwd_call_sep(gdense, cnt, tiles_x, n_tiles,
                               chunks_per_tile)
    return _sep_acc_to_tiled(out, n_tiles), (gdense, cnt)


def _binned_core_sep_bwd(tiles_x, n_tiles, chunks_per_tile, res, g_acc):
    import numpy as np

    gdense, cnt = res
    gband = g_acc.reshape(FEAT_PAD, n_tiles, TH, TWC).transpose(
        1, 0, 2, 3).reshape(n_tiles * FEAT_PAD * TH, TWC)
    raw = _binned_bwd_call_sep(gdense, cnt, gband, tiles_x, n_tiles,
                               chunks_per_tile)
    g_cnt = np.zeros(cnt.shape, jax.dtypes.float0)
    return moment_postpass_opfold(gdense, raw), g_cnt


_binned_core_sep.defvjp(_binned_core_sep_fwd, _binned_core_sep_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _binned_core(gdense, cnt, tiles_x, n_tiles, chunks_per_tile):
    """acc (FEAT_PAD, n_tiles*TPS) accumulated over dense per-tile lists;
    differentiable in gdense via the fused backward."""
    return _binned_fwd_call(gdense, cnt, tiles_x, n_tiles, chunks_per_tile)


def _binned_core_fwd(gdense, cnt, tiles_x, n_tiles, chunks_per_tile):
    acc = _binned_fwd_call(gdense, cnt, tiles_x, n_tiles, chunks_per_tile)
    return acc, (gdense, cnt)


def _binned_core_bwd(tiles_x, n_tiles, chunks_per_tile, res, g_acc):
    import numpy as np

    gdense, cnt = res
    raw = _binned_bwd_call(gdense, cnt, g_acc, tiles_x, n_tiles,
                           chunks_per_tile)
    g_cnt = np.zeros(cnt.shape, jax.dtypes.float0)
    return moment_postpass(gdense, raw), g_cnt


_binned_core.defvjp(_binned_core_fwd, _binned_core_bwd)


def splat_accumulate_binned(
    s: SplatInputs, height: int, width: int, tile_capacity: int = 0,
    axis: bool = False,
) -> Array:
    """Tile-binned drop-in for splat_accumulate -> acc (H*W, FEAT_DIM).

    Order-independent accumulation over per-tile gaussian lists built
    with the W_CULL extent (parity with the dense kernels). Gradients
    flow through the fused binned backward + the list-gather's AD
    scatter-add; binning itself is non-differentiable selection.

    axis=True (caller-asserted: conic b == 0) selects the separable
    tile kernels (one full-MXU matmul per 128-gaussian sub-block,
    ~14x fewer exps).
    """
    n = s.px.shape[0]
    tiles_x = _round_up(width, TWC) // TWC
    tiles_y = _round_up(height, TH) // TH
    n_tiles = tiles_x * tiles_y

    k = _k_pairs(n, budget=ACCUM_PAIR_BUDGET, kmin=ACCUM_K_MIN)
    if tile_capacity <= 0:
        # Default: cap at n (small scenes: lossless) or 8192. Lists are
        # opacity-DESCENDING (zsort=False priority, _bin_pairs_2d), so
        # overflow keeps each tile's 8192 STRONGEST gaussians — a
        # training-grade approximation for scenes whose W_CULL extents
        # stack deeper than that (e.g. random init at high N); trained
        # scenes' small splats fit losslessly. Gather/backward cost
        # scales with the cap, so bigger caps trade accuracy for time
        # (measured: 8192 -> 16384 costs ~1.5-1.9x); raise via
        # tile_capacity or force accum_binned="off" for exactness.
        tile_capacity = min(_round_up(n, NBS), max(8192, NBS))
    tile_capacity = _round_up(tile_capacity, NBS)
    chunks_per_tile = tile_capacity // NBS

    stop = jax.lax.stop_gradient
    order, slots, cnt = _bin_pairs_2d(
        stop(s.px), stop(s.py), stop(s.sigma_x), stop(s.sigma_y),
        stop(s.op_eff), None,
        tiles_x, tiles_y, tile_capacity, width, height,
        cutoff=W_CULL, zsort=False, k=k)

    gdense = pack_gdataT_prio(s, order)[slots]            # (tiles*cap, 16)

    core = _binned_core_sep if axis else _binned_core
    acc = core(gdense, cnt.astype(jnp.int32), tiles_x, n_tiles,
               chunks_per_tile)

    full = crop_tiled_acc(acc, tiles_y, tiles_x, height, width)
    return full[..., :FEAT_DIM].reshape(-1, FEAT_DIM)
