"""Pallas depth-sorted front-to-back compositing (forward only), 2D-tiled.

The TPU replacement for the reference's depth-aware render paths — exact
global-sort semantics like the CPU path (renderer_cpu.cpp:125-217), not
the CUDA depth-slicing approximation (renderer.cu:106-270):

  order: camera-space z descending (near first)
  per gaussian: a = clamp01(op * exp(e)), dropped when a < 1e-5
  front-to-back: contrib = T * a, T *= (1 - a) per pixel
  finalize: out = clip(rgb + T * bg, 0, 1)

Binning (the TPU answer to CUDA's duplicate-and-sort tile binning, done
with fixed shapes): the image is cut into TH x TWC pixel tiles (16 x 128
-> one 2048-px kernel block per tile). Each gaussian is duplicated into
every 2D tile its conservative extent overlaps (extent from the 1e-5
alpha cutoff, so exclusion is exact w.r.t. the reference's own cutoff;
at most _k_pairs(n) tiles, rect re-centered on the gaussian when
truncated — full coverage for small/medium scenes).
One multi-key `lax.sort` over (tile, z-bits, index) both depth-orders
and tile-groups the pairs in a single pass — z descending is encoded as
a monotone integer transform of the -z float bits, and the index key
reproduces the stable tie-break of `argsort(-z)`, so the composite order
is bit-identical to the jnp oracle. Per-tile dense, depth-ordered lists
are then materialized by *gather* (position arithmetic from searchsorted
offsets — no scatter), stored lane-dense TRANSPOSED (GD_ROWS, slots) —
row-major (slots, 16) lists tile-pad 8x in HBM — and flipped to compute
orientation (gaussians on sublanes / pixels on lanes) with one in-kernel
(16, 128) transpose per sub-block. The
kernel grid is (tiles x chunks): chunks stream through VMEM via
BlockSpec auto-DMA; per-tile running transmittance lives in VMEM
scratch ((1, TP) lane-dense), with within-chunk ordering via an
exclusive cumulative product of (1 - a) along the gaussian (sublane)
axis in 128-row sub-blocks, and a whole-chunk transmittance early-exit
(skip once
max T < 1e-6 — the TPU analog of the reference's per-pixel T <= 1e-4
break, renderer.cu:251-252, but tightened so the approximation error is
below float tolerance).

2D tiles vs the previous full-width row bands: a band spanned ~2 image
rows at 960w, so a typical splat hit ~11 bands and was evaluated against
every x in each (no x-culling at all). 16x128 tiles cull in both axes —
measured ~4x fewer (gaussian, tile) pairs and ~2x less kernel work.

`band_capacity` bounds each tile's list; when a tile overflows, the
FARTHEST entries are dropped (they are the most occluded). The default
capacity covers small/medium scenes losslessly; RenderConfig users can
raise it for dense scenes.

Used by the render CLI / viewer path; training uses the accumulation mode
(as the reference does: its differentiable renderer is accumulation-only,
torch_renderer.py:192-196).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_gaussians.core.types import Array
from tpu_gaussians.ops.common import SplatInputs
from tpu_gaussians.ops.pallas.splat import (
    FEAT_PAD,
    GD_ROWS,
    _interpret,
    _round_up,
)

NBS = 512      # gaussians per ordered chunk
TH = 16        # tile height (pixel rows)
TWC = 128      # tile width (pixel cols = lane dim)
TPS = TH * TWC # pixels per tile (2048)
ALPHA_CUTOFF = 1e-5
A_MAX = 0.9999 # per-gaussian alpha ceiling: keeps the backward's
               # 1/(1 - a) bounded (the 3DGS training recipe clamps at
               # 0.99; sigmoid-activated opacities never reach 1, so this
               # only deviates from the reference clamp01 for synthetic
               # op >= 1 inputs, by <= 1e-4)
EXIT_T = 1e-6  # whole-chunk early-exit transmittance threshold

# Per-gaussian tile budget K adapts to scene size: the (tile, z) sort runs
# over n*K entries whether pairs are valid or not, so K is chosen to cap
# that at PAIR_BUDGET — small scenes get full splat coverage (K up to
# K_MAX), huge scenes (whose splats are small) get a tight budget.
PAIR_BUDGET = 12_000_000
K_MIN, K_MAX = 8, 64


def _k_pairs(n: int, budget: int = PAIR_BUDGET, kmin: int = K_MIN,
             kmax: int = K_MAX) -> int:
    return int(min(kmax, max(kmin, budget // max(n, 1))))


def auto_pair_k(g, views, projs, width: int, height: int,
                footprint: str = "axis") -> int:
    """Init-time measured pair budget for TRAINING (r5 VERDICT #1b).

    _k_pairs' budget formula gave K=64 at n=100k while the measured
    max rect over real scenes was 14 tiles (p95=8) at 512^2 — a 4x
    oversized padded pair array whose key sort alone cost 1.5 ms/step
    (K=16: 0.4 ms). This measures the TRUE max rect over every training
    camera at the initial params and budgets pow2ceil of it (floor
    K_MIN, cap _k_pairs(n)). Splat extents can grow during training
    (densify, opacity/scale drift); when the budget starts clipping real
    overlaps the binner's clipped_rect_pairs counter reports it in
    metrics.jsonl and the trainer's one-time lossy-render warning fires
    — raise RenderConfig.sorted_pair_k (or re-run) if that happens.
    """
    from tpu_gaussians.ops.common import prepare_splats

    tiles_x = _round_up(width, TWC) // TWC
    tiles_y = _round_up(height, TH) // TH

    def one(view, proj):
        s = prepare_splats(g, view, proj, width, height,
                           footprint=footprint)
        _, _, _, _, count, _ = _tile_rects(
            s.px, s.py, s.sigma_x, s.sigma_y, s.op_eff,
            tiles_x, tiles_y, tiles_x * tiles_y, width, height)
        return jnp.max(count)

    mx = int(jax.jit(
        lambda v, p: jnp.max(jax.vmap(one)(v, p)))(views, projs))
    k = 1 << max(0, int(mx - 1).bit_length())          # pow2ceil(mx)
    n = g.means.shape[0]
    return int(min(max(K_MIN, k), _k_pairs(n)))


def _dot3(a, b, dimension_numbers):
    """dot_general for the compositing kernels' big pixel contractions at
    the splat-kernel precision policy (splat._mm_precision: b3 on TPU,
    "highest" elsewhere or when TPUGS_MM_PRECISION=highest). b3 is the
    hand-rolled bf16x3 split (hi*hi + hi*lo + lo*hi, one MXU pass each;
    Mosaic does not expose Precision.HIGH) — see splat._dot_pair, whose
    scheme this reuses."""
    from tpu_gaussians.ops.pallas.splat import _dot_pair

    return _dot_pair(a, b, dimension_numbers)


def _exclusive_cumprod(x: Array, axis: int) -> Array:
    """Exclusive cumulative product along `axis` of a 2D tile.

    log2(n) shift-and-multiply doubling steps (Mosaic-friendly; avoids a
    serial scan). exclusive: index i gets prod(x[0..i-1]), index 0 gets 1.

    r4 negative result: rewriting the scans as triangular-matrix MXU
    contractions (cumsum = L @ u, cumprod = exp(L @ log x)) to offload
    the VPU — the ladders are 45 of the kernels' ~101 VPU passes, and
    the MXU idles at <6% — measured NO faster even at 1-pass bf16
    precision (26.9 ms @100k/512^2, identical to the ladder; "highest"
    measured 32.9). The scan feeds the immediately-following
    transmittance math, so Mosaic serializes MXU and VPU instead of
    overlapping them, and the matmul's issue cost just replaces the
    ladder's pass cost. Keep the ladder.
    """
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    y = jnp.where(idx >= 1, pltpu.roll(x, shift=1, axis=axis), 1.0)
    shift = 1
    while shift < n:
        rolled = jnp.where(idx >= shift,
                           pltpu.roll(y, shift=shift, axis=axis), 1.0)
        y = y * rolled
        shift *= 2
    return y


def _inclusive_cumsum(x: Array, axis: int) -> Array:
    """Inclusive cumulative sum along `axis` (log2(n) shift-add doubling
    passes; see _exclusive_cumprod for the r4 matmul-scan negative
    result)."""
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    y = x
    shift = 1
    while shift < n:
        y = y + jnp.where(idx >= shift,
                          pltpu.roll(y, shift=shift, axis=axis), 0.0)
        shift *= 2
    return y


def _zkey_desc(z: Array) -> Array:
    """Monotone uint32 key with ascending order == z DESCENDING (near
    first), bit-exact: the standard IEEE-754 total-order transform of -z."""
    bits = jax.lax.bitcast_convert_type(-z, jnp.uint32)
    neg = (bits >> 31) != 0
    return jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))


def _tile_coords_sep(tx, ty):
    """Per-tile factored coordinates: column centers (1, TWC) and row
    centers (1, TH) for the separable (axis-footprint) alpha build."""
    xc = (tx * TWC + jax.lax.broadcasted_iota(
        jnp.int32, (1, TWC), dimension=1)).astype(jnp.float32) + 0.5
    yr = (ty * TH + jax.lax.broadcasted_iota(
        jnp.int32, (1, TH), dimension=1)).astype(jnp.float32) + 0.5
    return xc, yr


def _a_raw_sep(gd, xc, yr):
    """Factored per-pair raw alpha for conic b == 0: a = op*Ex*Ey built
    from (sub, TWC) and (sub, TH) factors — (TWC+TH) exps per gaussian
    instead of TPS. Returns (a_raw, txd, tyd) (txd/tyd for the backward's
    moment factors). Tile lanes are r-major (l = r*TWC + c)."""
    txd = xc - gd[:, 0:1]                        # (sub, TWC)
    exf = jnp.exp(-0.5 * gd[:, 2:3] * (txd * txd))
    tyd = yr - gd[:, 1:2]                        # (sub, TH)
    eyop = gd[:, 5:6] * jnp.exp(-0.5 * gd[:, 4:5] * (tyd * tyd))
    a_raw = jnp.concatenate(
        [eyop[:, r : r + 1] * exf for r in range(TH)], axis=1
    )                                            # (sub, TPS)
    return a_raw, txd, tyd


def _sorted_kernel(cnt_ref, gdense_ref, acc_ref, rgbw_ref, trans_ref,
                   *, tiles_x: int, chunks_per_tile: int,
                   axis: bool = False, exit_t: float = EXIT_T):
    i = pl.program_id(0)  # tile
    j = pl.program_id(1)  # chunk within tile

    @pl.when(j == 0)
    def _():
        rgbw_ref[:] = jnp.zeros_like(rgbw_ref)
        trans_ref[:] = jnp.ones_like(trans_ref)

    live = jnp.max(trans_ref[:]) > exit_t  # early-exit: tile gone opaque

    @pl.when((j * NBS < cnt_ref[0, i]) & live)
    def _():
        ty = i // tiles_x
        tx = i % tiles_x
        pix = jax.lax.broadcasted_iota(jnp.int32, (1, TPS), dimension=1)
        gx = (tx * TWC + pix % TWC).astype(jnp.float32) + 0.5   # (1, TP)
        gy = (ty * TH + pix // TWC).astype(jnp.float32) + 0.5
        if axis:
            xc, yr = _tile_coords_sep(tx, ty)

        trans = trans_ref[:]                     # (1, TP)
        rgbw = rgbw_ref[:]
        # Gaussians on SUBLANES, pixels on LANES for the compute; the
        # gdense chunk arrives TRANSPOSED (GD_ROWS, NBS) — the lane-dense
        # HBM layout (a row-major (slots, 16) array tile-pads its 16
        # lanes to 128, an 8x HBM tax on both the XLA-side gather and
        # every chunk DMA) — and each 128-gaussian sub-block is flipped
        # to compute orientation with one in-kernel (16, 128) transpose.
        #
        # Sub-blocked ordered merge: the exclusive cumprod costs log2(n)
        # roll+select+mul passes over the whole tile, so four 128-row
        # cumprods (7 passes each on 1/4 the data) beat one 512-row
        # cumprod (9 passes on all of it) ~2.6x; ordering across
        # sub-blocks is carried by the running transmittance.
        sub = NBS // 4
        for sb in range(4):
            gd = gdense_ref[:, sb * sub:(sb + 1) * sub].T  # (sub, GD_ROWS)
            if axis:
                a_raw, _, _ = _a_raw_sep(gd, xc, yr)
            else:
                dx = gx - gd[:, 0:1]             # (sub, TP)
                dy = gy - gd[:, 1:2]
                e = -0.5 * (gd[:, 2:3] * dx * dx
                            + 2.0 * gd[:, 3:4] * dx * dy
                            + gd[:, 4:5] * dy * dy)
                a_raw = gd[:, 5:6] * jnp.exp(e)
            a_s = jnp.where(a_raw < ALPHA_CUTOFF, 0.0,
                            jnp.clip(a_raw, 0.0, A_MAX))
            contrib = _exclusive_cumprod(1.0 - a_s, axis=0) * a_s
            feats = gd[:, 6:14]                  # (sub, 8) [r,g,b,1,z,...]
            # block[f, p] = sum_i feats[i, f] * contrib[i, p]; column 3 of
            # feats is the constant 1, so block[3] is the sub-alpha free.
            # Stays "highest" (f32-exact image): this contraction runs
            # over K = sub = 128, where the 6-pass cost is only ~0.13 ms
            # of the whole 512^2 step — b3's bf16 split overhead costs
            # MORE than it saves here (measured 3.81 vs 3.43 ms fwd
            # kernel; 1-pass floor 3.30). Contrast g_feat in the
            # backward (K = 2048), where b3 pays.
            block = jax.lax.dot_general(
                feats, contrib,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision="highest",
            )                                    # (8, TP) lane-dense
            rgbw = rgbw + trans * block
            # prod(1-a_i) over the sub-block == 1 - sum contrib_i
            trans = trans * (1.0 - block[3:4, :])
        rgbw_ref[:] = rgbw
        trans_ref[:] = trans

    @pl.when(j == chunks_per_tile - 1)
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, rgbw_ref.shape, 0)
        acc_ref[:] = jnp.where(rows == 3, 1.0 - trans_ref[:], rgbw_ref[:])


def _tile_rects(px, py, sigma_x, sigma_y, op_eff,
                tiles_x: int, tiles_y: int, k: int,
                width: int, height: int, cutoff: float = ALPHA_CUTOFF):
    """Per-gaussian overlapped-tile rectangle (k-budgeted).

    Extent radius from the alpha cutoff (exact w.r.t. the reference's own
    a < 1e-5 drop for the sorted path; the binned accumulation path
    passes the far stricter W_CULL so binning preserves allclose parity
    with the dense oracle); when the rect exceeds the k budget it is
    shrunk re-centered on the gaussian so the hottest tiles are kept.
    Gaussians whose extent misses the screen entirely (off-screen; the
    reference evaluates them to ~0 per pixel) get count=0 so they neither
    consume per-tile capacity nor kernel work.
    Returns (tx_lo, ty_lo, kx_c, ky_c, count) int32 arrays, with
    count == kx_c * ky_c (0 when dead/off-screen).
    """
    r = jnp.sqrt(2.0 * jnp.log(
        jnp.maximum(op_eff, cutoff) / cutoff))
    dead = op_eff <= cutoff
    rx = r * sigma_x + 1.0
    ry = r * sigma_y + 1.0

    offscreen = ((px + rx) < 0.0) | ((px - rx) >= width) \
        | ((py + ry) < 0.0) | ((py - ry) >= height)

    tx_lo = jnp.clip(jnp.floor((px - rx) / TWC), 0, tiles_x - 1
                     ).astype(jnp.int32)
    tx_hi = jnp.clip(jnp.floor((px + rx) / TWC), 0, tiles_x - 1
                     ).astype(jnp.int32)
    ty_lo = jnp.clip(jnp.floor((py - ry) / TH), 0, tiles_y - 1
                     ).astype(jnp.int32)
    ty_hi = jnp.clip(jnp.floor((py + ry) / TH), 0, tiles_y - 1
                     ).astype(jnp.int32)

    kx = tx_hi - tx_lo + 1
    ky = ty_hi - ty_lo + 1

    # Budget: shrink the rect centered on the gaussian's own tile.
    kx_c = jnp.minimum(kx, k)
    ky_c = jnp.minimum(ky, jnp.maximum(1, k // kx_c))
    txc = jnp.clip(jnp.floor(px / TWC), 0, tiles_x - 1).astype(jnp.int32)
    tyc = jnp.clip(jnp.floor(py / TH), 0, tiles_y - 1).astype(jnp.int32)
    tx_lo = jnp.clip(txc - (kx_c - 1) // 2, tx_lo, tx_hi - kx_c + 1)
    ty_lo = jnp.clip(tyc - (ky_c - 1) // 2, ty_lo, ty_hi - ky_c + 1)

    count = jnp.where(dead | offscreen, 0, kx_c * ky_c).astype(jnp.int32)
    ky_c = jnp.where(count > 0, ky_c, 0)
    # Tiles this gaussian TRULY overlaps but lost to the k budget
    # (0 when the rect fit) — the per-gaussian part of the overflow
    # stats (VERDICT r1 item #6: make the scale approximations
    # observable).
    clipped = jnp.where(dead | offscreen, 0, kx * ky - count)
    return tx_lo, ty_lo, kx_c, ky_c, count, clipped


CHUNK_TARGET = 16384  # pair-sort chunk length target (chunked sorts are
                      # ~5x cheaper than one monolithic 12M-pair sort on
                      # TPU — see bench/micro_primitives.py). The actual
                      # chunk length is rounded to a whole number of
                      # gaussians (M*K) so per-chunk tile histograms can
                      # be computed per GAUSSIAN as separable-rect
                      # matmuls instead of per pair.


def _bin_pairs_2d(px, py, sigma_x, sigma_y, op_eff, z_cam,
                  tiles_x: int, tiles_y: int, cap: int,
                  width: int, height: int,
                  cutoff: float = ALPHA_CUTOFF, zsort: bool = True,
                  k: int = 0, return_rects: bool = False):
    """Duplicate gaussians into overlapped tiles and build dense,
    priority-ordered per-tile lists — WITHOUT a monolithic pair sort.

    1. Gaussians are priority-sorted once (n elements, cheap). With
       zsort=True the priority is exact depth (near first, with
       argsort(-z)'s stable index tie-break) — required by front-to-back
       compositing. With zsort=False (order-independent accumulation)
       the priority is opacity DESCENDING, so per-tile capacity overflow
       drops the weakest gaussians instead of arbitrary ones.
    2. Pairs are generated in priority-major order and sorted by tile id
       in independent CHUNK_TARGET-length chunks (a chunked lax.sort is
       ~5x cheaper per element than one 12M-element sort).
    3. Within a chunk, a (chunk, tile) segment is priority-ordered;
       ACROSS chunks, every pair in chunk c outranks every pair in chunk
       c+1 (priority-major generation) — so the per-tile dense list is
       just the concatenation of its segments in chunk order,
       materialized by pure position arithmetic:
         H[c,t]  per-chunk tile histogram      (separable-rect matmul)
         P[c,t]  within-chunk segment starts   (cumsum over t)
         cumH    cross-chunk prefix            (cumsum over c)
         src[t,r] = r + Q[c(r),t],  Q = c*L + P - cumHexcl
       where c(r) counts chunks exhausted before rank r (compare-reduce).

    Returns (order (n,) priority permutation,
             slots (n_tiles*cap,) int32 indices into the PRIORITY-ORDERED
             packed table (n == dead row; see pack_gdataT_prio),
             cnt (1, n_tiles) int32 per-tile list lengths,
             stats dict of int32 scalars — the overflow observability
             counters (VERDICT r1 item #6):
               dropped_pairs      (gaussian, tile) entries lost to the
                                  per-tile capacity (sorted: farthest
                                  dropped; accum: weakest dropped)
               full_tiles         tiles whose true load exceeded cap
               clipped_rect_pairs true overlaps lost to the per-gaussian
                                  k-tile budget (rect shrink)
             All derived from arrays the binner already builds — ~free."""
    n = px.shape[0]
    n_tiles = tiles_x * tiles_y
    if k <= 0:
        k = _k_pairs(n)

    # Priority key: depth for compositing, opacity for accumulation
    # (see docstring step 1). _zkey_desc gives ascending-sort ==
    # key-value DESCENDING for both. The rect inputs ride the sort as
    # VALUE operands: carrying values through lax.sort is nearly free
    # (~0.2 ms at 1M), while permuting them afterwards costs ~5.7 ms as
    # a packed row gather — a (n, 8) row-major array tile-pads 16x — and
    # ~35 ms as per-column 1-D gathers (measured, v5e).
    prio = _zkey_desc(z_cam) if zsort else _zkey_desc(op_eff)
    # num_keys=2 + unstable: (prio, index) keys are unique, so the
    # permutation is EXACTLY the stable-by-prio order while skipping the
    # stable sort's extra passes (r5: 2.89 -> measured below at 1M; the
    # binner's chunk sort uses the same trick).
    _, order, pxs, pys, sxs, sys_, ops = jax.lax.sort(
        (prio, jnp.arange(n, dtype=jnp.int32),
         px, py, sigma_x, sigma_y, op_eff), num_keys=2, is_stable=False)

    tx_lo, ty_lo, kx_c, ky_c, count, clipped = _tile_rects(
        pxs, pys, sxs, sys_, ops,
        tiles_x, tiles_y, k, width, height, cutoff=cutoff)

    m_per = max(1, CHUNK_TARGET // k)              # gaussians per chunk
    chunk_l = m_per * k                            # pairs per chunk
    c_chunks = max(1, (n + m_per - 1) // m_per)
    n_pad = c_chunks * m_per
    lbits = max(1, int(chunk_l - 1).bit_length())  # bits for m_local
    if n_tiles >= (1 << (31 - lbits)):
        raise ValueError(
            f"tile count {n_tiles} overflows the packed int32 sort key "
            f"({31 - lbits} tile bits at chunk length {chunk_l}); render "
            "in row windows (parallel/tiled.py) for frames this large")

    # KEY-ONLY chunk sort: the key packs (tile, within-chunk pair index).
    # m_local = g_local*K + j is unique per chunk element and ascends in
    # z rank, so sorting the single int32 key both tile-groups and
    # z-orders — no value operand, no stability requirement (unstable
    # sort is ~20% faster at this size), and the gaussian id is recovered
    # arithmetically from the low bits afterwards.
    #
    # The key is generated DIRECTLY in the padded (C, m_per, K) chunk
    # layout: per-gaussian inputs are padded/reshaped first (n-sized,
    # cheap) so the final (C, m_per*K) merge of the two minor dims is a
    # free relayout — profiling at 1M gaussians showed the old
    # (n, K)-then-flatten formulation materialized SIX separate
    # 12M-element pair arrays (the flatten blocked fusion), ~20 ms of
    # pure HBM traffic. The rect-row split j -> (drow, dcol) uses a
    # guarded float-reciprocal instead of integer div/mod (integer
    # division by a per-gaussian divisor is many VPU ops): the +1e-4
    # nudge is safe because j*recip(kx) has error <= 64*2^-24 ~ 4e-6
    # while true fractional parts are multiples of 1/K >= 1/64.
    def _padc(a, const=0):
        return jnp.pad(a, (0, n_pad - n), constant_values=const).reshape(
            c_chunks, m_per, 1)

    jj = jnp.arange(k, dtype=jnp.int32)[None, None, :]
    jjf = jj.astype(jnp.float32)
    rkx = 1.0 / _padc(kx_c, 1).astype(jnp.float32)
    drow = jnp.floor(jjf * rkx + 1e-4).astype(jnp.int32)  # (C, M, K)
    dcol = jj - drow * _padc(kx_c, 1)
    tile = (_padc(ty_lo) + drow) * tiles_x + (_padc(tx_lo) + dcol)
    tile = jnp.where(jj < _padc(count), tile, n_tiles)
    m_loc = (jnp.arange(n_pad, dtype=jnp.int32) % m_per).reshape(
        c_chunks, m_per, 1) * k + jj
    key_c = ((tile << lbits) | m_loc).reshape(c_chunks, chunk_l)
    (key_s,) = jax.lax.sort((key_c,), dimension=1, num_keys=1,
                            is_stable=False)

    # Per-chunk tile histogram WITHOUT touching pairs: chunks are whole
    # gaussians, and each gaussian's (budget-shrunk) rect is separable,
    # so H[c, (ty,tx)] = sum_g Fy[g,ty] * Fx[g,tx] — one (C, Ty, M) @
    # (C, M, Tx) MXU matmul over 0/1 indicators (f32 is exact: counts
    # < 2^24), ~12x less work than a per-pair compare-reduce.
    ty_ax = jnp.arange(tiles_y, dtype=jnp.int32)
    tx_ax = jnp.arange(tiles_x, dtype=jnp.int32)
    fy = ((ty_ax[None, :] >= ty_lo[:, None])
          & (ty_ax[None, :] < (ty_lo + ky_c)[:, None])).astype(jnp.float32)
    fx = ((tx_ax[None, :] >= tx_lo[:, None])
          & (tx_ax[None, :] < (tx_lo + kx_c)[:, None])
          & (count > 0)[:, None]).astype(jnp.float32)
    fy = jnp.pad(fy, ((0, n_pad - n), (0, 0))).reshape(
        c_chunks, m_per, tiles_y)
    fx = jnp.pad(fx, ((0, n_pad - n), (0, 0))).reshape(
        c_chunks, m_per, tiles_x)
    # Default MXU precision is EXACT here: both operands are 0/1
    # indicators (exactly representable in bf16) and accumulation is
    # f32 via preferred_element_type — don't pay 6-pass "highest".
    h = jnp.einsum("cmy,cmx->cyx", fy, fx,
                   preferred_element_type=jnp.float32)
    h = h.reshape(c_chunks, n_tiles).astype(jnp.int32)  # (C, T)
    p_start = jnp.cumsum(h, axis=1) - h            # within-chunk starts
    cum_h = jnp.cumsum(h, axis=0)                  # inclusive over chunks
    q = (p_start - (cum_h - h)
         + (jnp.arange(c_chunks, dtype=jnp.int32) * chunk_l)[:, None])
    true_load = cum_h[-1]                          # (T,) pre-cap loads
    cnt = jnp.minimum(true_load, cap).astype(jnp.int32)
    stats = {
        "dropped_pairs": jnp.sum(
            jnp.maximum(true_load - cap, 0)).astype(jnp.int32),
        "full_tiles": jnp.sum(true_load > cap).astype(jnp.int32),
        "clipped_rect_pairs": jnp.sum(clipped).astype(jnp.int32),
    }

    rank = jnp.arange(cap, dtype=jnp.int32)
    # src[t, r] = r + q[c(r), t], with the c(r) selection telescoped into
    # a compare-accumulate over chunks (no 0.5M-element table gather):
    # q[c(r),t] = q[0,t] + sum_{c>=1} (q[c,t]-q[c-1,t]) * [cum_h[c-1,t]<=r]
    # Accumulated with a fori_loop so peak memory stays O(T*cap): the
    # one-shot (C-1, T, cap) broadcast is gigabytes at 1024^2 frames and
    # OOMs the compiler.
    q0 = jnp.broadcast_to(q[0][:, None], (n_tiles, cap)).astype(jnp.int32)
    if c_chunks > 1:
        dq = q[1:] - q[:-1]                        # (C-1, T)
        cum_hx = cum_h[:-1]                        # (C-1, T)

        def _tele(c, acc):
            return acc + dq[c][:, None] * (
                cum_hx[c][:, None] <= rank[None, :]).astype(jnp.int32)

        # unroll=16: each fori_loop iteration is one full HBM pass over
        # the (T, cap) accumulator (~0.5-8 MB) with trivial compute —
        # at C-1 = hundreds of chunks the telescope was pure traffic
        # (e.g. 390 x 8 MB read+write at 100k/512^2). Unrolling fuses 16
        # chunk updates into each pass, cutting that traffic ~16x.
        qsel = jax.lax.fori_loop(0, c_chunks - 1, _tele, q0, unroll=16)
    else:
        qsel = q0
    src = rank[None, :] + qsel

    keep = rank[None, :] < cnt[:, None]
    src = jnp.clip(src, 0, c_chunks * chunk_l - 1)
    # Recover the PRIORITY-RANK index: sorted key low bits -> local pair
    # index -> priority rank. Slots index the priority-permuted packed
    # table (pack_gdataT_prio), NOT the original order: mapping back via
    # order[g_rank] here would be a second (tiles*cap)-element gather,
    # measured ~7 ms at 1M slots; permuting the n packed rows once is a
    # cheap row gather instead.
    #
    # The lookup itself is a 128-wide row gather + one-hot lane select,
    # NOT a flat element gather: XLA's element gather prices at a
    # serialized ~7.2 ns/index on this runtime regardless of table size,
    # while gathering the (tot/128, 128) row containing each index and
    # selecting the lane measures 2.4-4.6x cheaper (0.41-0.78 ms vs
    # 1.88 ms at S=262k — bench log; the win grows with the ~30-long
    # ascending src runs each (chunk, tile) segment contributes, since
    # consecutive slots then hit the same physical row).
    tot = c_chunks * chunk_l
    key_flat = jnp.pad(key_s.reshape(-1), (0, (-tot) % 128))
    src_fl = src.reshape(-1)
    rows = key_flat.reshape(-1, 128)[src_fl // 128]       # (S, 128)
    lane = (jnp.arange(128, dtype=jnp.int32)[None, :]
            == (src_fl % 128)[:, None])
    m_sel = jnp.sum(jnp.where(lane, rows, 0), axis=1).reshape(
        src.shape) & ((1 << lbits) - 1)
    g_rank = (src // chunk_l) * m_per + m_sel // k
    slots = jnp.where(keep, jnp.clip(g_rank, 0, n - 1), n).reshape(-1)
    # (1, n_tiles): 2D so SMEM blocks stay legal under vmap batching.
    out = (order, slots, cnt[None, :], stats)
    if return_rects:
        # Priority-ordered budget-shrunk rects + per-gaussian tile count
        # — consumed by the segsum backward's scatter-free segment-end
        # arithmetic (_kept_prefix_positions).
        out = out + ((tx_lo, ty_lo, kx_c, ky_c, count),)
    return out


def _slot_reduce_mode() -> str:
    """Slot->gaussian gradient reduction strategy (r5 VERDICT #1a).

    "segsum" (default): custom-VJP pipeline — sort (slots, iota) once
    (the same sort XLA's scatter lowering runs), row-gather the grad rows
    into g-sorted order, SEGMENTED inclusive cumsum by log-doubling
    (exact: only same-segment adds, max segment length = the pair budget
    k, so no long-range cancellation), histogram by a sorted one-row
    scatter, and row-gather each segment's end — replacing the 16-row
    scatter-add apply (r5 trace: 3.34 ms of the 26.5 ms step at
    100k/512^2) with ~3x cheaper vectorized work, and folding the
    priority-permutation backward (its own 1.22 ms n-row scatter-add,
    pack_gdataT_prio's AD) into a free composed row gather.
    "plain": the r1-r4 path — XLA AD of the two gathers (scatter-adds).
    """
    import os

    return os.environ.get("TPUGS_SLOT_REDUCE", "segsum")


def _segment_sums_by_slot(g_t: Array, slots: Array, ends: Array,
                          max_mult: int,
                          active_rows: tuple = None) -> Array:
    """Sum the columns of `g_t` (F, S) lane-dense by destination id
    `slots` (S,) -> (n_rows, F) row-major, given precomputed segment end
    positions `ends` (n_rows,) (-1 where the id never occurs; see
    _kept_prefix_positions — they are pure arithmetic on binner data, so
    no scatter/searchsorted is needed anywhere in this backward).

    Exact segmented reduction with NO scatter of any width:
      1. ONE lax.sort keyed on slots CARRYING the F grad rows as value
         operands (value operands ride the sort nearly free — the same
         trick the binner uses for its rect inputs; a post-sort row
         gather of an (S, F) array instead pays the narrow-row 8x tile
         padding tax, measured 2.59 ms at S=262k vs ~1.2 ms here);
      2. segmented inclusive cumsum via ceil(log2(max_mult)) lane-wise
         roll-add passes masked to same-id runs (every add stays within
         one segment, so precision matches a direct per-segment sum — no
         prefix-difference cancellation);
      3. one (n_rows, F) row gather of the ladder output at `ends`,
         zero-masked where the id never occurs.
    max_mult: static upper bound on any id's multiplicity (the
    per-gaussian tile budget k here — a gaussian appears at most once
    per tile)."""
    f_rows, s_total = g_t.shape
    if active_rows is None:
        active_rows = tuple(range(f_rows))
    ops = (slots.astype(jnp.int32),) + tuple(
        g_t[f] for f in active_rows)
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=False)
    key_sorted = sorted_ops[0]
    y = jnp.stack(sorted_ops[1:], axis=0)          # (F_act, S) lane-dense
    idx = jnp.arange(s_total, dtype=jnp.int32)[None, :]
    shift = 1
    while shift < max_mult:
        same = (key_sorted == jnp.roll(key_sorted, shift))[None, :]
        y = y + jnp.where(same & (idx >= shift),
                          jnp.roll(y, shift, axis=1), 0.0)
        shift *= 2
    seg = y.T[jnp.clip(ends, 0, s_total - 1)]      # (n_rows, F_act)
    seg = jnp.where((ends >= 0)[:, None], seg, 0.0)
    if len(active_rows) == f_rows:
        return seg
    out = [None] * f_rows
    for i, f in enumerate(active_rows):
        out[f] = seg[:, i]
    zero = jnp.zeros(seg.shape[:1], seg.dtype)
    return jnp.stack([c if c is not None else zero for c in out], axis=1)


def _kept_prefix_positions(rects, cnt_tiles: Array, tiles_x: int,
                           tiles_y: int, block: int = 8192) -> Array:
    """Per-id segment END positions of the g-sorted kept-slot array,
    by pure dense arithmetic on the binner's separable rect indicators —
    the scatter-free replacement for "last position of id g" (r5: a
    1-row scatter-max costs 2.29 ms at S=262k on this runtime; this
    whole pipeline is ~0.4 ms of streamed matrix math).

    Within every tile the kept list is the first cnt[t] entries of its
    priority-ordered segment and the entry ids are STRICTLY ASCENDING
    priority ranks (chunk-major generation; at most one pair per
    (gaussian, tile)). Hence
        P[g] = #kept entries with id <= g
             = sum_t min(cumcover[g, t], cnt[t]),
    where cumcover[g, t] = #gaussians of rank <= g whose (budget-shrunk)
    rect covers t — a cumulative sum over ranks of the separable 0/1
    coverage Fy[g,ty] * Fx[g,tx]. The id-g segment (when present) ends
    at P[g]-1. Streamed over rank blocks with a (T,) running-coverage
    carry so peak memory is block*T, not n*T.

    rects: (tx_lo, ty_lo, kx_c, ky_c, count) int32 (n,) arrays in
    priority order (from _bin_pairs_2d). Returns ends (n+1,) int32 with
    -1 where id g has no kept entries; row n (the dead-slot id) is -1.
    """
    tx_lo, ty_lo, kx_c, ky_c, count = rects
    n = tx_lo.shape[0]
    n_tiles = tiles_x * tiles_y
    ty_ax = jnp.arange(tiles_y, dtype=jnp.int32)
    tx_ax = jnp.arange(tiles_x, dtype=jnp.int32)
    fy = ((ty_ax[None, :] >= ty_lo[:, None])
          & (ty_ax[None, :] < (ty_lo + ky_c)[:, None]))
    fx = ((tx_ax[None, :] >= tx_lo[:, None])
          & (tx_ax[None, :] < (tx_lo + kx_c)[:, None])
          & (count > 0)[:, None])
    nb = (n + block - 1) // block
    pad = nb * block - n
    fy = jnp.pad(fy, ((0, pad), (0, 0))).reshape(nb, block, tiles_y)
    fx = jnp.pad(fx, ((0, pad), (0, 0))).reshape(nb, block, tiles_x)
    cnt = cnt_tiles.reshape(-1).astype(jnp.int32)      # (T,)

    def body(carry, inp):
        fyb, fxb = inp
        cover = (fyb[:, :, None] & fxb[:, None, :]).reshape(
            block, n_tiles).astype(jnp.int32)
        run = carry[None, :] + jnp.cumsum(cover, axis=0)
        p_rows = jnp.sum(jnp.minimum(run, cnt[None, :]), axis=1)
        return run[-1], p_rows

    _, p = jax.lax.scan(body, jnp.zeros((n_tiles,), jnp.int32), (fy, fx))
    p = p.reshape(-1)[:n]                              # (n,) inclusive
    present = jnp.diff(p, prepend=jnp.zeros((1,), jnp.int32)) > 0
    ends = jnp.where(present, p - 1, -1)
    return jnp.concatenate([ends, jnp.full((1,), -1, jnp.int32)])


def _lookup128(table: Array, idx: Array) -> Array:
    """`table[idx]` for a 1-D int32 table via a 128-wide row gather +
    one-hot lane select. XLA's flat element gather serializes at
    ~7.2 ns/index on this runtime regardless of table size; gathering
    the physical (128,) row containing each index and selecting the
    lane measures 2.4-4.6x cheaper at S~262k — and better still when
    consecutive indices land in the same row, which per-tile slot runs
    (ascending priority ranks) do. Same trick as _bin_pairs_2d's
    priority-rank recovery."""
    tot = table.shape[0]
    tf = jnp.pad(table, (0, (-tot) % 128))
    rows = tf.reshape(-1, 128)[idx // 128]          # (S, 128)
    lane = (jnp.arange(128, dtype=jnp.int32)[None, :]
            == (idx % 128)[:, None])
    return jnp.sum(jnp.where(lane, rows, 0), axis=1)


COMPOSE_GATHER_MIN_N = 262_144  # forward-only renders at n >= this
# compose the priority permutation INTO the slot gather
# (packed[order][slots] == packed[order_ext[slots]]) instead of
# materializing the permuted table. At 1M/960x540 XLA lays the
# (n+1, 16) permutation gather out column-major and it balloons to
# 6.5 ms/frame (r5 trace_viewer; the same op is row-major and 0.14 ms
# at 100k); the composed path replaces it with a _lookup128 of order at
# S slots (~0.7 ms): viewer frame 19.1 -> 13.2 ms @1M. UNDER AD the
# two-step path is used at EVERY n: order_ext[slots] values are the
# ORIGINAL ids (random), destroying the ascending-run locality the
# materialized slot gather enjoys — training fwd+bwd at 300k/512^2
# measured 33.5 ms two-step vs 40.4 composed. TPUGS_COMPOSE_MIN_N
# overrides for A/B.


def _compose_gather_min_n() -> int:
    import os

    return int(os.environ.get("TPUGS_COMPOSE_MIN_N",
                              COMPOSE_GATHER_MIN_N))


def _two_step_prio_gather(packed, order_ext, slots):
    """Materialize the priority-permuted table, then slot-row-gather.
    Both gathers are row gathers with good locality: the permutation
    writes n contiguous rows, and slots ascend (priority ranks) within
    each tile segment."""
    prio = jnp.concatenate([packed[order_ext[:-1]], packed[-1:]],
                           axis=0)
    return prio[slots].T


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _prio_slot_gather(packed, order_ext, inv, slots, rects, cnt_tiles,
                      tiles_x, tiles_y, max_mult, active_rows=None):
    """`pack_gdataT(s)[order][slots].T` with a path split the compiler
    cannot make:

    - PRIMAL (forward-only renders — the viewer): composed single
      gather `packed[_lookup128(order_ext, slots)].T` at
      n >= COMPOSE_GATHER_MIN_N (layout pathology evidence at the
      constant), two-step below.
    - AD (custom_vjp fwd): always the two-step materialized path —
      measured faster at every training scale (see
      COMPOSE_GATHER_MIN_N). Identical values, so the primal/fwd split
      is sound.
    - Backward: scatter-free — _segment_sums_by_slot in priority-rank
      space (value-carrying sort + masked roll-add ladder + arithmetic
      segment ends from binner byproducts; replaces the 3.34 ms
      scatter-add AD at 100k/512^2 and the permutation's own 1.22 ms
      n-row scatter-add), then the inverse permutation as a row
      gather. rects/cnt_tiles are consumed only here — forward-only
      callers pay nothing for them."""
    n = inv.shape[0]
    if n >= _compose_gather_min_n():
        return packed[_lookup128(order_ext, slots)].T
    return _two_step_prio_gather(packed, order_ext, slots)


def _prio_slot_gather_fwd(packed, order_ext, inv, slots, rects,
                          cnt_tiles, tiles_x, tiles_y, max_mult,
                          active_rows=None):
    return (_two_step_prio_gather(packed, order_ext, slots),
            (inv, slots, rects, cnt_tiles))


def _prio_slot_gather_bwd(tiles_x, tiles_y, max_mult, active_rows, res,
                          g):
    import numpy as np

    inv, slots, rects, cnt_tiles = res
    ends = _kept_prefix_positions(rects, cnt_tiles, tiles_x, tiles_y)
    g_prio = _segment_sums_by_slot(g, slots, ends, max_mult,
                                   active_rows=active_rows)
    n = inv.shape[0]
    g_packed = jnp.concatenate([g_prio[:n][inv], g_prio[n:]], axis=0)
    z = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (g_packed, np.zeros((n + 1,), jax.dtypes.float0), z(inv),
            z(slots), jax.tree_util.tree_map(z, rects), z(cnt_tiles))


_prio_slot_gather.defvjp(_prio_slot_gather_fwd, _prio_slot_gather_bwd)


def list_gather_prio_t(packed, order, inv, slots, rects, cnt_tiles,
                       tiles_x, tiles_y, max_mult, active_rows=None):
    """Priority-permute `packed` by `order`, row-gather by `slots`,
    transpose — forward math identical to
    `pack_gdataT_prio(s, order)[slots].T`, backward scatter-free, and
    the forward composed into one gather for large forward-only
    renders (see _prio_slot_gather). active_rows: static tuple of
    gdense rows whose cotangent can be nonzero (the backward's
    value-carrying sort pays per operand, and the pad rows / the axis
    conic-b row / unused feat-pad rows are structural zeros — ~30%
    fewer sort operands)."""
    n = order.shape[0]
    order_ext = jnp.concatenate([order, jnp.full((1,), n, jnp.int32)])
    return _prio_slot_gather(packed, order_ext, inv, slots, rects,
                             cnt_tiles, tiles_x, tiles_y, max_mult,
                             active_rows)


def inverse_permutation(order: Array) -> Array:
    """inv with inv[order[j]] = j, via one n-element sort."""
    n = order.shape[0]
    _, inv = jax.lax.sort((order, jnp.arange(n, dtype=jnp.int32)),
                          num_keys=1, is_stable=False)
    return inv


def list_gather_t(packed: Array, slots: Array) -> Array:
    """packed (n+1, GD_ROWS) row-gather by slots (S,) + transpose ->
    lane-dense (GD_ROWS, S) per-slot table. XLA's AD of the gather (an
    (S, GD_ROWS) row scatter-add) IS the slot->gaussian reduction of the
    backward.

    Round-3 measured NEGATIVE result (bench/proto_scatter.py +
    bench/proto_fullchain.py, v5e): in ISOLATION the row scatter prices
    at 16.5 ms @ S=1M and both 16 rank-1 scatters (9.3) and a
    sort+cumsum+histogram segment-sum (8.6) look like 2x wins — but IN
    the real backward graph every alternative LOSES (sorted full chain
    @512^2: plain 22.5 ms vs rank-1 custom VJP 52.5, 8-row blocks 26.2,
    segsum pipeline 26.0). XLA fuses the plain scatter with its
    postpass producers and downstream permutation-AD in ways custom VJPs
    block, and the rank-1 merge the isolated proto enjoyed does not
    happen in-graph. Keep the plain AD; do not re-wrap this in a custom
    VJP without re-running proto_fullchain.
    """
    return packed[slots].T


def pack_gdataT_prio(s: SplatInputs, order: Array) -> Array:
    """pack_gdataT rows permuted to priority order (row i = gaussian
    order[i]; dead row kept last). One n-row gather, so slot lists can
    index by priority rank directly — gradients flow through both
    gathers (row gathers are ~free on this runtime; element gathers are
    not, see _bin_pairs_2d)."""
    packed = pack_gdataT(s)
    return jnp.concatenate([packed[order], packed[-1:]], axis=0)


def pack_gdataT(s: SplatInputs) -> Array:
    """Row-major packed per-gaussian data (n+1, GD_ROWS): rows
    [px, py, ca, cb, cc, op, feats(8), pad] — row n is the dead slot
    (zero opacity, identity conic). Differentiable (plain stack), so the
    AD of a `pack_gdataT(s)[slots]` gather is the slot->gaussian
    scatter-add the binned backward needs."""
    feats_p = jnp.pad(s.feats, ((0, 0), (0, FEAT_PAD - s.feats.shape[1])))
    cols = [s.px, s.py, s.conic_a, s.conic_b, s.conic_c, s.op_eff]
    cols += [feats_p[:, f] for f in range(FEAT_PAD)]
    cols += [jnp.zeros_like(s.px)] * (GD_ROWS - len(cols))
    gdataT = jnp.stack(cols, axis=1)                      # (n, 16)
    dead = jnp.zeros((1, GD_ROWS), jnp.float32)
    dead = dead.at[0, 2].set(1.0).at[0, 4].set(1.0)       # identity conic
    return jnp.concatenate([gdataT, dead], axis=0)        # (n+1, 16)


def crop_tiled_acc(acc: Array, tiles_y: int, tiles_x: int,
                   height: int, width: int) -> Array:
    """(FEAT_PAD, tiles*TPS) kernel output -> (H, W, FEAT_PAD) crop."""
    full = acc.reshape(FEAT_PAD, tiles_y, tiles_x, TH, TWC)
    full = full.transpose(1, 3, 2, 4, 0).reshape(
        tiles_y * TH, tiles_x * TWC, FEAT_PAD)
    return full[:height, :width]


def moment_postpass_t(gdense_t: Array, raw_t: Array) -> Array:
    """O(N) chain-rule post-pass shared by the sorted and binned
    backwards (TRANSPOSED layout, all on dense (S,) rows): raw slot rows
    [Mdx, Mdy, Mxx, Mxy, Myy, M0, g_feat(8)] (moments of g_e) ->
    gdenseT-layout gradients. For e = -(a dx^2 + 2 b dxdy + c dy^2)/2
    and w = op * exp(e):
      g_px = a Mdx + b Mdy, g_py = b Mdx + c Mdy,
      g_{a,b,c} = -(Mxx/2, Mxy, Myy/2), g_op = M0 / op."""
    a, b, c = gdense_t[2], gdense_t[3], gdense_t[4]
    op = gdense_t[5]
    mdx, mdy = raw_t[0], raw_t[1]
    mxx, mxy, myy, m0 = raw_t[2], raw_t[3], raw_t[4], raw_t[5]
    g_head = jnp.stack(
        [a * mdx + b * mdy,
         b * mdx + c * mdy,
         -0.5 * mxx, -mxy, -0.5 * myy,
         jnp.where(op > 0, m0 / jnp.where(op > 0, op, 1.0), 0.0)],
        axis=0)
    return jnp.concatenate(
        [g_head, raw_t[6:6 + FEAT_PAD],
         jnp.zeros_like(raw_t[6 + FEAT_PAD:])], axis=0)


def sorted_composite_pallas(
    s: SplatInputs, z_cam: Array, background: Array,
    height: int, width: int, band_capacity: int = 0,
    axis: bool = False, return_stats: bool = False,
    exit_t: float = EXIT_T, pair_k: int = 0,
):
    """Depth-sorted render -> (image (H,W,3), alpha (H,W), depth (H,W))
    [+ binner overflow stats dict when return_stats].

    depth is free: feats row 4 already carries z_abs through the kernel's
    (8, TP) feature matmul, so acc row 4 is sum_i contrib_i * z_abs_i; the
    resolve divides by (alpha + 1e-6) like the accum aux. Differentiable —
    the fused backward already routes all 8 feature-row cotangents.

    exit_t / pair_k / band_capacity are the forward-quality knobs the
    interactive viewer preset tunes (r3 measured at 1M/960x540, PSNR vs
    a K=12/cap=8192/exit=1e-6 reference render: defaults 31.5 FPS at
    103 dB; K=8 + exit 1e-3 + cap 1024 gives 47.8 FPS at 64 dB — below
    8-bit quantization noise, i.e. visually lossless). Training keeps
    the defaults."""
    n = s.px.shape[0]
    tiles_x = _round_up(width, TWC) // TWC
    tiles_y = _round_up(height, TH) // TH
    n_tiles = tiles_x * tiles_y

    if band_capacity <= 0:
        # Per-tile list budget. Overflow drops the FARTHEST entries, and
        # the kernel's transmittance early-exit makes anything behind a
        # few hundred near-opaque splats invisible anyway; 2048 is
        # lossless for small/medium scenes (cap >= n) and visually
        # lossless for dense ones. Raise via RenderConfig
        # sorted_band_capacity for extreme translucent stacking.
        band_capacity = min(_round_up(n, NBS), max(2048, NBS))
    band_capacity = _round_up(band_capacity, NBS)
    chunks_per_tile = band_capacity // NBS

    # Binning is pure int selection (which gaussians, in what order) — no
    # gradient flows through it (same stance as CUDA 3DGS); stop_gradient
    # keeps AD away from its non-differentiable bit tricks.
    stop = jax.lax.stop_gradient
    order, slots, cnt, stats, rects = _bin_pairs_2d(
        stop(s.px), stop(s.py), stop(s.sigma_x), stop(s.sigma_y),
        stop(s.op_eff), stop(z_cam),
        tiles_x, tiles_y, band_capacity, width, height, k=pair_k,
        return_rects=True)

    # Row gather fused into the transpose -> ONE lane-dense (GD_ROWS, S)
    # write (a materialized (S, GD_ROWS) array would tile-pad 8x; see
    # binned.py for the same layout argument). The backward slot->gaussian
    # reduction runs through the segsum custom VJP by default (r5; see
    # _slot_reduce_mode) — TPUGS_SLOT_REDUCE=plain restores the r1-r4
    # scatter-add AD for A/B.
    if _slot_reduce_mode() == "segsum":
        k_eff = pair_k if pair_k > 0 else _k_pairs(n)
        # Structurally-nonzero cotangent rows: head [px,py,ca,(cb),cc,op]
        # (cb only for ewa — the axis backward's cross moment is 0) +
        # the REAL feat columns (pad feat rows get zero cotangents from
        # the resolve; pad rows 14/15 are zeros by construction).
        nf = s.feats.shape[1]
        head = (0, 1, 2, 4, 5) if axis else (0, 1, 2, 3, 4, 5)
        active = head + tuple(range(6, 6 + nf))
        gdense_t = list_gather_prio_t(
            pack_gdataT(s), order, inverse_permutation(order), slots,
            rects, cnt, tiles_x, tiles_y, max(2, k_eff), active)
    else:
        gdense_t = list_gather_t(pack_gdataT_prio(s, order), slots)

    acc = _sorted_core(gdense_t, cnt.astype(jnp.int32), tiles_x, n_tiles,
                       chunks_per_tile, axis, exit_t)

    full = crop_tiled_acc(acc, tiles_y, tiles_x, height, width)
    rgb = full[..., :3]
    alpha = full[..., 3]
    image = rgb + (1.0 - alpha)[..., None] * background[None, None, :]
    depth = jnp.maximum(full[..., 4] / (alpha + 1e-6), 0.0)
    out = (jnp.clip(image, 0.0, 1.0), alpha, depth)
    return out + (stats,) if return_stats else out


def _sorted_fwd_call(gdense, cnt, tiles_x: int, n_tiles: int,
                     chunks_per_tile: int, axis: bool = False,
                     exit_t: float = EXIT_T) -> Array:
    return pl.pallas_call(
        functools.partial(_sorted_kernel, tiles_x=tiles_x,
                          chunks_per_tile=chunks_per_tile, axis=axis,
                          exit_t=exit_t),
        grid=(n_tiles, chunks_per_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # cnt
            pl.BlockSpec((GD_ROWS, NBS),
                         lambda i, j: (0, i * chunks_per_tile + j),
                         memory_space=pltpu.VMEM),    # gdenseT chunk
        ],
        out_specs=pl.BlockSpec((FEAT_PAD, TPS), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((FEAT_PAD, n_tiles * TPS),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((FEAT_PAD, TPS), jnp.float32),  # rgbw accumulator
            pltpu.VMEM((1, TPS), jnp.float32),         # transmittance
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(cnt, gdense)


def _sorted_bwd_kernel(cnt_ref, gdense_ref, acc_ref, g8_ref, out_ref,
                       trans_ref, u_ref, ctg_ref,
                       *, tiles_x: int, chunks_per_tile: int,
                       axis: bool = False, exit_t: float = EXIT_T):
    """Fused backward of the sorted compositing kernel (SURVEY.md hard
    part #1 for the depth-sorted path; the BASELINE north star's
    "hand-fused backward ... per tile").

    Forward-order recompute pass. For C = sum_i T_i a_i f_i (per pixel,
    per feature; T_i the transmittance before gaussian i in global z
    order) the adjoints are
        dL/df_i = T_i a_i g            (g = d L / d acc)
        dL/da_i = T_i (f_i . g) - S_i / (1 - a_i),
    with S_i = sum_{j>i} T_j a_j (f_j . g) computed WITHOUT a backward
    sweep as S_i = (C_tot . g) - P_i, where C_tot comes from the saved
    forward output and P_i is the inclusive running prefix of
    contrib * (f . g) — so the backward streams chunks in the SAME
    front-to-back order as the forward, reusing its early-exit. a-space
    adjoints are emitted as raw moments [Mdx, Mdy, Mxx, Mxy, Myy, M0] of
    g_e = a * g_a; the O(N) chain-rule constants (conic coefficients,
    1/op) are applied outside the kernel (same trick as the v2
    accumulation backward)."""
    i = pl.program_id(0)  # tile
    j = pl.program_id(1)  # chunk within tile

    @pl.when(j == 0)
    def _():
        trans_ref[:] = jnp.ones_like(trans_ref)
        u_ref[:] = jnp.zeros_like(u_ref)
        ctg_ref[:] = jnp.sum(acc_ref[:] * g8_ref[:], axis=0, keepdims=True)

    out_ref[:] = jnp.zeros_like(out_ref)

    live = jnp.max(trans_ref[:]) > exit_t

    @pl.when((j * NBS < cnt_ref[0, i]) & live)
    def _():
        ty = i // tiles_x
        tx = i % tiles_x
        pix = jax.lax.broadcasted_iota(jnp.int32, (1, TPS), dimension=1)
        gx = (tx * TWC + pix % TWC).astype(jnp.float32) + 0.5   # (1, TP)
        gy = (ty * TH + pix // TWC).astype(jnp.float32) + 0.5
        if axis:
            xc, yr = _tile_coords_sep(tx, ty)

        trans = trans_ref[:]                    # (1, TP)
        u_c = u_ref[:]
        ctg = ctg_ref[:]
        g8 = g8_ref[:]                          # (8, TP)

        sub = NBS // 4
        for sb in range(4):
            gd = gdense_ref[:, sb * sub:(sb + 1) * sub].T  # (sub, GD_ROWS)
            if axis:
                a_raw, txd, tyd = _a_raw_sep(gd, xc, yr)
                dx = jnp.concatenate([txd] * TH, axis=1)     # (sub, TP)
                dy = jnp.concatenate(
                    [tyd[:, r : r + 1] * jnp.ones((1, TWC), jnp.float32)
                     for r in range(TH)], axis=1)
            else:
                dx = gx - gd[:, 0:1]            # (sub, TP)
                dy = gy - gd[:, 1:2]
                dx2 = dx * dx
                dxy = dx * dy
                dy2 = dy * dy
                e = -0.5 * (gd[:, 2:3] * dx2 + 2.0 * gd[:, 3:4] * dxy
                            + gd[:, 4:5] * dy2)
                a_raw = gd[:, 5:6] * jnp.exp(e)
            pass_g = (a_raw >= ALPHA_CUTOFF) & (a_raw <= A_MAX)
            a_s = jnp.where(a_raw < ALPHA_CUTOFF, 0.0,
                            jnp.clip(a_raw, 0.0, A_MAX))
            excl = _exclusive_cumprod(1.0 - a_s, axis=0)
            t_i = trans * excl                  # (sub, TP)
            contrib = t_i * a_s
            feats = gd[:, 6:14]                 # (sub, 8)

            # gf[i,p] = sum_f feats[i,f] * g8[f,p]      (MXU)
            # gf stays f32-exact ("highest"): K=8, so its 6 passes are
            # ~8 MXU cycles — free — and it feeds g_a, i.e. EVERY
            # geometry gradient (means/scales/opacity).
            gf = jnp.dot(feats, g8,
                         preferred_element_type=jnp.float32,
                         precision="highest")   # (sub, TP)
            u = contrib * gf
            up = u_c + _inclusive_cumsum(u, axis=0)      # P_i (inclusive)
            g_a = t_i * gf - (ctg - up) / (1.0 - a_s)
            g_e = jnp.where(pass_g, a_s * g_a, 0.0)

            m0 = jnp.sum(g_e, axis=1, keepdims=True)     # (sub, 1)
            ux = g_e * dx
            vy = g_e * dy
            mdx = jnp.sum(ux, axis=1, keepdims=True)
            mdy = jnp.sum(vy, axis=1, keepdims=True)
            mxx = jnp.sum(ux * dx, axis=1, keepdims=True)
            myy = jnp.sum(vy * dy, axis=1, keepdims=True)
            if axis:
                # The axis conic's b is a constant 0: g_cb is discarded
                # upstream, so skip the cross moment.
                mxy = jnp.zeros_like(m0)
            else:
                mxy = jnp.sum(ux * dy, axis=1, keepdims=True)
            # g_feat[i,f] = sum_p contrib[i,p] * g8[f,p]  (MXU). This
            # contraction runs over K = TP = 2048 pixels, and MXU time
            # is K-streaming-bound per output tile — at "highest" (6
            # passes) the two pixel-contracting matmuls cost 2.76 ms of
            # the 12.5 ms backward @100k/512^2 (measured by a 1-pass
            # probe: 12.53 -> 10.24). b3 (bf16x3, 3 passes, error
            # bounded by the dropped lo*lo ~ 2^-16 rel) halves that and
            # only feature gradients (colors / depth aux) see it;
            # geometry grads flow through gf, kept exact above.
            # TPUGS_MM_PRECISION=highest restores exact (splat policy).
            # Axis kernel only: in the EWA kernel (axis=False) the extra
            # VPU work of the non-separable a_raw build overlaps the MXU
            # passes, so b3's bf16-split VPU ops cost MORE than the
            # hidden passes save (measured 11.78 vs 11.44 ms bwd @100k/
            # 512^2 ewa; axis measured 10.55 vs 12.53 — exposed passes).
            if axis:
                g_feat = _dot3(
                    contrib, g8,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                )                               # (sub, 8)
            else:
                g_feat = jax.lax.dot_general(
                    contrib, g8,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision="highest",
                )                               # (sub, 8)
            out_ref[:, sb * sub:(sb + 1) * sub] = jnp.concatenate(
                [mdx, mdy, mxx, mxy, myy, m0, g_feat,
                 jnp.zeros((sub, GD_ROWS - 6 - FEAT_PAD), jnp.float32)],
                axis=1).T

            u_c = up[sub - 1:sub, :]
            trans = trans - jnp.sum(contrib, axis=0, keepdims=True)

        trans_ref[:] = trans
        u_ref[:] = u_c


def _sorted_bwd_call(gdense_t, cnt, acc, g8, tiles_x: int, n_tiles: int,
                     chunks_per_tile: int, axis: bool = False,
                     exit_t: float = EXIT_T) -> Array:
    cols = gdense_t.shape[1]
    return pl.pallas_call(
        functools.partial(_sorted_bwd_kernel, tiles_x=tiles_x,
                          chunks_per_tile=chunks_per_tile, axis=axis,
                          exit_t=exit_t),
        grid=(n_tiles, chunks_per_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # cnt
            pl.BlockSpec((GD_ROWS, NBS),
                         lambda i, j: (0, i * chunks_per_tile + j),
                         memory_space=pltpu.VMEM),    # gdenseT chunk
            pl.BlockSpec((FEAT_PAD, TPS), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),    # acc (fwd output)
            pl.BlockSpec((FEAT_PAD, TPS), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),    # g8 (cotangent)
        ],
        out_specs=pl.BlockSpec((GD_ROWS, NBS),
                               lambda i, j: (0, i * chunks_per_tile + j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GD_ROWS, cols), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, TPS), jnp.float32),  # transmittance
            pltpu.VMEM((1, TPS), jnp.float32),  # prefix of contrib*(f.g)
            pltpu.VMEM((1, TPS), jnp.float32),  # C_tot . g
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(cnt, gdense_t, acc, g8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _sorted_core(gdense_t, cnt, tiles_x, n_tiles, chunks_per_tile,
                 axis=False, exit_t=EXIT_T):
    """acc (FEAT_PAD, n_tiles*TPS) from TRANSPOSED dense per-tile lists
    (GD_ROWS, tiles*cap); row 3 of the output is 1 - T_final (== sum of
    contribs, exactly in real arithmetic). Differentiable in gdense_t via
    the fused backward. axis=True (caller-asserted conic b == 0) builds
    alphas from separable factors ((TWC+TH) exps per gaussian instead of
    TPS)."""
    return _sorted_fwd_call(gdense_t, cnt, tiles_x, n_tiles,
                            chunks_per_tile, axis, exit_t)


def _sorted_core_fwd(gdense_t, cnt, tiles_x, n_tiles, chunks_per_tile,
                     axis, exit_t):
    acc = _sorted_fwd_call(gdense_t, cnt, tiles_x, n_tiles,
                           chunks_per_tile, axis, exit_t)
    return acc, (gdense_t, cnt, acc)


def _sorted_core_bwd(tiles_x, n_tiles, chunks_per_tile, axis, exit_t,
                     res, g_acc):
    import numpy as np

    gdense_t, cnt, acc = res
    raw_t = _sorted_bwd_call(gdense_t, cnt, acc, g_acc, tiles_x, n_tiles,
                             chunks_per_tile, axis, exit_t)
    g_cnt = np.zeros(cnt.shape, jax.dtypes.float0)
    return moment_postpass_t(gdense_t, raw_t), g_cnt


_sorted_core.defvjp(_sorted_core_fwd, _sorted_core_bwd)
