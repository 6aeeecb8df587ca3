"""Fused Pallas TPU kernels for the splat accumulation + hand-written VJP.

The TPU-native replacement for both the reference's CUDA scatter kernels
(renderer.cu:27-104 `splat_kernel`, :191-216 `finalize_kernel`) and the
PyTorch autograd backward through the dense renderer
(torch_renderer.py:167-190; gradient path documented at SURVEY.md §3.5).

Design — a flash-attention-shaped *gather* formulation (TPUs have no fast
global atomics, so CUDA's per-Gaussian atomicAdd scatter becomes a
per-pixel-tile reduction):

  forward   grid (pixel_tiles, gaussian_blocks):
              w[i,p] = op_i * exp(-((gx_p-px_i)^2/sx_i^2 + (gy_p-py_i)^2/sy_i^2)/2)
              acc[:, tile] += featsT_block @ w          (MXU)
            The pixel-tile output block stays resident in VMEM across the
            gaussian-block loop (grid revisiting), so HBM sees each output
            tile exactly once — the analog of the CUDA DeviceBuffers
            accumulator without the atomics or the H2D/D2H round trips.

  backward  grid (gaussian_blocks, pixel_tiles), recompute-w (no O(N*HW)
            residuals, like flash attention's dK/dV pass):
              g_w    = feats_block @ g_acc8            (MXU)
              g_feat = w @ g_accT                      (MXU)
              g_e    = w * g_w
              per-Gaussian sums over pixels:
                g_px = sum_p g_e * dx / sx^2      g_sx = sum_p g_e * dx^2 / sx^3
                g_py = sum_p g_e * dy / sy^2      g_sy = sum_p g_e * dy^2 / sy^3
                g_op = sum_p exp(e) * g_w
            accumulated in VMEM across pixel tiles per gaussian block.

Everything upstream (projection, SH, activation) and downstream (resolve)
is plain jnp traced by jax.grad; `jax.custom_vjp` splices these kernels in
for exactly the O(N*HW) middle stage.

Orientation notes: w is laid out (NB gaussians, TP pixels) so the pixel
axis is the 128-lane dimension; per-Gaussian backward reductions are lane
reductions. All block dims are multiples of (8, 128) f32 tiling.
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

FEAT_PAD = 8    # feats padded to 8 rows/cols: [r, g, b, 1, z, 0, 0, 0]
GRAD_COLS = 16  # bwd per-gaussian outputs: [g_px, g_py, g_a, g_b, g_c,
                #  g_op, g_feat[0:8], pad] -> 14 used, padded to 16

# Conservative cull threshold: a gaussian is skipped for a pixel tile only
# when its weight there is below W_CULL everywhere. At 1e-14 the total
# dropped mass per pixel is < N*1e-14 — below f32 resolution of the
# accumulators, so culling preserves allclose parity with the dense oracle.
W_CULL = 1e-14


def _sigma_y_from_conic(a, b, c) -> Array:
    """Effective y stddev of the conic footprint: Sigma_yy of the inverse,
    sigma_y^2 = a / (a*c - b^2). Reduces to sigma_y for b=0 axis conics."""
    det = jnp.maximum(a * c - b * b, 1e-12)
    return jnp.sqrt(jnp.maximum(a, 1e-12) / det)


def _band_block_mask(py, sigma_y, op_eff, n_bands: int, tp: int,
                     nb: int, width: int) -> Array:
    """(n_bands, n_blocks) int32 activity mask.

    Inputs are the PADDED, py-SORTED per-gaussian arrays (shape (n_pad,)).
    A block is active in a band iff any of its gaussians' conservative
    y-extent [py - r*sy, py + r*sy] (r from W_CULL) overlaps the band's
    pixel rows. The py-sort makes blocks y-coherent, so the mask is sparse.
    """
    n_pad = py.shape[0]
    n_blocks = n_pad // nb
    r = jnp.sqrt(2.0 * jnp.log(jnp.maximum(op_eff, W_CULL) / W_CULL))
    dead = op_eff <= W_CULL
    lo = jnp.where(dead, jnp.inf, py - r * sigma_y).reshape(n_blocks, nb)
    hi = jnp.where(dead, -jnp.inf, py + r * sigma_y).reshape(n_blocks, nb)
    blo = jnp.min(lo, axis=1)   # (n_blocks,)
    bhi = jnp.max(hi, axis=1)

    band = jnp.arange(n_bands, dtype=jnp.float32)
    band_ylo = jnp.floor(band * tp / width) - 1.0
    band_yhi = jnp.ceil((band + 1.0) * tp / width) + 1.0
    active = (blo[None, :] <= band_yhi[:, None]) & (bhi[None, :] >= band_ylo[:, None])
    return active.astype(jnp.int32)


def _pack_mask_bits(mask: Array) -> Array:
    """Bit-pack an int32 0/1 mask (bands, blocks) into (bands, ceil(b/32))
    int32 words — SMEM is ~1MB, so large block counts must pack 32x."""
    n_bands, n_blocks = mask.shape
    nw = _round_up(n_blocks, 32) // 32
    padded = jnp.pad(mask, ((0, 0), (0, nw * 32 - n_blocks)))
    words = padded.reshape(n_bands, nw, 32)
    weights = (1 << jnp.arange(32, dtype=jnp.uint32)).astype(jnp.uint32)
    packed = jnp.sum(words.astype(jnp.uint32) * weights[None, None, :],
                     axis=2, dtype=jnp.uint32)
    return packed.astype(jnp.int32)


def _mask_bit(mask_ref, i, k):
    """Extract bit k of packed mask row i (arithmetic shift is fine: we
    only inspect the low bit)."""
    word = mask_ref[i, k >> 5]
    return (word >> (k & 31)) & 1


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tile_sizes(n: int, hw: int) -> Tuple[int, int]:
    """(NB gaussians per block, TP pixels per tile), hardware-aligned."""
    nb = min(512, _round_up(max(n, 1), 128))
    tp = min(2048, _round_up(max(hw, 1), 128))
    return nb, tp


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------- forward


def _fwd_kernel(mask_ref, px_ref, py_ref, ca_ref, cb_ref, cc_ref, op_ref,
                featsT_ref, acc_ref, *, width: int, tp: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(_mask_bit(mask_ref, i, j) != 0)
    def _():
        base = i * tp
        idx = base + jax.lax.broadcasted_iota(jnp.int32, (1, tp), dimension=1)
        gx = (idx % width).astype(jnp.float32) + 0.5   # (1, TP)
        gy = (idx // width).astype(jnp.float32) + 0.5

        dx = gx - px_ref[:]     # (NB, TP)
        dy = gy - py_ref[:]
        e = -0.5 * (ca_ref[:] * dx * dx
                    + 2.0 * cb_ref[:] * dx * dy
                    + cc_ref[:] * dy * dy)
        w = op_ref[:] * jnp.exp(e)

        acc_ref[:] += jnp.dot(
            featsT_ref[:], w,
            preferred_element_type=jnp.float32, precision="highest",
        )


def _fwd_call(mask, px, py, ca, cb, cc, op, featsT, hw_pad: int, width: int,
              nb: int, tp: int) -> Array:
    n_pad = px.shape[0]
    grid = (hw_pad // tp, n_pad // nb)
    gblock = lambda i, j: (j, 0)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, width=width, tp=tp),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # mask
            pl.BlockSpec((nb, 1), gblock, memory_space=pltpu.VMEM),  # px
            pl.BlockSpec((nb, 1), gblock, memory_space=pltpu.VMEM),  # py
            pl.BlockSpec((nb, 1), gblock, memory_space=pltpu.VMEM),  # ca
            pl.BlockSpec((nb, 1), gblock, memory_space=pltpu.VMEM),  # cb
            pl.BlockSpec((nb, 1), gblock, memory_space=pltpu.VMEM),  # cc
            pl.BlockSpec((nb, 1), gblock, memory_space=pltpu.VMEM),  # op
            pl.BlockSpec((FEAT_PAD, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),                   # featsT
        ],
        out_specs=pl.BlockSpec((FEAT_PAD, tp), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((FEAT_PAD, hw_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * hw_pad * (FEAT_PAD + 6),
            bytes_accessed=4 * (hw_pad * FEAT_PAD + n_pad * (5 + FEAT_PAD)),
            transcendentals=n_pad * hw_pad,
        ),
        interpret=_interpret(),
    )(mask, px, py, ca, cb, cc, op, featsT)


# ------------------------------------------------- v2 kernels (range loop)
#
# Measurement on a 100k-gaussian 1024x1024 scene showed ~93% of v1's time
# is per-grid-step overhead (bands x blocks steps at ~2us each), not
# compute. v2 eliminates the gaussian-block grid dimension: the grid runs
# over pixel bands only, and each band's kernel fori_loops over its OWN
# contiguous range of active (py-sorted) gaussian blocks.
#
# Layout: all per-gaussian quantities live in ONE packed VMEM-resident
# array gdata (GD_ROWS, n_pad) — rows [px, py, ca, cb, cc, op,
# feats(r,g,b,1,z), pad] — 64 bytes/gaussian, so even 1M gaussians fit
# the 128MB v5e VMEM. Pixels sit on the SUBLANE axis and gaussians on the
# LANE axis ((TP, NB2) weight tiles), which makes every dynamic slice a
# lane-range read and every backward reduction a sublane sum — zero
# in-kernel transposes. v1 remains the fallback for very large N.

NB2 = 512             # gaussian block inside the v2 range loop
TP2 = 2048            # pixels per band tile in v2
V2_VMEM_BUDGET = 80 * 1024 * 1024
V1_MAX_GRID_STEPS = 0  # v2 measured faster at every grid size that fits
                       # VMEM (bench config: bwd 1.15ms v2 vs 1.74ms v1;
                       # 300g/128^2: 0.08ms vs 0.15ms) — v1 is now only
                       # the spill path for N too large for resident gdata

GD_ROWS = 16          # packed rows: 6 params + FEAT_PAD feats + pad
GD_FEAT0 = 6          # feats start row


def _block_ranges(mask: Array) -> Tuple[Array, Array]:
    """mask (bands, blocks) -> per-band (first_active_block, count)."""
    any_active = mask.any(axis=1)
    first = jnp.argmax(mask, axis=1)
    last = mask.shape[1] - 1 - jnp.argmax(mask[:, ::-1], axis=1)
    lo = jnp.where(any_active, first, 0).astype(jnp.int32)
    cnt = jnp.where(any_active, last - first + 1, 0).astype(jnp.int32)
    # (1, n_bands): 2D so SMEM blocks stay legal under vmap batching.
    return lo[None, :], cnt[None, :]


def _v2_fits(n_pad: int, backward: bool) -> bool:
    per_gaussian = (GD_ROWS + (GD_ROWS if backward else 0)) * 4
    fixed = 8 * NB2 * TP2 * 4  # weight tiles + elementwise temporaries
    return n_pad * per_gaussian + fixed <= V2_VMEM_BUDGET


def _v2_block(n: int) -> int:
    """Gaussian block for the v2 range loop: the lane-width multiple that
    minimizes padding waste, capped at NB2 (e.g. n=1200 -> 128-blocks pad
    to 1280, not 1536 — padded pairs are pure wasted VPU work)."""
    best = NB2
    for nb in (128, 256, 384, 512):  # ascending: ties -> larger block
        if nb > NB2:
            break
        if _round_up(n, nb) <= _round_up(n, best):
            best = nb
    return best


def _choose_v2(n: int, hw: int, nb: int, tp: int, backward: bool) -> bool:
    """v2 whenever the packed gdata fits VMEM (measured faster at every
    scale, small and large); v1 is the fallback for huge N."""
    n_pad2 = _round_up(n, NB2)
    if not _v2_fits(n_pad2, backward):
        return False
    v1_steps = (_round_up(hw, tp) // tp) * (_round_up(n, nb) // nb)
    return v1_steps > V1_MAX_GRID_STEPS


def _pack_gdata(px, py, ca, cb, cc, op, feats):
    """(n,)-arrays + feats (n, FEAT_PAD) -> packed (GD_ROWS, n)."""
    rows = [px, py, ca, cb, cc, op] + [feats[:, f] for f in range(FEAT_PAD)]
    rows += [jnp.zeros_like(px)] * (GD_ROWS - len(rows))
    return jnp.stack(rows, axis=0)


def _scale_conic(ca, cb, cc):
    """Pre-scale conics for the v2 kernels' bare polynomial
    e = a'*dx^2 + b'*dxy + c'*dy^2 (a' = -a/2, b' = -b, c' = -c/2)."""
    return -0.5 * ca, -cb, -0.5 * cc


def _v2_pixel_coords(i, tp: int, width: int):
    base = i * tp
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (tp, 1), dimension=0)
    gx = (idx % width).astype(jnp.float32) + 0.5   # (TP, 1)
    gy = (idx // width).astype(jnp.float32) + 0.5
    return gx, gy


def _fwd_kernel_v2(lo_ref, cnt_ref, gdata_ref, acc_ref, *, width: int,
                   tp: int, nb: int):
    # gdata conic rows arrive PRE-SCALED (a' = -a/2, b' = -b, c' = -c/2,
    # see _scale_conic) so e is a bare 3-term polynomial — no in-loop
    # constant multiplies.
    i = pl.program_id(0)
    gx, gy = _v2_pixel_coords(i, tp, width)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    lo = lo_ref[0, i]
    cnt = cnt_ref[0, i]

    def body(k, carry):
        b = pl.multiple_of((lo + k) * nb, nb)
        gd = gdata_ref[:, pl.ds(b, nb)]            # (GD_ROWS, nb)
        dx = gx - gd[0:1, :]                       # (TP, NB2)
        dy = gy - gd[1:2, :]
        e = (gd[2:3, :] * (dx * dx)
             + gd[3:4, :] * (dx * dy)
             + gd[4:5, :] * (dy * dy))
        w = gd[5:6, :] * jnp.exp(e)                # (TP, NB2)
        feats8 = gd[GD_FEAT0 : GD_FEAT0 + FEAT_PAD, :]  # (8, NB2)
        # acc[f, p] += sum_i feats8[f, i] * w[p, i]  — (8, TP) keeps the
        # accumulator lane-dense (a (TP, 8) tile would pad lanes 16x).
        acc_ref[:] += jax.lax.dot_general(
            feats8, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision="highest",
        )
        return carry

    jax.lax.fori_loop(0, cnt, body, 0)


def _fwd_call_v2(lo, cnt, gdata, hw_pad: int, width: int, nb: int) -> Array:
    n_pad = gdata.shape[1]
    grid = (hw_pad // TP2,)

    return pl.pallas_call(
        functools.partial(_fwd_kernel_v2, width=width, tp=TP2, nb=nb),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),   # cnt
            pl.BlockSpec((GD_ROWS, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # gdata (resident)
        ],
        out_specs=pl.BlockSpec((FEAT_PAD, TP2), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((FEAT_PAD, hw_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(lo, cnt, gdata)


def _bwd_kernel_v2(lo_ref, cnt_ref, gdata_ref, g8_ref, out_ref,
                   *, width: int, tp: int, nb: int):
    i = pl.program_id(0)  # band

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    gx, gy = _v2_pixel_coords(i, tp, width)
    lo = lo_ref[0, i]
    cnt = cnt_ref[0, i]

    def body(k, carry):
        b = pl.multiple_of((lo + k) * nb, nb)
        gd = gdata_ref[:, pl.ds(b, nb)]            # (GD_ROWS, nb)
        dx = gx - gd[0:1, :]                       # (TP, NB2)
        dy = gy - gd[1:2, :]
        # Monomials materialized once; reused by e AND the conic moments.
        dx2 = dx * dx
        dxy = dx * dy
        dy2 = dy * dy
        e = gd[2:3, :] * dx2 + gd[3:4, :] * dxy + gd[4:5, :] * dy2
        w = gd[5:6, :] * jnp.exp(e)
        feats8 = gd[GD_FEAT0 : GD_FEAT0 + FEAT_PAD, :]  # (8, NB2)

        g_acc = g8_ref[:]                          # (FEAT_PAD, TP)
        # g_w[p, i] = sum_f g_acc[f, p] * feats8[f, i]
        g_w = jax.lax.dot_general(
            g_acc, feats8, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision="highest",
        )                                          # (TP, NB2)
        # g_feat[f, i] = sum_p g_acc[f, p] * w[p, i]
        g_feat = jnp.dot(
            g_acc, w,
            preferred_element_type=jnp.float32, precision="highest",
        )                                          # (FEAT_PAD, NB2)

        # Raw per-gaussian moments of g_e = w * g_w; the chain-rule
        # constants (conic coefficients, -1/2 scales, 1/op for g_op) are
        # applied OUTSIDE the kernel in O(N) (_splat_bwd): g_px = a*Mdx +
        # b*Mdy, g_ca = -Mxx/2, g_op = M0/op, etc. — this keeps the
        # O(N*HW) inner loop at the bare minimum of multiplies.
        g_e = w * g_w
        m0 = jnp.sum(g_e, axis=0, keepdims=True)             # (1, NB2)
        mdx = jnp.sum(g_e * dx, axis=0, keepdims=True)
        mdy = jnp.sum(g_e * dy, axis=0, keepdims=True)
        mxx = jnp.sum(g_e * dx2, axis=0, keepdims=True)
        mxy = jnp.sum(g_e * dxy, axis=0, keepdims=True)
        myy = jnp.sum(g_e * dy2, axis=0, keepdims=True)

        contrib = jnp.concatenate(
            [mdx, mdy, mxx, mxy, myy, m0, g_feat,
             jnp.zeros((GD_ROWS - 6 - FEAT_PAD, nb), jnp.float32)],
            axis=0,
        )                                          # (GD_ROWS, nb)
        out_ref[:, pl.ds(b, nb)] += contrib
        return carry

    jax.lax.fori_loop(0, cnt, body, 0)


def _bwd_call_v2(lo, cnt, gdata, g8, hw_pad: int, width: int,
                 nb: int) -> Array:
    n_pad = gdata.shape[1]
    grid = (hw_pad // TP2,)

    return pl.pallas_call(
        functools.partial(_bwd_kernel_v2, width=width, tp=TP2, nb=nb),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),   # cnt
            pl.BlockSpec((GD_ROWS, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # gdata (resident)
            pl.BlockSpec((FEAT_PAD, TP2), lambda i: (0, i),
                         memory_space=pltpu.VMEM),   # g8 (per band)
        ],
        out_specs=pl.BlockSpec((GD_ROWS, n_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),  # resident grads
        out_shape=jax.ShapeDtypeStruct((GD_ROWS, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(lo, cnt, gdata, g8)


# ---------------------------------------------------------------- backward


def _bwd_kernel(mask_ref, px_ref, py_ref, ca_ref, cb_ref, cc_ref, op_ref,
                feats_ref, g8_ref, gT_ref, out_ref, *, width: int, tp: int):
    i = pl.program_id(0)  # gaussian block
    j = pl.program_id(1)  # pixel tile index (inner loop)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(_mask_bit(mask_ref, j, i) != 0)
    def _():
        base = j * tp
        idx = base + jax.lax.broadcasted_iota(jnp.int32, (1, tp), dimension=1)
        gx = (idx % width).astype(jnp.float32) + 0.5
        gy = (idx // width).astype(jnp.float32) + 0.5

        ca = ca_ref[:]                  # (NB, 1)
        cb = cb_ref[:]
        cc = cc_ref[:]

        dx = gx - px_ref[:]             # (NB, TP)
        dy = gy - py_ref[:]
        e = -0.5 * (ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy)
        exp_e = jnp.exp(e)
        w = op_ref[:] * exp_e

        # g_w[i,p] = sum_f feats[i,f] * g_acc[f,p]
        g_w = jnp.dot(feats_ref[:], g8_ref[:],
                      preferred_element_type=jnp.float32, precision="highest")
        # g_feat[i,f] = sum_p w[i,p] * g_acc[f,p]
        g_feat = jnp.dot(w, gT_ref[:],
                         preferred_element_type=jnp.float32, precision="highest")

        g_e = w * g_w
        g_op = jnp.sum(exp_e * g_w, axis=1, keepdims=True)        # (NB, 1)
        # de/dpx = a dx + b dy ; de/dpy = b dx + c dy
        g_px = jnp.sum(g_e * (ca * dx + cb * dy), axis=1, keepdims=True)
        g_py = jnp.sum(g_e * (cb * dx + cc * dy), axis=1, keepdims=True)
        # de/da = -dx^2/2 ; de/db = -dx dy ; de/dc = -dy^2/2
        g_ca = jnp.sum(g_e * (-0.5) * dx * dx, axis=1, keepdims=True)
        g_cb = jnp.sum(g_e * (-1.0) * dx * dy, axis=1, keepdims=True)
        g_cc = jnp.sum(g_e * (-0.5) * dy * dy, axis=1, keepdims=True)

        nb = g_feat.shape[0]
        contrib = jnp.concatenate(
            [g_px, g_py, g_ca, g_cb, g_cc, g_op, g_feat,
             jnp.zeros((nb, GRAD_COLS - 6 - FEAT_PAD), jnp.float32)],
            axis=1,
        )
        out_ref[:] += contrib


def _bwd_call(mask, px, py, ca, cb, cc, op, feats, g8, gT, hw_pad: int,
              width: int, nb: int, tp: int) -> Array:
    n_pad = px.shape[0]
    grid = (n_pad // nb, hw_pad // tp)
    gblock = lambda i, j: (i, 0)

    return pl.pallas_call(
        functools.partial(_bwd_kernel, width=width, tp=tp),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                  # mask
            pl.BlockSpec((nb, 1), gblock, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), gblock, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), gblock, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), gblock, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), gblock, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), gblock, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, FEAT_PAD), gblock, memory_space=pltpu.VMEM),
            pl.BlockSpec((FEAT_PAD, tp), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),                  # g8
            pl.BlockSpec((tp, FEAT_PAD), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),                  # gT
        ],
        out_specs=pl.BlockSpec((nb, GRAD_COLS), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, GRAD_COLS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * hw_pad * (2 * FEAT_PAD + 14),
            bytes_accessed=4 * (2 * hw_pad * FEAT_PAD
                                + n_pad * (5 + FEAT_PAD + GRAD_COLS)),
            transcendentals=n_pad * hw_pad,
        ),
        interpret=_interpret(),
    )(mask, px, py, ca, cb, cc, op, feats, g8, gT)


# ------------------------------------------------------------- custom VJP


def _pad_rows(a: Array, n_pad: int) -> Array:
    return jnp.pad(a, ((0, n_pad - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _splat(px, py, ca, cb, cc, op, feats, height, width):
    """acc (H*W, FEAT_DIM) = sum_i w_i(p) * feats_i  via the Pallas kernel."""
    return _splat_fwd(px, py, ca, cb, cc, op, feats, height, width)[0]


def _pad_inputs(px, py, ca, cb, cc, op, feats, n_pad):
    """Pad to the gaussian-block multiple: op=0 (w==0), conic=identity."""
    n = px.shape[0]
    px_p = _pad_rows(px[:, None], n_pad)
    py_p = _pad_rows(py[:, None], n_pad)
    ca_p = jnp.pad(ca[:, None], ((0, n_pad - n), (0, 0)), constant_values=1.0)
    cb_p = _pad_rows(cb[:, None], n_pad)
    cc_p = jnp.pad(cc[:, None], ((0, n_pad - n), (0, 0)), constant_values=1.0)
    op_p = _pad_rows(op[:, None], n_pad)
    feats_p = jnp.pad(feats, ((0, n_pad - n), (0, FEAT_PAD - FEAT_DIM)))
    return px_p, py_p, ca_p, cb_p, cc_p, op_p, feats_p


def _splat_fwd(px, py, ca, cb, cc, op, feats, height, width):
    n = px.shape[0]
    hw = height * width
    nb, tp = _tile_sizes(n, hw)
    hw_pad = _round_up(hw, tp)

    if _choose_v2(n, hw, nb, tp, backward=False):
        nb2 = _v2_block(n)
        n_pad2 = _round_up(n, nb2)
        hw_pad2 = _round_up(hw, TP2)
        px_p, py_p, ca_p, cb_p, cc_p, op_p, feats_p = _pad_inputs(
            px, py, ca, cb, cc, op, feats, n_pad2)
        sy_eff = _sigma_y_from_conic(ca_p[:, 0], cb_p[:, 0], cc_p[:, 0])
        mask = _band_block_mask(py_p[:, 0], sy_eff, op_p[:, 0],
                                hw_pad2 // TP2, TP2, nb2, width)
        lo, cnt = _block_ranges(mask)
        sa, sb, sc = _scale_conic(ca_p[:, 0], cb_p[:, 0], cc_p[:, 0])
        gdata = _pack_gdata(px_p[:, 0], py_p[:, 0], sa, sb, sc,
                            op_p[:, 0], feats_p)
        acc8 = _fwd_call_v2(lo, cnt, gdata, hw_pad2, width, nb2)
        acc = acc8[:FEAT_DIM, :hw].T
    else:
        n_pad = _round_up(n, nb)
        px_p, py_p, ca_p, cb_p, cc_p, op_p, feats_p = _pad_inputs(
            px, py, ca, cb, cc, op, feats, n_pad)
        sy_eff = _sigma_y_from_conic(ca_p[:, 0], cb_p[:, 0], cc_p[:, 0])
        mask = _band_block_mask(py_p[:, 0], sy_eff, op_p[:, 0],
                                hw_pad // tp, tp, nb, width)
        acc8 = _fwd_call(_pack_mask_bits(mask), px_p, py_p, ca_p, cb_p,
                         cc_p, op_p, feats_p.T,
                         hw_pad, width, nb, tp)       # (FEAT_PAD, hw_pad)
        acc = acc8[:FEAT_DIM, :hw].T                  # (hw, FEAT_DIM)
    residuals = (px, py, ca, cb, cc, op, feats)
    return acc, residuals


def _splat_bwd(height, width, residuals, g):
    px, py, ca, cb, cc, op, feats = residuals
    n = px.shape[0]
    hw = height * width
    nb, tp = _tile_sizes(n, hw)
    hw_pad = _round_up(hw, tp)

    if _choose_v2(n, hw, nb, tp, backward=True):
        nb2 = _v2_block(n)
        n_pad2 = _round_up(n, nb2)
        hw_pad2 = _round_up(hw, TP2)
        px_p, py_p, ca_p, cb_p, cc_p, op_p, feats_p = _pad_inputs(
            px, py, ca, cb, cc, op, feats, n_pad2)
        sy_eff = _sigma_y_from_conic(ca_p[:, 0], cb_p[:, 0], cc_p[:, 0])
        mask = _band_block_mask(py_p[:, 0], sy_eff, op_p[:, 0],
                                hw_pad2 // TP2, TP2, nb2, width)
        lo, cnt = _block_ranges(mask)
        sa, sb, sc = _scale_conic(ca_p[:, 0], cb_p[:, 0], cc_p[:, 0])
        gdata = _pack_gdata(px_p[:, 0], py_p[:, 0], sa, sb, sc,
                            op_p[:, 0], feats_p)
        g8_2 = jnp.pad(g, ((0, hw_pad2 - hw), (0, FEAT_PAD - FEAT_DIM))).T
        outT = _bwd_call_v2(lo, cnt, gdata, g8_2, hw_pad2, width, nb2)
        out = outT.T[:n]        # rows [Mdx, Mdy, Mxx, Mxy, Myy, M0, g_feat]
        mdx, mdy = out[:, 0], out[:, 1]
        mxx, mxy, myy, m0 = out[:, 2], out[:, 3], out[:, 4], out[:, 5]
        # O(N) chain-rule post-pass (constants factored out of the kernel):
        # de/dpx = a dx + b dy ; de/da = -dx^2/2 ; w = op * exp(e).
        g_px = ca * mdx + cb * mdy
        g_py = cb * mdx + cc * mdy
        g_ca = -0.5 * mxx
        g_cb = -mxy
        g_cc = -0.5 * myy
        # M0 = sum w*g_w = op * sum exp_e*g_w; rows with op == 0 receive 0
        # here (their true cotangent is masked upstream by valid*alive).
        g_op = jnp.where(op > 0, m0 / jnp.where(op > 0, op, 1.0), 0.0)
        g_feats = out[:, 6 : 6 + FEAT_DIM]
        return g_px, g_py, g_ca, g_cb, g_cc, g_op, g_feats
    else:
        gT = jnp.pad(g, ((0, hw_pad - hw), (0, FEAT_PAD - FEAT_DIM)))
        g8 = gT.T                                     # (8, hw_pad)
        n_pad = _round_up(n, nb)
        px_p, py_p, ca_p, cb_p, cc_p, op_p, feats_p = _pad_inputs(
            px, py, ca, cb, cc, op, feats, n_pad)
        sy_eff = _sigma_y_from_conic(ca_p[:, 0], cb_p[:, 0], cc_p[:, 0])
        mask = _band_block_mask(py_p[:, 0], sy_eff, op_p[:, 0],
                                hw_pad // tp, tp, nb, width)
        out = _bwd_call(_pack_mask_bits(mask), px_p, py_p, ca_p, cb_p,
                        cc_p, op_p, feats_p,
                        g8, gT, hw_pad, width, nb, tp)  # (n_pad, GRAD_COLS)
    out = out[:n]
    g_px = out[:, 0]
    g_py = out[:, 1]
    g_ca = out[:, 2]
    g_cb = out[:, 3]
    g_cc = out[:, 4]
    g_op = out[:, 5]
    g_feats = out[:, 6 : 6 + FEAT_DIM]
    # Column 3 of feats is the constant 1 — its cotangent is not used by
    # callers, but return it faithfully (it is mathematically sum_p g_W).
    return g_px, g_py, g_ca, g_cb, g_cc, g_op, g_feats


_splat.defvjp(_splat_fwd, _splat_bwd)


def splat_accumulate(s: SplatInputs, height: int, width: int,
                     sort: bool = True) -> Array:
    """Drop-in Pallas replacement for jnp_renderer.accumulate_jnp.

    `sort=True` pre-sorts gaussians by screen-y so blocks are y-coherent
    and the band/block cull mask is sparse (the TPU answer to CUDA tile
    binning, SURVEY.md §7 hard part #2). The accumulation is
    order-independent, so sorting does not change the result; gradients
    flow back through the gather automatically.
    """
    if sort and s.px.shape[0] > 512:
        order = jnp.argsort(s.py)
        s = jax.tree.map(lambda a: a[order], s)
    return _splat(s.px, s.py, s.conic_a, s.conic_b, s.conic_c, s.op_eff,
                  s.feats, height, width)
