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

# MXU precision for the PAIR matmuls (the O(N*W) contractions whose
# operands are real data — NOT the exact broadcast row expansions):
#   "b3"      manual 3-product bf16x3, ~2^-16 relative error, 3 MXU
#             passes. The TPU deployment default: r4 measured flagship
#             step 199.8 -> 149.7 us at image deltas 2.8e-6 / grad rel
#             deltas <= 4.7e-5 vs the float64 oracle — 2x inside every
#             compiled-parity gate (bench/measure_compiled_parity.py),
#             and fit-quality A/B identical (BASELINE.md r4).
#   "highest" 6 bf16 passes (f32-exact products) — the parity-oracle
#             mode, and the default off-TPU (interpret-mode tests).
#   "default" 1 bf16 pass (~4e-3 — measurement-only, fails parity).
# Mosaic rejects lax.Precision.HIGH, hence the hand-rolled b3 split.
import os as _os


def _mm_env() -> str:
    # Re-read at every call (like TPUGS_SEP_ROWS) so an experimenter
    # forcing a precision mid-process is honored — the r4 import-time
    # freeze silently ignored late env changes (advisor finding). The
    # value only affects TRACING, so there is no hot-path cost.
    return _os.environ.get("TPUGS_MM_PRECISION", "")


def _mm_precision() -> str:
    env = _mm_env()
    if env:
        return env
    return "b3" if jax.default_backend() == "tpu" else "highest"


def _dot_pair(a, b, dimension_numbers, exact=False):
    """dot_general at _mm_precision() for the big pair contractions.

    b3: A = A_hi + A_lo (bf16 split, |A_lo| <= 2^-9|A|); the three
    products hi*hi + hi*lo + lo*hi bound the error by the dropped
    lo*lo ~ 2^-16 relative — the same scheme XLA's HIGH precision runs,
    which Mosaic does not expose. MXU takes bf16 operands natively with
    f32 accumulation, so each product is one pass.

    exact=True pins "highest" unless the env knob forces otherwise: the
    GENERAL (v1/v2) kernels keep f32-exact products because their
    backward moments amplify the b3 error through band-scale dx/dy
    factors — the EWA means-grad delta measured 1.5e-4 under b3, past
    the 1e-4 compiled gate, where the separable axis kernels measured
    3.2e-5 (2x inside it)."""
    prec = "highest" if (exact and not _mm_env()) else _mm_precision()
    if prec != "b3":
        return jax.lax.dot_general(
            a, b, dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32, precision=prec)
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32)

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


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

        acc_ref[:] += _dot_pair(
            featsT_ref[:], w,
            dimension_numbers=(((1,), (0,)), ((), ())), exact=True,
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
#
# v3 refinements (same call structure; the per-pair VPU pass count is the
# roofline, so every multiply over the (TP, NB) pair tile matters):
#   * opacity is folded into the feature rows (featsOp = feats * op, done
#     once per gaussian outside the kernel) so the forward never
#     materializes w = op*exp(e): acc = featsOp @ exp(e). The alpha
#     feature column (constant 1) becomes op, which is exactly the w-sum.
#   * e is evaluated in Horner form dx*(a2*dx + b2*dy) + (c2*dy)*dy.
#   * the backward's six per-gaussian moment reductions (mul + sublane
#     reduce each == 12 full passes over the pair tile) collapse into two
#     MXU matmuls of u = g_e*dx and v = g_e*dy against band-centered
#     pixel monomials [1, x, y], followed by an O(NB)-per-band binomial
#     correction (Mxx = sum u*dx = Rx(u) - pxc*R1(u), etc.). Centering x
#     at the image midline and y at the band midline keeps |x| <= W/2 so
#     the f32 matmul's cancellation error stays ~1e-5 relative even for
#     1-px-sigma gaussians.

NB2 = 512             # gaussian block inside the v2 range loop
TP2 = 2048            # pixels per band tile in v2
V2_VMEM_BUDGET = 80 * 1024 * 1024
# Separable-path VMEM model constants, pinned to the measured Mosaic
# compile boundary (bench/probe_sep_vmem.py; see _sep_fits docstring).
SEP_VMEM_BUDGET = 84 * 1024 * 1024
SEP_TEMPS_MARGIN = 1.5
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


def _sep_fits(n_pad: int, wp: int, backward: bool) -> bool:
    """VMEM feasibility of the SEPARABLE band kernels (r4; the old gate
    reused _v2_fits, whose 33.5 MB of v2-only (NB2, TP2) temporaries cut
    the sep path off at ~360k gaussians — sep's per-block temporaries
    are factor arrays bounded by ~(wp + rows) * nb * ~10 f32s instead).
    Resident: gdata (GD_ROWS, n_pad) + in the backward the grad
    accumulator of the same shape.

    Model pinned to COMPILER ground truth (r5, VERDICT r4 #6; oracle =
    Mosaic's scoped-vmem failure under the kernels' 100 MB
    vmem_limit_bytes, bench/probe_sep_vmem.py): at wp=1024/R=32 the
    backward compiles at n_pad=739,328 (resident 94.6 MB) and fails at
    765,952 (98.0 MB), so the true temporaries are 2.0-5.4 MB — the
    factor-array formula below WITHOUT the old bare x10 (3.28 MB at that
    shape) is inside the measured band; SEP_TEMPS_MARGIN covers its
    spread plus compiler drift. SEP_VMEM_BUDGET sits 16% under the
    Mosaic limit; the two together put model capacity (~646k at
    wp=1024/R=32) ~13% below the measured compile boundary. Since r5 a mis-model cannot flip dispatch to
    binned (the sep path streams super-blocks past capacity) — it only
    moves a pass boundary — and test_r4_units pins the model to a
    recorded tolerance band against this probe."""
    resident = n_pad * GD_ROWS * 4 * (2 if backward else 1)
    temps = int((wp + FEAT_PAD * _sep_rows(n_pad) + 64) * 512 * 4
                * SEP_TEMPS_MARGIN)
    return resident + temps <= SEP_VMEM_BUDGET


def sep_path_available(n: int, width: int) -> bool:
    """Single-pass feasibility of the separable axis path (fwd AND bwd —
    one deliberately CONSERVATIVE test on both sides: if the forward
    gated on its larger fwd-only capacity, a beyond-capacity render that
    later got differentiated would stage sep residuals and then spill to
    the v1 kernels for the backward, measured 2514 ms @400k/1024^2).

    r5: this is no longer the dense/binned crossover — beyond this
    capacity the sep path STREAMS gaussian super-blocks through the same
    band kernels (_sep_passes > 1), exactly (accumulation is
    order-independent; backward emits per-super-block grads). Binned
    now serves only the EWA footprint and explicit accum_binned="on"."""
    return _sep_fits(_round_up(n, NB2), _round_up(width, 128),
                     backward=True)


def _sep_capacity_blocks(wp: int, rows: int, nb: int,
                         backward: bool) -> int:
    """Max super-block size in nb-block units that fits VMEM — the
    inverse of _sep_fits' resident+temps model."""
    temps = int((wp + FEAT_PAD * rows + 64) * 512 * 4 * SEP_TEMPS_MARGIN)
    per = GD_ROWS * 4 * (2 if backward else 1)
    cap = max(nb, (SEP_VMEM_BUDGET - temps) // per)
    return max(1, int(cap) // nb)


def _sep_pass_bounds(n_blocks: int, sbb: int):
    """Static super-block boundaries [(b0, b1), ...] in nb-block units."""
    return [(b0, min(n_blocks, b0 + sbb))
            for b0 in range(0, n_blocks, sbb)]


def _sep_pass_ranges(lo, cnt, b0: int, b1: int):
    """Intersect per-band active block ranges [lo, lo+cnt) with the
    super-block [b0, b1): y-sorted gaussians make the active set per band
    contiguous, so the intersection is too — exact, no work duplicated
    or lost across passes."""
    hi = lo + cnt
    lo_s = jnp.clip(lo, b0, b1) - b0
    hi_s = jnp.clip(hi, b0, b1) - b0
    return lo_s.astype(jnp.int32), (hi_s - lo_s).astype(jnp.int32)


def _v2_block(n: int) -> int:
    """Gaussian block for the v2 range loop: the lane-width multiple that
    minimizes padding waste, capped at NB2 (e.g. n=1200 -> 128-blocks pad
    to 1280, not 1536 — padded pairs are pure wasted VPU work).

    r4 re-examined for large n (where padding is negligible at every
    block size): bigger blocks trade per-iteration issue overhead
    against COARSER y-cull granularity, and the measured effect is a
    +-5% wash (100k dense-sep: this rule's nb=256 measured 9.7-10.0 ms
    @512^2 / 26.2-28.6 @1024^2 across sessions; forcing nb=512 gave
    9.1/27.6 — inside that spread). The padding-minimizing rule stays."""
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
    """(n,)-arrays + feats (n, FEAT_PAD) -> packed (GD_ROWS, n).

    Feature rows arrive PRE-MULTIPLIED by opacity (featsOp): the kernels
    never touch op per pair. Row 5 still carries op for reference, but
    the v3 kernels do not read it."""
    rows = [px, py, ca, cb, cc, op] + [feats[:, f] * op
                                       for f in range(FEAT_PAD)]
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
        # Horner conic + op folded into featsOp: x = exp(e) is the whole
        # per-pair elementwise stage.
        e = dx * (gd[2:3, :] * dx + gd[3:4, :] * dy) \
            + (gd[4:5, :] * dy) * dy
        x = jnp.exp(e)                             # (TP, NB2)
        featsop = gd[GD_FEAT0 : GD_FEAT0 + FEAT_PAD, :]  # (8, NB2)
        # acc[f, p] += sum_i featsop[f, i] * x[p, i] — (8, TP) keeps the
        # accumulator lane-dense (a (TP, 8) tile would pad lanes 16x).
        acc_ref[:] += _dot_pair(
            featsop, x, dimension_numbers=(((1,), (1,)), ((), ())),
            exact=True,
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
        e = dx * (gd[2:3, :] * dx + gd[3:4, :] * dy) \
            + (gd[4:5, :] * dy) * dy
        x = jnp.exp(e)                             # (TP, NB2)
        featsop = gd[GD_FEAT0 : GD_FEAT0 + FEAT_PAD, :]  # (8, NB2)

        g_acc = g8_ref[:]                          # (FEAT_PAD, TP)
        # g_x[p, i] = sum_f g_acc[f, p] * featsop[f, i]  == w*g_w/x of the
        # un-folded formulation, so g_e = x * g_x is unchanged.
        g_x = _dot_pair(
            g_acc, featsop, dimension_numbers=(((0,), (0,)), ((), ())),
            exact=True,
        )                                          # (TP, NB2)
        # g_featop[f, i] = sum_p g_acc[f, p] * x[p, i]; the O(N)
        # post-pass recovers g_feat = op * g_featop and
        # g_op = sum_f feats[f] * g_featop[f].
        g_featop = _dot_pair(
            g_acc, x, dimension_numbers=(((1,), (0,)), ((), ())),
            exact=True,
        )                                          # (FEAT_PAD, NB2)

        # Moments of g_e via the u/v factoring (u = g_e*dx, v = g_e*dy):
        # Mxx = sum u*dx, Mxy = sum u*dy, Myy = sum v*dy — 6 moments from
        # 3 products + 5 sublane reductions (M0 is no longer needed: g_op
        # comes from the g_featop product rule in the post-pass).
        g_e = x * g_x
        u = g_e * dx
        v = g_e * dy
        mdx = jnp.sum(u, axis=0, keepdims=True)              # (1, NB2)
        mdy = jnp.sum(v, axis=0, keepdims=True)
        mxx = jnp.sum(u * dx, axis=0, keepdims=True)
        mxy = jnp.sum(u * dy, axis=0, keepdims=True)
        myy = jnp.sum(v * dy, axis=0, keepdims=True)

        contrib = jnp.concatenate(
            [mdx, mdy, mxx, mxy, myy, jnp.zeros((1, nb), jnp.float32),
             g_featop,
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


# ------------------------------------- separable kernels (axis footprint)
#
# For the axis-aligned footprint (the reference's own model,
# torch_renderer.py:146-150: conic b == 0) the weight factorizes:
#   w[(r,c), i] = op_i * exp(a2_i*(xc-px_i)^2) * exp(c2_i*(yr-py_i)^2)
#               = featsOp-scale * Ex[c, i] * Ey[r, i]
# so a band of R image rows never materializes the (R*W, NB) pair tile:
#   forward   acc[(f,r), c] = sum_i G[(f,r), i] * Ex[c, i],
#             G = featsOp (x) Ey  — ONE MXU matmul per gaussian block;
#             transcendental work drops from R*W*NB exps to (W+R)*NB.
#   backward  the CP factorization routes each cotangent through its own
#             factor:  gG = gband @ Ex^T   (for g_featop and the Ey chain)
#                      gEx = gband^T @ G   (for the Ex chain)
#             and the conic/position moments reduce over (W, NB) /
#             (R, NB) factor arrays only:
#               Mdx = sum_c (gEx*Ex)*tx,  Mxx = sum_c (gEx*Ex)*tx^2,
#               Mdy = sum_r (gEy*Ey)*ty,  Myy = sum_r (gEy*Ey)*ty^2,
#               Mxy = 0 (exact for b == 0: the axis conic's b is a
#               constant, so no gradient flows to it).
# Output rows / post-pass are shared with the v2 kernels. The EWA
# footprint (b != 0) keeps the general v2/v1 kernels.

# Image rows per band (R). 8 (the f32 sublane quantum) caps the G matrix
# at FEAT_PAD*8 = 64 rows — half the MXU's 128-row systolic height — so
# R >= 16 fills the array. Beyond that R trades PER-BAND issue overhead
# against Y-CULL granularity, and the right choice is scene-size
# dependent (r4 measured, all else equal):
#   flagship (1200 G, dense mask — culling buys nothing): R=16 129.0
#   us/step, R=32 110.8, R=64 104.2, R=128 100.1 -> big bands win;
#   at-scale (100k G, small splats, sparse mask): R=16 9.7/26.2 ms
#   @512^2/1024^2, R=128 12.2/31.9 -> fine bands win (R=32/64 tie R=16
#   within noise at 100k, but R=16 preserves ~60k more _sep_fits
#   capacity at 1024^2 — R=64 temps would push 400k off the sep path).
# Knee measured at 512^2: 16k R=64 1.6 vs R=16 2.0 ms; 32k R=64 3.5 vs
# R=16 2.9 ms -> threshold between. TPUGS_SEP_ROWS forces a value for
# experiments (bench/proto_seprows.py).
# r5 re-sweep after the permutation-AD fix: R=32 wins or ties R=16 at
# every at-scale point (100k/512^2: 8.30 vs 8.61 ms; 100k/1024^2: 25.8
# vs 27.3; 300k/512^2: 25.2 vs 25.5; 32k: tie) and its ~10% VMEM
# capacity cost stopped mattering once the multi-pass streaming removed
# the capacity cliff (_sep_pass_bounds) -> SEP_ROWS_LARGE = 32.
SEP_ROWS_SMALL = 64
SEP_ROWS_LARGE = 32
SEP_SMALL_MAX_N = 16_384


def _sep_rows(n: int) -> int:
    env = _os.environ.get("TPUGS_SEP_ROWS", "")
    if env:
        return int(env)
    return SEP_ROWS_SMALL if n <= SEP_SMALL_MAX_N else SEP_ROWS_LARGE


def _sep_dims(n: int, height: int, width: int) -> Tuple[int, int, int,
                                                        int, int]:
    nb = _v2_block(n)
    rows = _sep_rows(n)
    wp = _round_up(width, 128)
    hp = _round_up(height, rows)
    return nb, wp, hp, hp // rows, rows


def _sep_factors(gd, xc, yr):
    """Per-block factor matrices from a packed gdata slice.

    G rows ordered (f, r): row f*R + r = featsop[f] * ey[r]. The row
    expansions are EXACT broadcast-reshapes on the sublane axis (zero
    arithmetic). Earlier versions built them with 0/1-selector matmuls,
    which forced precision="highest" for correctness (the default MXU
    precision rounds the non-selector operand to bf16, a ~4e-3 error
    seen as 8e-4 image maxdiff in the round-2 compiled-parity audit) —
    the broadcast form removes both the matmuls and the precision
    coupling."""
    nb = gd.shape[1]
    rows = yr.shape[0]
    tx = xc - gd[0:1, :]                           # (Wp, nb)
    ex = jnp.exp(gd[2:3, :] * (tx * tx))
    ty = yr - gd[1:2, :]                           # (R, nb)
    ey = jnp.exp(gd[4:5, :] * (ty * ty))
    featsop = gd[GD_FEAT0 : GD_FEAT0 + FEAT_PAD, :]
    featsrep = jnp.broadcast_to(
        featsop[:, None, :], (FEAT_PAD, rows, nb)
    ).reshape(FEAT_PAD * rows, nb)                 # row l -> featsop[l//R]
    eyrep = jnp.broadcast_to(
        ey[None, :, :], (FEAT_PAD, rows, nb)
    ).reshape(FEAT_PAD * rows, nb)                 # row l -> ey[l%R]
    g_mat = featsrep * eyrep
    return tx, ex, ty, ey, featsop, eyrep, featsrep, g_mat


def _sep_coords(i, wp: int, rows: int):
    xc = jax.lax.broadcasted_iota(
        jnp.int32, (wp, 1), dimension=0).astype(jnp.float32) + 0.5
    yr = ((i * rows) + jax.lax.broadcasted_iota(
        jnp.int32, (rows, 1), dimension=0)).astype(jnp.float32) + 0.5
    return xc, yr


def _fwd_kernel_sep(lo_ref, cnt_ref, gdata_ref, acc_ref, *, wp: int,
                    nb: int, rows: int):
    i = pl.program_id(0)  # band of `rows` image rows
    xc, yr = _sep_coords(i, wp, rows)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    lo = lo_ref[0, i]
    cnt = cnt_ref[0, i]

    def body(k, carry):
        b = pl.multiple_of((lo + k) * nb, nb)
        gd = gdata_ref[:, pl.ds(b, nb)]
        _, ex, _, _, _, _, _, g_mat = _sep_factors(gd, xc, yr)
        # acc[(f,r), c] += sum_i G[(f,r), i] * Ex[c, i]
        acc_ref[:] += _dot_pair(
            g_mat, ex, dimension_numbers=(((1,), (1,)), ((), ())),
        )                                          # (8*R, Wp)
        return carry

    jax.lax.fori_loop(0, cnt, body, 0)


def _fwd_call_sep(lo, cnt, gdata, n_bands: int, wp: int, nb: int,
                  rows: int) -> Array:
    n_pad = gdata.shape[1]
    br = FEAT_PAD * rows
    return pl.pallas_call(
        functools.partial(_fwd_kernel_sep, wp=wp, nb=nb, rows=rows),
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),   # cnt
            pl.BlockSpec((GD_ROWS, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # gdata (resident)
        ],
        out_specs=pl.BlockSpec((br, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_bands * br, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(lo, cnt, gdata)


def _bwd_kernel_sep(lo_ref, cnt_ref, gdata_ref, gband_ref, out_ref,
                    *, wp: int, nb: int, rows: int):
    i = pl.program_id(0)  # band

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xc, yr = _sep_coords(i, wp, rows)
    lo = lo_ref[0, i]
    cnt = cnt_ref[0, i]

    def body(k, carry):
        b = pl.multiple_of((lo + k) * nb, nb)
        gd = gdata_ref[:, pl.ds(b, nb)]
        tx, ex, ty, ey, featsop, eyrep, featsrep, g_mat = _sep_factors(
            gd, xc, yr)
        gb = gband_ref[:]                          # (8*R, Wp), rows (f, r)

        # gG[(f,r), i] = sum_c gband[(f,r), c] * Ex[c, i]
        g_g = _dot_pair(
            gb, ex, dimension_numbers=(((1,), (0,)), ((), ())),
        )                                          # (8*R, nb)
        # gEx[c, i] = sum_{f,r} gband[(f,r), c] * G[(f,r), i]
        g_ex = _dot_pair(
            gb, g_mat, dimension_numbers=(((0,), (0,)), ((), ())),
        )                                          # (Wp, nb)

        # g_featop[f] = sum_r gG[(f,r)] * Ey[r];  gEy[r] = sum_f
        # gG[(f,r)] * featsop[f] — (R, nb) slice sums (measured faster
        # than selector matmuls here: the contraction outputs are thin).
        r = rows
        g_featop = jnp.concatenate(
            [jnp.sum(g_g[f * r : (f + 1) * r, :] * ey, axis=0,
                     keepdims=True) for f in range(FEAT_PAD)], axis=0
        )                                          # (8, nb)
        g_ey = g_g[0:r, :] * featsop[0:1, :]
        for f in range(1, FEAT_PAD):
            g_ey += g_g[f * r : (f + 1) * r, :] * featsop[f : f + 1, :]

        # Factor-chain moments (shared post-pass layout): u = dL/dE * E.
        u_x = g_ex * ex
        t1 = u_x * tx
        mdx = jnp.sum(t1, axis=0, keepdims=True)             # (1, nb)
        mxx = jnp.sum(t1 * tx, axis=0, keepdims=True)
        u_y = g_ey * ey
        t2 = u_y * ty
        mdy = jnp.sum(t2, axis=0, keepdims=True)
        myy = jnp.sum(t2 * ty, axis=0, keepdims=True)

        contrib = jnp.concatenate(
            [mdx, mdy, mxx, jnp.zeros((1, nb), jnp.float32), myy,
             jnp.zeros((1, nb), jnp.float32), g_featop,
             jnp.zeros((GD_ROWS - 6 - FEAT_PAD, nb), jnp.float32)],
            axis=0,
        )                                          # (GD_ROWS, nb)
        out_ref[:, pl.ds(b, nb)] += contrib
        return carry

    jax.lax.fori_loop(0, cnt, body, 0)


def _bwd_call_sep(lo, cnt, gdata, gband, n_bands: int, wp: int,
                  nb: int, rows: int) -> Array:
    n_pad = gdata.shape[1]
    br = FEAT_PAD * rows
    return pl.pallas_call(
        functools.partial(_bwd_kernel_sep, wp=wp, nb=nb, rows=rows),
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),   # cnt
            pl.BlockSpec((GD_ROWS, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # gdata (resident)
            pl.BlockSpec((br, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),   # gband (per band)
        ],
        out_specs=pl.BlockSpec((GD_ROWS, n_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),  # resident grads
        out_shape=jax.ShapeDtypeStruct((GD_ROWS, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(lo, cnt, gdata, gband)


def _sep_prep(px, py, ca, cb, cc, op, feats, height, width):
    """Shared fwd/bwd staging for the separable path: pad, mask, pack."""
    n = px.shape[0]
    nb, wp, hp, n_bands, rows = _sep_dims(n, height, width)
    n_pad = _round_up(n, nb)
    px_p, py_p, ca_p, cb_p, cc_p, op_p, feats_p = _pad_inputs(
        px, py, ca, cb, cc, op, feats, n_pad)
    sy_eff = _sigma_y_from_conic(ca_p[:, 0], cb_p[:, 0], cc_p[:, 0])
    mask = _band_block_mask(py_p[:, 0], sy_eff, op_p[:, 0],
                            n_bands, rows * wp, nb, wp)
    lo, cnt = _block_ranges(mask)
    sa, sb, sc = _scale_conic(ca_p[:, 0], cb_p[:, 0], cc_p[:, 0])
    gdata = _pack_gdata(px_p[:, 0], py_p[:, 0], sa, sb, sc,
                        op_p[:, 0], feats_p)
    return lo, cnt, gdata, nb, wp, hp, n_bands, rows


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
        g_w = _dot_pair(feats_ref[:], g8_ref[:],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        exact=True)
        # g_feat[i,f] = sum_p w[i,p] * g_acc[f,p]
        g_feat = _dot_pair(w, gT_ref[:],
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           exact=True)

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _splat(px, py, ca, cb, cc, op, feats, height, width, axis=False):
    """acc (H*W, FEAT_DIM) = sum_i w_i(p) * feats_i  via the Pallas kernel.

    axis=True asserts (statically) that cb is identically zero, unlocking
    the separable kernels; the returned g_cb is then zero, which is exact
    for the axis footprint (its conic b is a constant)."""
    return _splat_fwd(px, py, ca, cb, cc, op, feats, height, width, axis)[0]


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


def _splat_fwd(px, py, ca, cb, cc, op, feats, height, width, axis=False):
    n = px.shape[0]
    hw = height * width
    nb, tp = _tile_sizes(n, hw)
    hw_pad = _round_up(hw, tp)

    if axis:
        lo, cnt, gdata, nbs, wp, hp, n_bands, rows = _sep_prep(
            px, py, ca, cb, cc, op, feats, height, width)
        n_blocks = gdata.shape[1] // nbs
        # Super-block streaming (r5 VERDICT #3): pass size from the
        # BACKWARD capacity so fwd and bwd take the same pass structure
        # (and the staged residuals are reusable either way). S == 1 is
        # the resident single-pass case.
        sbb = _sep_capacity_blocks(wp, rows, nbs, backward=True)
        bounds = _sep_pass_bounds(n_blocks, sbb)
        acc_band = None
        for b0, b1 in bounds:
            lo_s, cnt_s = _sep_pass_ranges(lo, cnt, b0, b1)
            out = _fwd_call_sep(lo_s, cnt_s,
                                gdata[:, b0 * nbs : b1 * nbs],
                                n_bands, wp, nbs, rows)
            acc_band = out if acc_band is None else acc_band + out
        # (n_bands * 8R, Wp) rows (band, f, r) -> (hw, FEAT_DIM) crop.
        acc = acc_band.reshape(n_bands, FEAT_PAD, rows, wp).transpose(
            0, 2, 3, 1).reshape(hp, wp, FEAT_PAD)[:height, :width]
        acc = acc.reshape(hw, FEAT_PAD)[:, :FEAT_DIM]
        # The backward reuses the staged (lo, cnt, gdata) instead of
        # re-running pad/mask/pack.
        return acc, (px, py, ca, cb, cc, op, feats, (lo, cnt, gdata))
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
    return acc, (px, py, ca, cb, cc, op, feats, None)


def _splat_bwd(height, width, axis, residuals, g):
    px, py, ca, cb, cc, op, feats, prep = residuals
    n = px.shape[0]
    hw = height * width
    nb, tp = _tile_sizes(n, hw)
    hw_pad = _round_up(hw, tp)

    if axis:
        if prep is not None:
            lo, cnt, gdata = prep
            nbs, wp, hp, n_bands, rows = _sep_dims(n, height, width)
        else:
            lo, cnt, gdata, nbs, wp, hp, n_bands, rows = _sep_prep(
                px, py, ca, cb, cc, op, feats, height, width)
        # Cotangent -> the forward's (band, f, r) x Wp layout.
        g8 = jnp.pad(g.reshape(height, width, FEAT_DIM),
                     ((0, hp - height), (0, wp - width),
                      (0, FEAT_PAD - FEAT_DIM)))
        gband = g8.reshape(n_bands, rows, wp, FEAT_PAD).transpose(
            0, 3, 1, 2).reshape(n_bands * FEAT_PAD * rows, wp)
        n_blocks = gdata.shape[1] // nbs
        sbb = _sep_capacity_blocks(wp, rows, nbs, backward=True)
        parts = []
        for b0, b1 in _sep_pass_bounds(n_blocks, sbb):
            lo_s, cnt_s = _sep_pass_ranges(lo, cnt, b0, b1)
            parts.append(_bwd_call_sep(
                lo_s, cnt_s, gdata[:, b0 * nbs : b1 * nbs], gband,
                n_bands, wp, nbs, rows))
        outT = parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=1)
        out = outT.T[:n]        # rows [Mdx, Mdy, Mxx, 0, Myy, 0, g_featop]
        mdx, mdy = out[:, 0], out[:, 1]
        mxx, myy = out[:, 2], out[:, 4]
        g_px = ca * mdx            # cb == 0 by the axis contract
        g_py = cc * mdy
        g_ca = -0.5 * mxx
        g_cb = jnp.zeros_like(ca)  # exact: axis conic b is a constant
        g_cc = -0.5 * myy
        g_featop = out[:, 6 : 6 + FEAT_DIM]
        g_feats = g_featop * op[:, None]
        g_op = jnp.sum(feats * g_featop, axis=1)
        return g_px, g_py, g_ca, g_cb, g_cc, g_op, g_feats

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
        out = outT.T[:n]        # rows [Mdx, Mdy, Mxx, Mxy, Myy, 0, g_featop]
        mdx, mdy = out[:, 0], out[:, 1]
        mxx, mxy, myy = out[:, 2], out[:, 3], out[:, 4]
        # O(N) chain-rule post-pass (constants factored out of the kernel):
        # de/dpx = a dx + b dy ; de/da = -dx^2/2 ; w = op * exp(e).
        g_px = ca * mdx + cb * mdy
        g_py = cb * mdx + cc * mdy
        g_ca = -0.5 * mxx
        g_cb = -mxy
        g_cc = -0.5 * myy
        # The kernel differentiates w.r.t. featsOp = feats * op, so
        # g_feats = op * g_featop and g_op = sum_f feats_f * g_featop_f
        # (the product rule applied once per gaussian, O(N)).
        g_featop = out[:, 6 : 6 + FEAT_DIM]
        g_feats = g_featop * op[:, None]
        g_op = jnp.sum(feats * g_featop, axis=1)
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


SORT_MM_MAX = 2048  # permutation-as-matmul cutover: the O(n^2) rank
                    # comparisons cost ~n^2*3 VPU ops (~1.5 us at 1200,
                    # ~12 us at 4096) vs a flat ~6 us lax.sort — the
                    # crossover sits near 2k


def _perm_matrix_by_y(py: Array) -> Array:
    """Exact one-hot permutation matrix R of the stable ascending y-sort:
    R[j, p] = 1 iff element j lands at sorted position p (ties broken by
    index, matching jnp.argsort's stability).

    NaN inputs are sanitized to +inf first (one cheap (n,) select), so
    non-finite py reproduces argsort's NaNs-LAST ordering instead of
    collapsing permutation rows (all NaN comparisons are false, which
    would rank every NaN 0 and silently DROP gaussians — r4 advisor
    finding). prepare_splats guarantees finiteness anyway (safe-w
    divide, torch_renderer.py:66-68 semantics); this keeps the
    permutation a permutation even if that upstream contract changes."""
    n = py.shape[0]
    py = jnp.where(jnp.isnan(py), jnp.inf, py)
    idx = jnp.arange(n, dtype=jnp.int32)
    lt = py[:, None] < py[None, :]          # lt[i, j]: py_i before py_j
    eq = py[:, None] == py[None, :]
    tie = idx[:, None] < idx[None, :]
    rank = jnp.sum(lt | (eq & tie), axis=0, dtype=jnp.int32)   # (n,)
    return (rank[:, None] == idx[None, :]).astype(jnp.float32)


@jax.custom_vjp
def _perm_cols(cols, order, inv):
    """`jnp.take(cols, order, axis=1)` with a gather backward: XLA's AD
    of the column-take is a (13, n) scatter-add measured 0.875 ms at
    n=100k (r5 accum trace, fusion.126) while the take itself is cheap —
    `inv` (the inverse permutation) makes the backward another take."""
    return jnp.take(cols, order, axis=1)


def _perm_cols_fwd(cols, order, inv):
    return jnp.take(cols, order, axis=1), (inv,)


def _perm_cols_bwd(res, g):
    import numpy as _np

    (inv,) = res
    z = _np.zeros(inv.shape, jax.dtypes.float0)
    return jnp.take(g, inv, axis=1), z, z


_perm_cols.defvjp(_perm_cols_fwd, _perm_cols_bwd)


def splat_accumulate(s: SplatInputs, height: int, width: int,
                     sort: bool = True, axis: bool = False) -> Array:
    """Drop-in Pallas replacement for jnp_renderer.accumulate_jnp.

    `sort=True` pre-sorts gaussians by screen-y so blocks are y-coherent
    and the band/block cull mask is sparse (the TPU answer to CUDA tile
    binning, SURVEY.md §7 hard part #2). The accumulation is
    order-independent, so sorting does not change the result; gradients
    flow back through the gather automatically.

    `axis=True` (caller-asserted, static) promises conic_b == 0 and
    selects the rank-1 separable kernels (one MXU matmul per gaussian
    block, (W+R)*NB exps instead of W*R*NB).
    """
    n = s.px.shape[0]
    # r5: small scenes skip the y-sort ENTIRELY. At n <= SORT_MM_MAX the
    # gaussians span <= 4 nb-blocks, so the band/block cull ranges are
    # (near-)full-width with or without y-coherence — the flagship trace
    # showed the mask dense — and the sort machinery is pure overhead:
    # bench.py measured 104.2 -> 95.3 us/step (629 -> 688 Mpix/s) with
    # the sort dropped at n=1200. This retires the r4
    # permutation-as-matmul path from the hot loop (it only served
    # n <= SORT_MM_MAX; _perm_matrix_by_y stays tested for reuse). The
    # worst case against this choice is a y-concentrated scene at <= 4
    # blocks, bounded at 4x of a tiny kernel; at n > SORT_MM_MAX the
    # cheap argsort path keeps the at-scale culling win (~10x).
    if sort and n > SORT_MM_MAX:
        # ONE packed lane-dense permute instead of per-leaf gathers: the
        # 13 separate (n,) gathers + their AD scatters cost ~8 us of
        # fixed overhead EACH on this runtime (~115 us/step at bench
        # scale); a (13, n) column-take and its single scatter-add
        # replace them all.
        cols = jnp.stack(
            [s.px, s.py, s.conic_a, s.conic_b, s.conic_c,
             s.sigma_x, s.sigma_y, s.op_eff]
            + [s.feats[:, f] for f in range(s.feats.shape[1])], axis=0)
        iota = jnp.arange(n, dtype=jnp.int32)
        _, order = jax.lax.sort(
            (jax.lax.stop_gradient(s.py), iota), num_keys=1)
        _, inv = jax.lax.sort((order, iota), num_keys=1,
                              is_stable=False)
        ps = _perm_cols(cols, order, inv)
        s = SplatInputs(
            px=ps[0], py=ps[1], conic_a=ps[2], conic_b=ps[3],
            conic_c=ps[4], sigma_x=ps[5], sigma_y=ps[6], op_eff=ps[7],
            feats=ps[8:].T,
        )
    return _splat(s.px, s.py, s.conic_a, s.conic_b, s.conic_c, s.op_eff,
                  s.feats, height, width, axis)
