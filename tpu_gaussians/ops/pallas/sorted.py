"""Pallas depth-sorted front-to-back compositing (forward only), binned.

The TPU replacement for the reference's depth-aware render paths — exact
global-sort semantics like the CPU path (renderer_cpu.cpp:125-217), not
the CUDA depth-slicing approximation (renderer.cu:106-270):

  order: camera-space z descending (near first)
  per gaussian: a = clamp01(op * exp(e)), dropped when a < 1e-5
  front-to-back: contrib = T * a, T *= (1 - a) per pixel
  finalize: out = clip(rgb + T * bg, 0, 1)

Binning (the TPU answer to CUDA's duplicate-and-sort tile binning, done
with fixed shapes): each z-ranked gaussian is duplicated into every pixel
band its conservative y-extent overlaps (extent from the 1e-5 alpha
cutoff, so exclusion is exact w.r.t. the reference's own cutoff); the
(band, z-rank) pairs are sorted and scattered into a dense
(n_bands, band_capacity) layout of gaussian indices — every band gets a
contiguous, depth-ordered list. The kernel grid is
(bands x chunks_per_band); chunks stream through VMEM via BlockSpec
auto-DMA, and a per-band running transmittance in VMEM scratch performs
the ordered merge (within-chunk ordering via an exclusive cumulative
product of (1 - a) along lanes).

`band_capacity` bounds each band's list; when a band overflows, the
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
    GD_FEAT0,
    GD_ROWS,
    _interpret,
    _pack_gdata,
    _round_up,
    _sigma_y_from_conic,
)

NBS = 512      # gaussians per ordered chunk
TPS = 2048     # pixels per band
ALPHA_CUTOFF = 1e-5
MAX_BANDS_PER_GAUSSIAN = 32


def _exclusive_cumprod_lanes(x: Array) -> Array:
    """Exclusive cumulative product along axis 1 (lanes) of (TP, NB).

    log2(NB) shift-and-multiply doubling steps (Mosaic-friendly; avoids a
    serial scan). exclusive: col i gets prod(x[..0..i-1]), col 0 gets 1.
    """
    nb = x.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    y = jnp.where(cols >= 1, pltpu.roll(x, shift=1, axis=1), 1.0)
    shift = 1
    while shift < nb:
        rolled = jnp.where(cols >= shift, pltpu.roll(y, shift=shift, axis=1),
                           1.0)
        y = y * rolled
        shift *= 2
    return y


def _sorted_kernel(cnt_ref, gdense_ref, acc_ref, rgbw_ref, trans_ref,
                   *, width: int, tp: int, chunks_per_band: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        rgbw_ref[:] = jnp.zeros_like(rgbw_ref)
        trans_ref[:] = jnp.ones_like(trans_ref)

    @pl.when(j * NBS < cnt_ref[0, i])
    def _():
        base = i * tp
        idx = base + jax.lax.broadcasted_iota(jnp.int32, (tp, 1), dimension=0)
        gx = (idx % width).astype(jnp.float32) + 0.5   # (TP, 1)
        gy = (idx // width).astype(jnp.float32) + 0.5

        gd = gdense_ref[:]                      # (GD_ROWS, NBS)
        dx = gx - gd[0:1, :]                    # (TP, NBS)
        dy = gy - gd[1:2, :]
        e = -0.5 * (gd[2:3, :] * dx * dx
                    + 2.0 * gd[3:4, :] * dx * dy
                    + gd[4:5, :] * dy * dy)
        a = gd[5:6, :] * jnp.exp(e)
        a = jnp.where(a < ALPHA_CUTOFF, 0.0, jnp.clip(a, 0.0, 1.0))

        t_within = _exclusive_cumprod_lanes(1.0 - a)  # (TP, NBS)
        contrib = t_within * a                   # (TP, NBS)

        feats8 = gd[GD_FEAT0 : GD_FEAT0 + FEAT_PAD, :]   # (8, NBS)
        # block_rgbw[p, f] = sum_i contrib[p, i] * feats8[f, i]
        block_rgbw = jax.lax.dot_general(
            contrib, feats8, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision="highest",
        )                                        # (TP, 8)
        block_alpha = jnp.sum(contrib, axis=1, keepdims=True)  # (TP, 1)

        trans = trans_ref[:]
        rgbw_ref[:] += trans * block_rgbw
        trans_ref[:] = trans * (1.0 - block_alpha)

    @pl.when(j == chunks_per_band - 1)
    def _():
        # Column 3 carries the final alpha (scatter is unsupported in
        # Mosaic; use a lane-select instead).
        cols = jax.lax.broadcasted_iota(jnp.int32, rgbw_ref.shape, 1)
        acc_ref[:] = jnp.where(cols == 3, 1.0 - trans_ref[:], rgbw_ref[:])


def _bin_pairs(py, sy_eff, op_eff, n_bands: int, width: int,
               band_capacity: int):
    """Duplicate z-ranked gaussians into their overlapped bands and build
    the dense (n_bands * band_capacity,) gaussian-index layout + per-band
    counts. All inputs are z-rank ordered, length n_pad."""
    n_pad = py.shape[0]
    k = min(MAX_BANDS_PER_GAUSSIAN, max(n_bands, 1))

    r = jnp.sqrt(2.0 * jnp.log(
        jnp.maximum(op_eff, ALPHA_CUTOFF) / ALPHA_CUTOFF))
    dead = op_eff <= ALPHA_CUTOFF
    ylo = py - r * sy_eff - 1.0
    yhi = py + r * sy_eff + 1.0
    b_lo = jnp.clip((jnp.floor(ylo) * width) // TPS, 0, n_bands - 1
                    ).astype(jnp.int32)
    b_hi = jnp.clip(((jnp.ceil(yhi) + 1.0) * width) // TPS, 0, n_bands - 1
                    ).astype(jnp.int32)
    count = jnp.where(dead, 0, jnp.minimum(b_hi - b_lo + 1, k)
                      ).astype(jnp.int32)

    jj = jnp.arange(k, dtype=jnp.int32)
    band_ids = b_lo[:, None] + jj[None, :]            # (n_pad, k)
    valid = (jj[None, :] < count[:, None]) & (band_ids < n_bands)

    big = jnp.int32(2**31 - 1)
    zrank = jnp.arange(n_pad, dtype=jnp.int32)
    keys = jnp.where(valid, band_ids * n_pad + zrank[:, None], big)
    flat = keys.reshape(-1)
    sort_idx = jnp.argsort(flat)
    sorted_keys = flat[sort_idx]
    pair_gauss = (sort_idx // k).astype(jnp.int32)
    pair_valid = sorted_keys != big
    pair_band = jnp.where(pair_valid, sorted_keys // n_pad, n_bands)

    lo = jnp.searchsorted(pair_band, jnp.arange(n_bands), side="left")
    p = pair_band.shape[0]
    rank = jnp.arange(p, dtype=jnp.int32) - lo[
        jnp.clip(pair_band, 0, n_bands - 1)].astype(jnp.int32)
    keep = pair_valid & (rank < band_capacity)
    dense_pos = jnp.where(keep, pair_band * band_capacity + rank,
                          n_bands * band_capacity)
    slots = jnp.full((n_bands * band_capacity,), n_pad, jnp.int32)
    slots = slots.at[dense_pos].set(pair_gauss, mode="drop")

    cnt_hi = jnp.searchsorted(pair_band, jnp.arange(n_bands), side="right")
    cnt = jnp.minimum(cnt_hi - lo, band_capacity).astype(jnp.int32)
    # (1, n_bands): 2D so SMEM blocks stay legal under vmap batching.
    return slots, cnt[None, :]


def sorted_composite_pallas(
    s: SplatInputs, z_cam: Array, background: Array,
    height: int, width: int, band_capacity: int = 0,
) -> Tuple[Array, Array]:
    """Depth-sorted forward render -> (image (H,W,3), alpha (H,W))."""
    order = jnp.argsort(-z_cam)
    s = jax.tree.map(lambda a: a[order], s)

    n = s.px.shape[0]
    hw = height * width
    n_pad = _round_up(n, NBS)
    hw_pad = _round_up(hw, TPS)
    n_bands = hw_pad // TPS

    if band_capacity <= 0:
        band_capacity = min(n_pad, max(4096, NBS))
    band_capacity = _round_up(band_capacity, NBS)
    chunks_per_band = band_capacity // NBS

    # Row n_pad is the guaranteed-dead slot pointed to by empty entries.
    pad0 = lambda a: jnp.pad(a, (0, n_pad + 1 - n))
    pad1 = lambda a: jnp.pad(a, (0, n_pad + 1 - n), constant_values=1.0)
    feats_p = jnp.pad(
        s.feats, ((0, n_pad + 1 - n), (0, FEAT_PAD - s.feats.shape[1])))
    gdata = _pack_gdata(pad0(s.px), pad0(s.py), pad1(s.conic_a),
                        pad0(s.conic_b), pad1(s.conic_c), pad0(s.op_eff),
                        feats_p)                      # (16, n_pad+1)

    sy_eff = _sigma_y_from_conic(pad1(s.conic_a)[:n_pad],
                                 pad0(s.conic_b)[:n_pad],
                                 pad1(s.conic_c)[:n_pad])
    slots, cnt = _bin_pairs(pad0(s.py)[:n_pad], sy_eff,
                            pad0(s.op_eff)[:n_pad],
                            n_bands, width, band_capacity)
    gdense = gdata[:, slots]                          # (16, bands*cap)

    acc = pl.pallas_call(
        functools.partial(_sorted_kernel, width=width, tp=TPS,
                          chunks_per_band=chunks_per_band),
        grid=(n_bands, chunks_per_band),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # cnt
            pl.BlockSpec((GD_ROWS, NBS),
                         lambda i, j: (0, i * chunks_per_band + j),
                         memory_space=pltpu.VMEM),    # gdense chunk
        ],
        out_specs=pl.BlockSpec((TPS, FEAT_PAD), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hw_pad, FEAT_PAD), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TPS, FEAT_PAD), jnp.float32),  # rgbw accumulator
            pltpu.VMEM((TPS, 1), jnp.float32),         # transmittance
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(cnt, gdense)

    rgb = acc[:hw, :3]                               # (hw, 3)
    alpha = acc[:hw, 3]
    image = rgb + (1.0 - alpha)[:, None] * background[None, :]
    image = jnp.clip(image, 0.0, 1.0).reshape(height, width, 3)
    return image, alpha.reshape(height, width)
