"""Pallas depth-sorted front-to-back compositing kernel (forward only).

The TPU replacement for the reference's depth-aware render paths — exact
global-sort semantics like the CPU path (renderer_cpu.cpp:125-217), not
the CUDA depth-slicing approximation (renderer.cu:106-270):

  order: camera-space z descending (near first)
  per gaussian: a = clamp01(op * exp(e)), dropped when a < 1e-5
  front-to-back: contrib = T * a, T *= (1 - a) per pixel
  finalize: out = clip(rgb + T * bg, 0, 1)

Kernel shape: gaussians are pre-sorted by z outside (jnp argsort); the
packed gdata array sits resident in VMEM (64 B/gaussian — 1M gaussians fit
the 128MB v5e VMEM). The grid runs over pixel bands; each band fori_loops
over the z-ordered gaussian blocks, skipping blocks whose y-extent misses
the band (skipping preserves depth order). Within a block, the ordered
over-composite is vectorized with an exclusive cumulative product of
(1 - a) along the gaussian (sublane) axis, then merged into the band's
running transmittance — the same block-associative decomposition as the
jnp path (ops/jnp_renderer.composite_sorted).

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
    _band_block_mask,
    _interpret,
    _mask_bit,
    _pack_gdata,
    _pack_mask_bits,
    _round_up,
    _sigma_y_from_conic,
)

NBS = 512   # gaussians per ordered block
TPS = 2048  # pixels per band
ALPHA_CUTOFF = 1e-5


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


def _sorted_kernel(mask_ref, gdata_ref, acc_ref, rgbw_ref, trans_ref,
                   *, width: int, tp: int, n_blocks: int):
    i = pl.program_id(0)
    base = i * tp
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (tp, 1), dimension=0)
    gx = (idx % width).astype(jnp.float32) + 0.5   # (TP, 1)
    gy = (idx // width).astype(jnp.float32) + 0.5

    rgbw_ref[:] = jnp.zeros_like(rgbw_ref)
    trans_ref[:] = jnp.ones_like(trans_ref)

    def body(k, carry):
        @pl.when(_mask_bit(mask_ref, i, k) != 0)
        def _():
            b = pl.multiple_of(k * NBS, NBS)
            gd = gdata_ref[:, pl.ds(b, NBS)]        # (GD_ROWS, NBS)
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

        return carry

    jax.lax.fori_loop(0, n_blocks, body, 0)

    # Column 3 carries the final alpha (scatter is unsupported in Mosaic;
    # use a lane-select instead).
    cols = jax.lax.broadcasted_iota(jnp.int32, rgbw_ref.shape, 1)
    acc_ref[:] = jnp.where(cols == 3, 1.0 - trans_ref[:], rgbw_ref[:])


def sorted_composite_pallas(
    s: SplatInputs, z_cam: Array, background: Array,
    height: int, width: int,
) -> Tuple[Array, Array]:
    """Depth-sorted forward render -> (image (H,W,3), alpha (H,W))."""
    order = jnp.argsort(-z_cam)
    s = jax.tree.map(lambda a: a[order], s)

    n = s.px.shape[0]
    hw = height * width
    n_pad = _round_up(n, NBS)
    hw_pad = _round_up(hw, TPS)
    n_blocks = n_pad // NBS
    n_bands = hw_pad // TPS

    pad0 = lambda a: jnp.pad(a, (0, n_pad - n))
    pad1 = lambda a: jnp.pad(a, (0, n_pad - n), constant_values=1.0)
    feats_p = jnp.pad(s.feats, ((0, n_pad - n), (0, FEAT_PAD - s.feats.shape[1])))
    gdata = _pack_gdata(pad0(s.px), pad0(s.py), pad1(s.conic_a),
                        pad0(s.conic_b), pad1(s.conic_c), pad0(s.op_eff),
                        feats_p)
    sy_eff = _sigma_y_from_conic(pad1(s.conic_a), pad0(s.conic_b),
                                 pad1(s.conic_c))
    mask = _pack_mask_bits(_band_block_mask(pad0(s.py), sy_eff,
                                            pad0(s.op_eff),
                                            n_bands, TPS, NBS, width))

    acc = pl.pallas_call(
        functools.partial(_sorted_kernel, width=width, tp=TPS,
                          n_blocks=n_blocks),
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mask
            pl.BlockSpec((GD_ROWS, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # gdata (resident)
        ],
        out_specs=pl.BlockSpec((TPS, FEAT_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hw_pad, FEAT_PAD), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TPS, FEAT_PAD), jnp.float32),  # rgbw accumulator
            pltpu.VMEM((TPS, 1), jnp.float32),         # transmittance
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(mask, gdata)

    rgb = acc[:hw, :3]                               # (hw, 3)
    alpha = acc[:hw, 3]
    image = rgb + (1.0 - alpha)[:, None] * background[None, :]
    image = jnp.clip(image, 0.0, 1.0).reshape(height, width, 3)
    return image, alpha.reshape(height, width)
