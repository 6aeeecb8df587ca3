"""Pure-jnp renderer implementations: the numerical oracle / CPU path.

Two compositing modes, both re-expressing the reference's semantics in
idiomatic JAX (chunked `lax.scan` with static shapes instead of a Python
loop, torch_renderer.py:167-190):

  accumulate_jnp    — order-independent weighted-average mode
                      (torch_renderer.py:146-196; also renderer_cpu.cpp Mode A)
  composite_sorted  — global depth sort + front-to-back alpha compositing
                      (renderer_cpu.cpp:125-217, the `enable_depth_sort=1`
                      path), vectorized per chunk via within-chunk cumprod
                      transmittance + associative chunk merge.

Both are differentiable through `jax.grad` (the sorted path through the
fixed permutation).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_gaussians.core.types import Array
from tpu_gaussians.ops.common import FEAT_DIM, SplatInputs, pixel_grid


def _pad_blocks(s: SplatInputs, chunk: int) -> Tuple[SplatInputs, int]:
    """Pad N up to a multiple of `chunk` with zero-opacity Gaussians."""
    n = s.px.shape[0]
    n_pad = (-n) % chunk
    if n_pad == 0:
        return s, n
    pad0 = lambda a: jnp.concatenate([a, jnp.zeros((n_pad,) + a.shape[1:], a.dtype)])
    pad1 = lambda a: jnp.concatenate([a, jnp.ones((n_pad,), a.dtype)])
    padded = SplatInputs(
        px=pad0(s.px),
        py=pad0(s.py),
        conic_a=pad1(s.conic_a),
        conic_b=pad0(s.conic_b),
        conic_c=pad1(s.conic_c),
        sigma_x=pad1(s.sigma_x),
        sigma_y=pad1(s.sigma_y),
        op_eff=pad0(s.op_eff),
        feats=pad0(s.feats),
    )
    return padded, n


def _chunk_weights(
    block: SplatInputs, gx: Array, gy: Array
) -> Array:
    """Gaussian falloff weights for one chunk: (C, HW).

    w_ip = op_i * exp(-0.5 * (a dx^2 + 2 b dx dy + c dy^2))
    (axis-aligned conic == torch_renderer.py:181-185 semantics)
    """
    dx = gx[None, :] - block.px[:, None]
    dy = gy[None, :] - block.py[:, None]
    e = -0.5 * (
        block.conic_a[:, None] * dx * dx
        + 2.0 * block.conic_b[:, None] * dx * dy
        + block.conic_c[:, None] * dy * dy
    )
    return block.op_eff[:, None] * jnp.exp(e)


def accumulate_jnp(s: SplatInputs, height: int, width: int, chunk: int = 256) -> Array:
    """Splat accumulation: acc[p,:] = sum_i w_ip * feat_i  -> (H*W, FEAT_DIM).

    lax.scan over Gaussian chunks bounds live memory to (chunk, HW) while
    keeping a single fused XLA loop (the jit analog of the reference's
    chunked Python loop, torch_renderer.py:162-190).
    """
    s, _ = _pad_blocks(s, chunk)
    n_blocks = s.px.shape[0] // chunk
    gx, gy = pixel_grid(height, width)
    hw = height * width

    blocks = jax.tree.map(
        lambda a: a.reshape((n_blocks, chunk) + a.shape[1:]), s
    )

    def body(acc, block):
        w = _chunk_weights(block, gx, gy)  # (C, HW)
        acc = acc + jnp.dot(
            w.T, block.feats,
            preferred_element_type=jnp.float32, precision="highest",
        )
        return acc, None

    acc0 = jnp.zeros((hw, FEAT_DIM), dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, blocks)
    return acc


def composite_sorted(
    s: SplatInputs,
    z_cam: Array,
    background: Array,
    height: int,
    width: int,
    chunk: int = 64,
    alpha_cutoff: float = 1e-5,
) -> Tuple[Array, Array, Array]:
    """Depth-sorted front-to-back compositing
    -> (image (H,W,3), alpha (H,W), depth (H,W)).

    depth = sum_i contrib_i * z_abs_i / (alpha + 1e-6) — the sorted-mode
    expected-depth aux (the accum mode's depth, torch_renderer.py:202-203,
    re-derived for front-to-back weights), enabling depth supervision in
    sorted training (fit_multiview_stub.py:299-303 semantics).

    Semantics of renderer_cpu.cpp:125-217 and :241-257:
      order: camera-space z descending (larger z = closer, :144-146)
      per Gaussian: a = clamp01(op * exp(e)), dropped when a < 1e-5 (:201-203)
      front-to-back: contrib = (1 - A) * a;  rgb += contrib * c;  A += contrib
      finalize: out = clip(rgb + (1 - A) * bg, 0, 1)

    TPU-shaped: instead of a serial per-Gaussian loop, each chunk of the
    sorted order computes its own over-composite in one vectorized pass
    (within-chunk transmittance via cumprod), and chunks are merged in order
    with the associative `over` operator via lax.scan.
    """
    order = jnp.argsort(-z_cam)
    s = jax.tree.map(lambda a: a[order], s)

    s, _ = _pad_blocks(s, chunk)
    n_blocks = s.px.shape[0] // chunk
    gx, gy = pixel_grid(height, width)
    hw = height * width

    blocks = jax.tree.map(
        lambda a: a.reshape((n_blocks, chunk) + a.shape[1:]), s
    )

    def block_over(block: SplatInputs) -> Tuple[Array, Array]:
        """Over-composite one ordered chunk -> (rgbd (HW,4), alpha (HW,)).

        rgbd column 3 carries the expected-depth numerator
        sum_i contrib_i * z_abs_i (feats column COL_D)."""
        a = _chunk_weights(block, gx, gy)             # (C, HW)
        a = jnp.clip(a, 0.0, 1.0)
        a = jnp.where(a < alpha_cutoff, 0.0, a)
        # Transmittance before each element within the chunk: exclusive
        # cumprod of (1 - a) along the sorted order.
        one_minus = 1.0 - a
        t_before = jnp.concatenate(
            [jnp.ones((1, hw), a.dtype), jnp.cumprod(one_minus, axis=0)[:-1]], axis=0
        )
        contrib = t_before * a                         # (C, HW)
        feats = jnp.concatenate(
            [block.feats[:, :3], block.feats[:, 4:5]], axis=1)
        rgbd = jnp.dot(
            contrib.T, feats,
            preferred_element_type=jnp.float32, precision="highest",
        )                                              # (HW, 4)
        alpha = jnp.sum(contrib, axis=0)               # (HW,)
        return rgbd, alpha

    def body(carry, block):
        rgbd_acc, a_acc = carry
        rgbd_b, a_b = block_over(block)
        one_minus = (1.0 - a_acc)[:, None]
        rgbd_acc = rgbd_acc + one_minus[:, 0:1] * rgbd_b
        a_acc = a_acc + (1.0 - a_acc) * a_b
        return (rgbd_acc, a_acc), None

    rgbd0 = jnp.zeros((hw, 4), dtype=jnp.float32)
    a0 = jnp.zeros((hw,), dtype=jnp.float32)
    (rgbd, alpha), _ = jax.lax.scan(body, (rgbd0, a0), blocks)

    image = rgbd[:, :3] + (1.0 - alpha)[:, None] * background[None, :]
    image = jnp.clip(image, 0.0, 1.0).reshape(height, width, 3)
    depth = jnp.maximum(rgbd[:, 3] / (alpha + 1e-6), 0.0)
    return (image, alpha.reshape(height, width),
            depth.reshape(height, width))
