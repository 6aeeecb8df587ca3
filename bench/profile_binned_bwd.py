"""Marginal device-time breakdown of the binned-accum backward.

Isolates the stages of splat_accumulate_binned's gradient path to find
where backward time goes — in particular the slot->gaussian scatter-add
(the AD of the `packed[slots]` list gather), which round-1 profiling
estimated at ~40% of the backward.

Stages (marginal = row minus previous row):
  bin        _bin_pairs_2d only (order/slots/cnt)
  gather     + pack_gdataT_prio + [slots].T  (the forward list gather)
  kfwd       + _binned_core forward kernel
  scatter    vjp of the GATHER alone (cotangent -> packed-row grads)
  full       value_and_grad of sum(acc) wrt packed table
  (kernel bwd ~= full - kfwd - scatter)

Usage: python bench/profile_binned_bwd.py --n 100000 --size 512
       [--fp axis|ewa]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--fp", default="axis", choices=["axis", "ewa"])
    args = ap.parse_args()

    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    sys.path.insert(0, str(Path(__file__).parent))
    from profile_sorted_marginal import marginal

    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import Gaussians
    from tpu_gaussians.ops.common import prepare_splats
    from tpu_gaussians.ops.pallas import binned as bn
    from tpu_gaussians.ops.pallas import sorted as srt

    N = args.n
    W = H = args.size
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    quats = None
    scales = jax.random.uniform(ks[1], (N, 3), jnp.float32, 0.005, 0.03)
    if args.fp == "ewa":
        quats = jax.random.normal(ks[4], (N, 4), jnp.float32)
        quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
        scales = scales * jnp.array([3.0, 1.0, 1.0], jnp.float32)
    g = Gaussians(
        means=jax.random.uniform(ks[0], (N, 3), jnp.float32, -1.0, 1.0),
        scales=scales,
        colors=jax.random.uniform(ks[2], (N, 3), jnp.float32),
        opacities=jax.random.uniform(ks[3], (N,), jnp.float32, 0.2, 0.9),
        quats=quats,
    )
    c = cam.orbit_cameras(1, W, H)
    view, proj = c.view[0], c.proj[0]
    axis = args.fp == "axis"

    s = jax.jit(lambda gg: prepare_splats(gg, view, proj, W, H,
                                          footprint=args.fp))(g)
    jax.block_until_ready(s.px)

    tiles_x = bn._round_up(W, bn.TWC) // bn.TWC
    tiles_y = bn._round_up(H, bn.TH) // bn.TH
    n_tiles = tiles_x * tiles_y
    k = bn._k_pairs(N, budget=bn.ACCUM_PAIR_BUDGET, kmin=bn.ACCUM_K_MIN)
    cap = min(bn._round_up(N, bn.NBS), max(8192, bn.NBS))
    cap = bn._round_up(cap, bn.NBS)
    chunks_per_tile = cap // bn.NBS
    print(f"N={N} {W}x{H} fp={args.fp}: tiles={n_tiles} k={k} cap={cap} "
          f"slots={n_tiles * cap}")

    def run_bin(s_):
        order, slots, cnt, _ = srt._bin_pairs_2d(
            s_.px, s_.py, s_.sigma_x, s_.sigma_y, s_.op_eff, None,
            tiles_x, tiles_y, cap, W, H, cutoff=bn.W_CULL,
            zsort=False, k=k)
        return order.astype(jnp.float32).sum() + slots.sum() + cnt.sum()

    order, slots, cnt, _ = jax.jit(
        lambda s_: srt._bin_pairs_2d(
            s_.px, s_.py, s_.sigma_x, s_.sigma_y, s_.op_eff, None,
            tiles_x, tiles_y, cap, W, H, cutoff=bn.W_CULL,
            zsort=False, k=k))(s)
    cnt = cnt.astype(jnp.int32)
    jax.block_until_ready(slots)
    packed = jax.jit(srt.pack_gdataT_prio)(s, order)
    jax.block_until_ready(packed)
    g_acc = jnp.ones((bn.FEAT_PAD, n_tiles * bn.TPS), jnp.float32)

    # NOTE all device arrays are passed as ARGUMENTS — closed-over
    # device constants hit this runtime's pathological captured-constant
    # slow path (docs/STATUS.md env quirks) and inflate every number.
    def run_gather(p, sl):
        return p[sl].T

    def run_kfwd(p, sl, ct):
        gdense_t = p[sl].T
        return bn._binned_core(gdense_t, ct, tiles_x, n_tiles,
                               chunks_per_tile, axis)

    def run_scatter(p, sl):
        _, vjp = jax.vjp(lambda pp: pp[sl].T, p)
        (gp,) = vjp(p[sl].T * 0.5)  # shaped cotangent, data-dependent
        return gp

    def run_full(p, sl, ct, ga):
        def f(pp):
            acc = bn._binned_core(pp[sl].T, ct, tiles_x, n_tiles,
                                  chunks_per_tile, axis)
            return jnp.sum(acc * ga)
        return jax.grad(f)(p)

    rows = [("bin", run_bin, (s,)),
            ("gather", run_gather, (packed, slots)),
            ("kfwd", run_kfwd, (packed, slots, cnt)),
            ("scatter-only", run_scatter, (packed, slots)),
            ("full fwd+bwd", run_full, (packed, slots, cnt, g_acc))]
    for name, fn, a in rows:
        t = marginal(fn, a)
        print(f"{name:>14}: {t * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
