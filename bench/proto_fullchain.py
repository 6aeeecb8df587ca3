"""Isolate the full-chain cost of the list-gather VJP choice.

profile_binned_bwd (grad wrt the PACKED table) showed the rank-1 VJP
winning 22.1 -> 14.7 ms, but the end-to-end at_scale sorted row REGRESSED
36.4 -> 56.4 ms. This measures grad-wrt-SplatInputs through
pack_gdataT_prio + gather + kernel for both gather VJPs, plus partial
chains, to find where the 20 ms appears.

Usage: python bench/proto_fullchain.py [--n 100000] [--size 512]
       [--mode sorted|accum]
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
    ap.add_argument("--mode", default="sorted", choices=["sorted", "accum"])
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
    g = Gaussians(
        means=jax.random.uniform(ks[0], (N, 3), jnp.float32, -1.0, 1.0),
        scales=jax.random.uniform(ks[1], (N, 3), jnp.float32, 0.005, 0.03),
        colors=jax.random.uniform(ks[2], (N, 3), jnp.float32),
        opacities=jax.random.uniform(ks[3], (N,), jnp.float32, 0.2, 0.9),
    )
    c = cam.orbit_cameras(1, W, H)
    view, proj = c.view[0], c.proj[0]

    s = jax.jit(lambda gg: prepare_splats(gg, view, proj, W, H))(g)
    jax.block_until_ready(s.px)

    tiles_x = bn._round_up(W, bn.TWC) // bn.TWC
    tiles_y = bn._round_up(H, bn.TH) // bn.TH
    n_tiles = tiles_x * tiles_y

    if args.mode == "sorted":
        cap = min(srt._round_up(N, srt.NBS), max(2048, srt.NBS))
        cutoff, zsort, kk = srt.ALPHA_CUTOFF, True, srt._k_pairs(N)
        core = srt._sorted_core
    else:
        cap = min(bn._round_up(N, bn.NBS), max(8192, bn.NBS))
        cutoff, zsort = bn.W_CULL, False
        kk = bn._k_pairs(N, budget=bn.ACCUM_PAIR_BUDGET, kmin=bn.ACCUM_K_MIN)
        core = bn._binned_core
    cap = srt._round_up(cap, srt.NBS)
    chunks = cap // srt.NBS
    z_cam = -(s.feats[:, 4])  # placeholder z for sorted priority

    order, slots, cnt, _ = jax.jit(
        lambda s_: srt._bin_pairs_2d(
            s_.px, s_.py, s_.sigma_x, s_.sigma_y, s_.op_eff,
            z_cam if zsort else None,
            tiles_x, tiles_y, cap, W, H, cutoff=cutoff,
            zsort=zsort, k=kk))(s)
    cnt = cnt.astype(jnp.int32)
    jax.block_until_ready(slots)
    print(f"N={N} {W}x{H} mode={args.mode} cap={cap} slots={slots.shape[0]}")

    def raw_gather(p, sl):
        return p[sl].T

    def make_block_gather(rows_per_scatter: int):
        """Custom VJP doing the slot->row reduction as ceil(16/b) scatter
        ops of b-row blocks (b=16 == the plain row scatter; b=1 == the
        rank-1 variant that failed to merge)."""
        @jax.custom_vjp
        def gather(p, sl):
            return p[sl].T

        def fwd(p, sl):
            return p[sl].T, (sl, p.shape[0])

        def bwd(res, g_t):
            import numpy as np
            sl, n_rows = res
            rows = g_t.shape[0]
            blocks = []
            for r0 in range(0, rows, rows_per_scatter):
                blk = g_t[r0:r0 + rows_per_scatter].T  # (S, b)
                blocks.append(
                    jnp.zeros((n_rows, blk.shape[1]), g_t.dtype)
                    .at[sl].add(blk))
            return jnp.concatenate(blocks, axis=1), np.zeros(
                sl.shape, jax.dtypes.float0)

        gather.defvjp(fwd, bwd)
        return gather

    def make_pipeA_gather():
        """Custom VJP via sort + row-gather + cumsum + hist segsum
        (bench/proto_scatter.py pipeA; ~2e-7 rel err from f32 cumsum)."""
        @jax.custom_vjp
        def gather(p, sl):
            return p[sl].T

        def fwd(p, sl):
            return p[sl].T, (sl, p.shape[0])

        def bwd(res, g_t):
            import numpy as np
            sl, n_rows = res
            S = sl.shape[0]
            rows = g_t.shape[0]
            _, pm = jax.lax.sort(
                (sl, jnp.arange(S, dtype=jnp.int32)), num_keys=1)
            gs = g_t.T[pm]                       # (S, rows) sorted by slot
            csum = jnp.cumsum(gs, axis=0)
            c0 = jnp.concatenate(
                [jnp.zeros((1, rows), g_t.dtype), csum], axis=0)
            hist = jnp.zeros((n_rows,), jnp.int32).at[sl].add(1)
            ends = jnp.cumsum(hist)
            out = c0[ends] - c0[ends - hist]
            return out, np.zeros(sl.shape, jax.dtypes.float0)

        gather.defvjp(fwd, bwd)
        return gather

    def chain(gather, with_core):
        def f(s_, sl, ct):
            packed = srt.pack_gdataT_prio(s_, order)
            gd = gather(packed, sl)
            if with_core:
                acc = core(gd, ct, tiles_x, n_tiles, chunks)
                return jnp.sum(acc * 0.5)
            return jnp.sum(gd * 0.5)

        def run(s_, sl, ct):
            gr = jax.grad(f)(s_, sl, ct)
            return sum(jnp.sum(x) for x in
                       (gr.px, gr.py, gr.conic_a, gr.op_eff, gr.feats))
        return run

    rows = [
        ("chain + kernel OLD", chain(raw_gather, True)),
        ("chain + kernel R1", chain(srt.list_gather_t, True)),
        ("chain + kernel blk8", chain(make_block_gather(8), True)),
        ("chain + kernel blk4", chain(make_block_gather(4), True)),
        ("chain + kernel pipeA", chain(make_pipeA_gather(), True)),
    ]
    for name, fn in rows:
        t = marginal(fn, (s, slots, cnt))
        print(f"{name:>24}: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
