"""Prototype bench: slot->gaussian scatter-add replacements (r2 VERDICT #3).

The binned backward's worst stage is the AD of `packed[slots]`: an
(S, 16) scatter-add into (n+1, 16) with S = n_tiles*cap slot rows
(~12.6 ms of the 36.5 ms fwd+bwd at 100k/512^2). This prices the raw
primitives and composed alternatives so the replacement is chosen from
measurement, not guesswork:

  scatter16        baseline: zeros(n+1,16).at[slots].add(g)
  scatter16_sorted same, slots pre-sorted ascending (locality effect)
  segsum16_sorted  jax.ops.segment_sum(indices_are_sorted=True) on sorted
  scatter1         scalar histogram scatter (1/16 the data)
  sortkv1          lax.sort((slots, iota)) — key + 1 int value
  sortkv16         lax.sort carrying all 16 grad rows as values
  rowgather_S      (S,16)[perm] row gather
  lanegather_S     take((16,S), perm, axis=1) element gather
  cumsum_S16       cumsum((S,16), axis=0)
  pipeA            sortkv1 + rowgather + cumsum + hist + 2 row gathers
                   (global-cumsum segsum; f32 cancellation risk — also
                   prints max rel error vs the scatter baseline)
  pipeB            sortkv1 + rowgather + sorted segment_sum (exact adds)

Usage: python bench/proto_scatter.py [--n 100000] [--size 512] [--cap 8192]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

ROWS = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--cap", type=int, default=8192)
    args = ap.parse_args()

    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    sys.path.insert(0, str(Path(__file__).parent))
    from profile_sorted_marginal import marginal

    n = args.n
    tiles = (args.size // 128) * (args.size // 16)
    S = tiles * args.cap
    print(f"n={n} size={args.size} tiles={tiles} cap={args.cap} S={S}")

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    # Realistic slots: per tile, a sorted-ascending random subset of
    # gaussian ranks with ~60% fill, tail = dead sentinel n.
    fill = int(args.cap * 0.6)
    raw = jax.random.randint(k1, (tiles, fill), 0, n, dtype=jnp.int32)
    raw = jnp.sort(raw, axis=1)
    slots = jnp.concatenate(
        [raw, jnp.full((tiles, args.cap - fill), n, jnp.int32)],
        axis=1).reshape(-1)
    g = jax.random.normal(k2, (S, ROWS), jnp.float32)
    g16 = g.T
    iota = jnp.arange(S, dtype=jnp.int32)
    slots_sorted, perm = jax.lax.sort((slots, iota), num_keys=1)

    def f_scatter16(sl, gg):
        return jnp.zeros((n + 1, ROWS), jnp.float32).at[sl].add(gg)

    def f_segsum16_sorted(sl, gg):
        return jax.ops.segment_sum(gg, sl, num_segments=n + 1,
                                   indices_are_sorted=True)

    def f_scatter1(sl):
        return jnp.zeros((n + 1,), jnp.float32).at[sl].add(1.0)

    def f_scatter1v(sl, gg):
        return jnp.zeros((n + 1,), jnp.float32).at[sl].add(gg[0])

    def f_scatter16x1(sl, gg):
        # 16 rank-1 scatter-adds straight off the lane-dense (16, S)
        # layout the kernel emits — exact (no cancellation), no sort,
        # no row-gather.
        return jnp.stack(
            [jnp.zeros((n + 1,), jnp.float32).at[sl].add(gg[r])
             for r in range(ROWS)], axis=0)

    def f_scatter8c(sl, gg):
        # Pack row pairs as complex64: c64 add == elementwise f32 adds,
        # so 8 scatters carry all 16 rows — tests whether per-UPDATE
        # overhead (not bytes) dominates.
        outs = []
        for r in range(0, ROWS, 2):
            z = jax.lax.complex(gg[r], gg[r + 1])
            o = jnp.zeros((n + 1,), jnp.complex64).at[sl].add(z)
            outs.extend([jnp.real(o), jnp.imag(o)])
        return jnp.stack(outs, axis=0)

    def f_sortkv1(sl, it):
        return jax.lax.sort((sl, it), num_keys=1)

    def f_sortkv16(sl, gg):
        return jax.lax.sort((sl,) + tuple(gg[i] for i in range(ROWS)),
                            num_keys=1)

    def f_rowgather(gg, pm):
        return gg[pm]

    def f_lanegather(gg, pm):
        return jnp.take(gg, pm, axis=1)

    def f_cumsum(gg):
        return jnp.cumsum(gg, axis=0)

    def f_pipeA(sl, gg, it):
        sl_s, pm = jax.lax.sort((sl, it), num_keys=1)
        gs = gg[pm]
        c = jnp.cumsum(gs, axis=0)
        c0 = jnp.concatenate([jnp.zeros((1, ROWS), jnp.float32), c], axis=0)
        hist = jnp.zeros((n + 1,), jnp.int32).at[sl].add(1)
        ends = jnp.cumsum(hist)
        return c0[ends] - c0[ends - hist]

    def f_pipeB(sl, gg, it):
        sl_s, pm = jax.lax.sort((sl, it), num_keys=1)
        gs = gg[pm]
        return jax.ops.segment_sum(gs, sl_s, num_segments=n + 1,
                                   indices_are_sorted=True)

    # Correctness + cancellation check for pipeA/pipeB/scatter16x1
    ref = jax.jit(f_scatter16)(slots, g)
    for nm, fn, a in (("pipeA", f_pipeA, (slots, g, iota)),
                      ("pipeB", f_pipeB, (slots, g, iota)),
                      ("scatter16x1", f_scatter16x1, (slots, g16)),
                      ("scatter8c", f_scatter8c, (slots, g16))):
        out = jax.jit(fn)(*a)
        if out.shape[0] == ROWS:
            out = out.T
        scale = jnp.maximum(jnp.max(jnp.abs(ref)), 1e-30)
        err = float(jnp.max(jnp.abs(out[:n] - ref[:n])) / scale)
        print(f"  {nm} max rel err vs scatter: {err:.3e}")

    rows = [
        ("scatter16", f_scatter16, (slots, g)),
        ("scatter16_sorted", f_scatter16, (slots_sorted, g)),
        ("segsum16_sorted", f_segsum16_sorted, (slots_sorted, g)),
        ("scatter1", f_scatter1, (slots,)),
        ("scatter1v", f_scatter1v, (slots, g16)),
        ("scatter16x1", f_scatter16x1, (slots, g16)),
        ("scatter8c", f_scatter8c, (slots, g16)),
        ("sortkv1", f_sortkv1, (slots, iota)),
        ("sortkv16", f_sortkv16, (slots, g16)),
        ("rowgather_S", f_rowgather, (g, perm)),
        ("lanegather_S", f_lanegather, (g16, perm)),
        ("cumsum_S16", f_cumsum, (g,)),
        ("pipeA", f_pipeA, (slots, g, iota)),
        ("pipeB", f_pipeB, (slots, g, iota)),
    ]
    for name, fn, a in rows:
        t = marginal(fn, a)
        print(f"{name:>18}: {t * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
