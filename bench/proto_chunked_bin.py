"""Prototype + price the chunked-sort binner before integration.

Design: pairs generated in z-major order (gaussians pre-sorted by z) are
chunk-sorted by tile (C x L chunked lax.sort, ~5x cheaper than one 12M
sort); per-(chunk, tile) segments then concatenate in chunk order == exact
z order, so dense per-tile lists are pure position arithmetic:
  H[c,t]   per-chunk tile histogram          (compare-reduce)
  P[c,t]   within-chunk segment starts       (cumsum over t)
  cumH     cross-chunk prefix                (cumsum over c)
  c_idx    rank r -> chunk                   (compare-reduce)
  src      = c_idx*L + P[c_idx,t] + (r - cumHexcl[c_idx,t])

Usage: python bench/proto_chunked_bin.py --n 1000000
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def marginal(fn, args, k1=2, k2=10, reps=2):
    def multi(k, *a):
        def body(i, acc):
            # Perturb EVERY input (ints too) with a data dependence on the
            # carry so no iteration is loop-invariant-hoisted.
            eps = (acc * 0).astype(jnp.int32)
            out = fn(*jax.tree.map(
                lambda x: x + eps.astype(x.dtype), a))
            return jnp.float32(jax.tree.leaves(out)[0].reshape(-1)[0])
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
    jf = jax.jit(multi, static_argnums=0)

    def timed(k):
        float(jf(k, *args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            best = min(best, (lambda s: (float(jf(k, *args)),
                                         time.perf_counter() - s)[1])(
                time.perf_counter()) if False else 0)
        # simpler: two timed runs
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jf(k, *args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = timed(k1), timed(k2)
    return max((t2 - t1) / (k2 - k1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()

    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    N = args.n
    K = max(8, min(64, 12_000_000 // N))
    T = 272          # 34 x 8 tiles at 960x540
    CAP = 2048
    L = 8192
    NPAIR = N * K
    C = (NPAIR + L - 1) // L
    NP_PAD = C * L

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)

    # synthetic but realistically-distributed inputs
    zkey = jax.random.randint(ks[0], (N,), 0, 1 << 30, dtype=jnp.int32)
    gdataT = jax.random.uniform(ks[1], (N + 1, 16), jnp.float32)
    # pair tiles: mostly small rects around a center tile
    tile = jax.random.randint(ks[2], (N, K), 0, T, dtype=jnp.int32)
    inval = jax.random.uniform(ks[3], (N, K)) > 0.3  # ~70% invalid slots
    tile = jnp.where(inval, T, tile)
    jax.block_until_ready((zkey, gdataT, tile))

    results = {}

    # 1) z-presort of gaussians
    def f_presort(zk):
        _, order = jax.lax.sort(
            (zk, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
        return order.astype(jnp.float32)
    results["presort_gaussians"] = marginal(f_presort, (zkey,))

    _, order = jax.jit(lambda zk: jax.lax.sort(
        (zk, jnp.arange(N, dtype=jnp.int32)), num_keys=1))(zkey)
    jax.block_until_ready(order)

    # 2) row gather of packed gaussian data
    def f_rowgather(gd, o):
        return gd[o]
    results["rowgather_gdata"] = marginal(f_rowgather, (gdataT[:N], order))

    # 3) chunked pair sort by tile (key) + gidx (value)
    gidx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None],
                            (N, K)).reshape(-1)
    tile_flat = jnp.pad(tile.reshape(-1), (0, NP_PAD - NPAIR),
                        constant_values=T)
    gidx_flat = jnp.pad(gidx, (0, NP_PAD - NPAIR))
    tc = tile_flat.reshape(C, L)
    gc = gidx_flat.reshape(C, L)
    jax.block_until_ready((tc, gc))

    def f_chunksort(t_, g_):
        ts, gs = jax.lax.sort((t_, g_), dimension=1, num_keys=1)
        return ts.astype(jnp.float32)
    results["chunk_sort"] = marginal(f_chunksort, (tc, gc))

    ts_, gs_ = jax.jit(lambda t_, g_: jax.lax.sort(
        (t_, g_), dimension=1, num_keys=1))(tc, gc)
    jax.block_until_ready((ts_, gs_))

    # 4) per-chunk histogram H[c,t] via compare-reduce
    def f_hist(t_):
        tid = jnp.arange(T, dtype=jnp.int32)
        return jnp.sum(t_[:, :, None] == tid[None, None, :],
                       axis=1, dtype=jnp.int32)  # (C, T)
    results["hist"] = marginal(f_hist, (ts_,))

    H = jax.jit(f_hist)(ts_)
    jax.block_until_ready(H)

    # 5) prefix tables + Q
    def f_tables(H_):
        P = jnp.cumsum(H_, axis=1) - H_            # within-chunk starts
        cumH = jnp.cumsum(H_, axis=0)              # inclusive over chunks
        cumHex = cumH - H_
        Q = (P - cumHex
             + (jnp.arange(C, dtype=jnp.int32) * L)[:, None])  # (C, T)
        return Q.astype(jnp.float32)
    results["tables"] = marginal(f_tables, (H,))

    Q, cumH = jax.jit(lambda H_: (
        (jnp.cumsum(H_, axis=1) - H_) - (jnp.cumsum(H_, axis=0) - H_)
        + (jnp.arange(C, dtype=jnp.int32) * L)[:, None],
        jnp.cumsum(H_, axis=0)))(H)
    jax.block_until_ready((Q, cumH))

    # 6) c_idx[t, r] = #chunks with cumH[c,t] <= r  (compare-reduce)
    def f_cidx(cumH_):
        r = jnp.arange(CAP, dtype=jnp.int32)
        return jnp.sum(cumH_[:, :, None] <= r[None, None, :],
                       axis=0, dtype=jnp.int32)  # (T, CAP)
    results["c_idx"] = marginal(f_cidx, (cumH,))

    cidx = jax.jit(f_cidx)(cumH)
    jax.block_until_ready(cidx)

    # 7) Q gather: src[t, r] = Q[cidx[t,r], t] + r
    def f_qgather(Q_, ci):
        tt = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None],
                              (T, CAP))
        src = Q_[ci, tt] + jnp.arange(CAP, dtype=jnp.int32)[None, :]
        return src.astype(jnp.float32)
    results["q_gather"] = marginal(f_qgather, (Q, cidx))

    tt = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None], (T, CAP))
    src = jax.jit(lambda Q_, ci: Q_[ci, tt]
                  + jnp.arange(CAP, dtype=jnp.int32)[None, :])(Q, cidx)
    src = jnp.clip(src, 0, NP_PAD - 1)
    jax.block_until_ready(src)

    # 8) slots gather from chunk-sorted gidx
    def f_slots(gs, s_):
        return gs.reshape(-1)[s_].astype(jnp.float32)
    results["slots_gather"] = marginal(f_slots, (gs_, src))

    slots = jax.jit(lambda gs, s_: gs.reshape(-1)[s_])(gs_, src)
    jax.block_until_ready(slots)

    # 9) final row gather gdense
    def f_gdense(gd, sl):
        return gd[sl.reshape(-1)]
    results["gdense_rowgather"] = marginal(
        f_gdense, (gdataT, jnp.clip(slots, 0, N)))

    total = sum(results.values())
    print(f"config: N={N} K={K} pairs={NPAIR} C={C} L={L} T={T} CAP={CAP}")
    for name, t in results.items():
        print(f"  {name:18s} {t*1e3:9.2f} ms")
    print(f"  TOTAL              {total*1e3:9.2f} ms   "
          f"(current bin+gdense at 1M: ~58 ms)")


if __name__ == "__main__":
    main()
