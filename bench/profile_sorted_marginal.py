"""Device-time (marginal-scan) breakdown of the sorted path.

profile_sorted.py's per-call timing includes a ~25ms host round trip
(see bench/micro_primitives.py); this harness chains k iterations in a
fori_loop and reports the marginal per-iteration cost — the true device
time of each stage.

Usage: python bench/profile_sorted_marginal.py --n 1000000
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
    """fn(*args) -> array; chains k data-dependent iterations."""
    def multi(k, *a):
        def body(i, acc):
            out = fn(*jax.tree.map(
                lambda x: x + 0.0 * acc
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a))
            # Consume one element of EVERY float leaf — consuming only
            # leaves[0] lets XLA dead-code everything not feeding it
            # (e.g. the whole backward of a value_and_grad step).
            return sum((jnp.float32(leaf.reshape(-1)[0])
                        for leaf in jax.tree.leaves(out)
                        if jnp.issubdtype(leaf.dtype, jnp.floating)),
                       jnp.float32(0.0))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
    jf = jax.jit(multi, static_argnums=0)

    def timed(k):
        out = jf(k, *args)
        float(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jf(k, *args)
            float(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(k1), timed(k2)
    return max((t2 - t1) / (k2 - k1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--band_capacity", type=int, default=0)
    args = ap.parse_args()

    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import Gaussians
    from tpu_gaussians.ops.common import prepare_splats
    from tpu_gaussians.ops.pallas import sorted as srt
    from tpu_gaussians.ops.projection import camera_z

    N, W, H = args.n, args.width, args.height
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    g = Gaussians(
        means=jax.random.uniform(ks[0], (N, 3), jnp.float32, -1.0, 1.0),
        scales=jax.random.uniform(ks[1], (N, 3), jnp.float32, 0.005, 0.03),
        colors=jax.random.uniform(ks[2], (N, 3), jnp.float32),
        opacities=jax.random.uniform(ks[3], (N,), jnp.float32, 0.2, 0.9),
    )
    c = cam.orbit_cameras(1, W, H)
    view, proj = c.view[0], c.proj[0]

    s = jax.jit(lambda gg: prepare_splats(gg, view, proj, W, H))(g)
    z = jax.jit(lambda gg: camera_z(gg.means, view))(g)
    jax.block_until_ready((s, z))

    tiles_x = srt._round_up(W, srt.TWC) // srt.TWC
    tiles_y = srt._round_up(H, srt.TH) // srt.TH
    cap = args.band_capacity
    if cap <= 0:
        cap = min(srt._round_up(N, srt.NBS), max(2048, srt.NBS))
    cap = srt._round_up(cap, srt.NBS)

    results = {}

    # stage 1: rect build + pair keys (no sort)
    k = srt._k_pairs(N)
    n_tiles = tiles_x * tiles_y

    def f_rects(si, zz):
        tx_lo, ty_lo, kx_c, ky_c, count, _clip = srt._tile_rects(
            si.px, si.py, si.sigma_x, si.sigma_y, si.op_eff,
            tiles_x, tiles_y, k, W, H)
        return (tx_lo + ty_lo + kx_c + ky_c + count).astype(jnp.float32)
    results["rects"] = marginal(f_rects, (s, z))

    def f_bin(si, zz):
        _, slots, cnt, _st = srt._bin_pairs_2d(
            si.px, si.py, si.sigma_x, si.sigma_y, si.op_eff, zz,
            tiles_x, tiles_y, cap, W, H)
        return slots.astype(jnp.float32)
    results["bin_pairs_2d"] = marginal(f_bin, (s, z))

    bg = jnp.zeros((3,), jnp.float32)

    def f_full(si, zz):
        img, _, _ = srt.sorted_composite_pallas(
            si, zz, bg, H, W, band_capacity=args.band_capacity)
        return img
    results["full"] = marginal(f_full, (s, z))

    print(f"config: N={N} {W}x{H} cap={cap} (marginal device time)")
    for name, t in results.items():
        print(f"  {name:14s} {t*1e3:9.2f} ms")
    print(f"  full FPS (pipelined): {1.0/results['full']:.1f}")


if __name__ == "__main__":
    main()
