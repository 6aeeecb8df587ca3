"""Stage breakdown of the depth-sorted realtime path (STATUS.md gap #2).

Measures, at viewer shape (960x540 default):
  bin_pairs_2d   tile-rect build + fused (tile, zbits, idx) lax.sort +
                 dense-list gather
  gdense_build   packed-row gather + transpose
  kernel         the pallas 2D-tile sorted compositing kernel alone
  full           sorted_composite_pallas end to end

Usage: python bench/profile_sorted.py --n 100000 [--width 960 --height 540]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def timeit(jf, args, reps=3):
    out = jf(*args)
    jax.block_until_ready(out)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jf(*args)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
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
    n_tiles = tiles_x * tiles_y
    cap = args.band_capacity
    if cap <= 0:
        cap = min(srt._round_up(N, srt.NBS), max(4096, srt.NBS))
    cap = srt._round_up(cap, srt.NBS)
    chunks = cap // srt.NBS

    results = {}

    def f_bin(si, zz):
        _, slots, cnt, _st = srt._bin_pairs_2d(
            si.px, si.py, si.sigma_x, si.sigma_y, si.op_eff, zz,
            tiles_x, tiles_y, cap, W, H)
        return slots.astype(jnp.float32), cnt
    results["bin_pairs_2d"] = timeit(jax.jit(f_bin), (s, z))

    order, slots, cnt, _st = jax.jit(lambda si, zz: srt._bin_pairs_2d(
        si.px, si.py, si.sigma_x, si.sigma_y, si.op_eff, zz,
        tiles_x, tiles_y, cap, W, H))(s, z)
    jax.block_until_ready((slots, cnt))

    def f_gd(si, od, sl):
        return srt.list_gather_t(srt.pack_gdataT_prio(si, od), sl)
    results["gdense_build"] = timeit(jax.jit(f_gd), (s, order, slots))

    gdense = jax.jit(f_gd)(s, order, slots)
    jax.block_until_ready(gdense)

    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def f_kernel(cc, gd):
        return pl.pallas_call(
            functools.partial(srt._sorted_kernel, tiles_x=tiles_x,
                              chunks_per_tile=chunks),
            grid=(n_tiles, chunks),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((srt.GD_ROWS, srt.NBS),
                             lambda i, j: (0, i * chunks + j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((srt.FEAT_PAD, srt.TPS),
                                   lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (srt.FEAT_PAD, n_tiles * srt.TPS), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((srt.FEAT_PAD, srt.TPS), jnp.float32),
                pltpu.VMEM((1, srt.TPS), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=srt._interpret(),
        )(cc, gd)
    results["kernel"] = timeit(jax.jit(f_kernel), (cnt, gdense))

    bg = jnp.zeros((3,), jnp.float32)

    def f_full(si, zz):
        img, alpha, _ = srt.sorted_composite_pallas(
            si, zz, bg, H, W, band_capacity=args.band_capacity)
        return img
    results["full"] = timeit(jax.jit(f_full), (s, z))

    print(f"config: N={N} {W}x{H} tiles={tiles_y}x{tiles_x} cap={cap} "
          f"chunks/tile={chunks}")
    for name, t in results.items():
        print(f"  {name:14s} {t*1e3:9.2f} ms")
    print(f"  full FPS: {1.0/results['full']:.1f}")


if __name__ == "__main__":
    main()
