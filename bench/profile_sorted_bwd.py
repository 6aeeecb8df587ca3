"""Marginal device-time breakdown of the sorted path's TRAINING cost
(fwd+bwd) — the stage budget VERDICT r3 #4 asks for, the sorted-path
sibling of bench/profile_binned_bwd.py.

Stages (independent marginals; kernel-bwd ~= full - kfwd - scatter):
  bin        _bin_pairs_2d with zsort=True (rects + priority z-sort +
             slot lists)
  gather     pack_gdataT_prio + packed[slots].T (the forward list gather)
  kfwd       + _sorted_core forward kernel
  scatter    vjp of the GATHER alone (slot-grads -> gaussian scatter-add)
  full       value_and_grad of sum(acc * g) wrt the packed table

Usage: python bench/profile_sorted_bwd.py --n 100000 --size 512
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
    args = ap.parse_args()

    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    sys.path.insert(0, str(Path(__file__).parent))
    from profile_sorted_marginal import marginal

    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import Gaussians
    from tpu_gaussians.ops.common import prepare_splats
    from tpu_gaussians.ops.pallas import sorted as srt
    from tpu_gaussians.ops.projection import camera_z

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
    z = jax.jit(lambda gg: camera_z(gg.means, view))(g)
    jax.block_until_ready(s.px)

    tiles_x = srt._round_up(W, srt.TWC) // srt.TWC
    tiles_y = srt._round_up(H, srt.TH) // srt.TH
    n_tiles = tiles_x * tiles_y
    cap = min(srt._round_up(N, srt.NBS), max(2048, srt.NBS))
    cap = srt._round_up(cap, srt.NBS)
    chunks_per_tile = cap // srt.NBS
    print(f"N={N} {W}x{H} sorted: tiles={n_tiles} cap={cap} "
          f"slots={n_tiles * cap}")

    def run_bin(s_, z_):
        order, slots, cnt, _ = srt._bin_pairs_2d(
            s_.px, s_.py, s_.sigma_x, s_.sigma_y, s_.op_eff, z_,
            tiles_x, tiles_y, cap, W, H)
        return order.astype(jnp.float32).sum() + slots.sum() + cnt.sum()

    order, slots, cnt, _ = jax.jit(
        lambda s_, z_: srt._bin_pairs_2d(
            s_.px, s_.py, s_.sigma_x, s_.sigma_y, s_.op_eff, z_,
            tiles_x, tiles_y, cap, W, H))(s, z)
    cnt = cnt.astype(jnp.int32)
    jax.block_until_ready(slots)
    packed = jax.jit(srt.pack_gdataT_prio)(s, order)
    jax.block_until_ready(packed)
    g_acc = jnp.ones((srt.FEAT_PAD, n_tiles * srt.TPS), jnp.float32)

    # All device arrays passed as ARGUMENTS (captured-constant slow path,
    # docs/STATUS.md env quirks).
    def run_gather(p, sl):
        return p[sl].T

    def run_kfwd(p, sl, ct):
        gdense_t = p[sl].T
        return srt._sorted_core(gdense_t, ct, tiles_x, n_tiles,
                                chunks_per_tile, True, srt.EXIT_T)

    def run_scatter(p, sl):
        _, vjp = jax.vjp(lambda pp: pp[sl].T, p)
        (gp,) = vjp(p[sl].T * 0.5)
        return gp

    def run_full(p, sl, ct, ga):
        def f(pp):
            acc = srt._sorted_core(pp[sl].T, ct, tiles_x, n_tiles,
                                   chunks_per_tile, True, srt.EXIT_T)
            return jnp.sum(acc * ga)
        return jax.grad(f)(p)

    rows = [("bin", run_bin, (s, z)),
            ("gather", run_gather, (packed, slots)),
            ("kfwd", run_kfwd, (packed, slots, cnt)),
            ("scatter-only", run_scatter, (packed, slots)),
            ("full fwd+bwd", run_full, (packed, slots, cnt, g_acc))]
    for name, fn, a in rows:
        t = marginal(fn, a)
        print(f"{name:>14}: {t * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
