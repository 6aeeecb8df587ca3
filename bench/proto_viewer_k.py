"""Viewer pair-budget (K) sweep at 1M gaussians (VERDICT r2 #5).

The binner's padded pair count is n*K whether rects need K tiles or not;
at 1M gaussians with trained-scene-sized splats most rects fit 1-4
tiles, so K=12 (PAIR_BUDGET/n) may be mostly padding. For each K this
prints the TRUE overlap loss (clipped_rect_pairs = real overlaps lost to
rect shrink) and the measured full-frame device time, giving the
accuracy/speed frontier for a per-scene K choice.

Usage: python bench/proto_viewer_k.py [--n 1000000] [--ks 12,8,6,4]
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
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--ks", default="12,8,6,4")
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

    N, W, H = args.n, args.width, args.height
    ks_ = jax.random.split(jax.random.PRNGKey(0), 4)
    g = Gaussians(
        means=jax.random.uniform(ks_[0], (N, 3), jnp.float32, -1.0, 1.0),
        scales=jax.random.uniform(ks_[1], (N, 3), jnp.float32, 0.005, 0.03),
        colors=jax.random.uniform(ks_[2], (N, 3), jnp.float32),
        opacities=jax.random.uniform(ks_[3], (N,), jnp.float32, 0.2, 0.9),
    )
    c = cam.orbit_cameras(1, W, H)
    view, proj = c.view[0], c.proj[0]
    s = jax.jit(lambda gg: prepare_splats(gg, view, proj, W, H))(g)
    z = jax.jit(lambda gg: camera_z(gg.means, view))(g)
    jax.block_until_ready((s, z))
    bg = jnp.zeros((3,), jnp.float32)

    tiles_x = srt._round_up(W, srt.TWC) // srt.TWC
    tiles_y = srt._round_up(H, srt.TH) // srt.TH

    base_budget = srt.PAIR_BUDGET
    base_kmin = srt.K_MIN
    for k in [int(x) for x in args.ks.split(",")]:
        # stats at this k
        def f_stats(si):
            *_, count, clip = srt._tile_rects(
                si.px, si.py, si.sigma_x, si.sigma_y, si.op_eff,
                tiles_x, tiles_y, k, W, H)
            return jnp.sum(count), jnp.sum(clip)
        pairs, clipped = jax.jit(f_stats)(s)
        # frame time with _k_pairs forcing this k (NOT via PAIR_BUDGET:
        # _k_pairs' default arg bound the original value at import)
        orig_kp = srt._k_pairs
        srt._k_pairs = lambda n, **kw: k
        try:
            def f_full(si, zz):
                img, _, _ = srt.sorted_composite_pallas(si, zz, bg, H, W)
                return img
            t = marginal(f_full, (s, z))
        finally:
            srt._k_pairs = orig_kp
        print(f"K={k:3d}: frame {t*1e3:7.2f} ms ({1/t:5.1f} FPS)  "
              f"true pairs {int(pairs)}  clipped {int(clipped)} "
              f"({100*int(clipped)/max(int(pairs)+int(clipped),1):.3f}%)")


if __name__ == "__main__":
    main()
