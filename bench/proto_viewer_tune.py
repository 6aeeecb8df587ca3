"""Viewer-path tuning matrix: K x EXIT_T x cap, frame time + quality.

The 1M viewer frame is kernel-bound (~17 of ~31.5 ms; binner 14.4).
Three forward-only levers, each a QUALITY knob measured against a
high-fidelity reference render (K=12, cap=8192, EXIT_T=1e-6):

  K        per-gaussian tile budget (rect shrink drops true overlaps)
  EXIT_T   whole-tile transmittance early-exit (1e-6 is far below 8-bit
           visibility; 1e-3 scales later contributions by <0.1%)
  cap      per-tile z-ordered list capacity (overflow drops the FARTHEST
           splats — behind an opaque front they are invisible anyway)

Prints frame ms / FPS / PSNR vs reference for each combo.
Usage: python bench/proto_viewer_tune.py [--n 1000000]
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

    def render(k, exit_t, cap):
        orig_kp, orig_exit = srt._k_pairs, srt.EXIT_T
        srt._k_pairs = lambda n, **kw: k
        srt.EXIT_T = exit_t
        try:
            def f_full(si, zz):
                img, _, _ = srt.sorted_composite_pallas(
                    si, zz, bg, H, W, band_capacity=cap)
                return img
            jf = jax.jit(f_full)
            img = jax.device_get(jf(s, z))
            t = marginal(f_full, (s, z))
        finally:
            srt._k_pairs, srt.EXIT_T = orig_kp, orig_exit
        return img, t

    ref_img, _ = render(12, 1e-6, 8192)

    import numpy as np
    combos = [
        (12, 1e-6, 2048),   # current default
        (8, 1e-6, 2048),
        (8, 1e-3, 2048),
        (8, 1e-3, 1024),
        (12, 1e-3, 1024),
        (8, 1e-2, 1024),
    ]
    for k, et, cap in combos:
        img, t = render(k, et, cap)
        mse = float(np.mean((img - ref_img) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        print(f"K={k:2d} exit={et:g} cap={cap:5d}: {t*1e3:7.2f} ms "
              f"({1/t:5.1f} FPS)  PSNR vs ref {psnr:6.2f} dB")


if __name__ == "__main__":
    main()
