"""Fit-to-PSNR wall-clock harness (BASELINE config #1 analog).

Fits the reference default workload shape (300 gaussians, 128x128, 4
views, L1 only) against ground-truth renders of a synthetic scene and
reports the wall-clock to reach a PSNR threshold, plus the loss
trajectory. Prints one JSON line.

Usage: python bench/fit_to_psnr.py [--psnr 30] [--iters 300] [--impl auto]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--psnr", type=float, default=30.0)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--impl", default="auto")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import RenderConfig
    from tpu_gaussians.fit.loss import LossConfig
    from tpu_gaussians.fit.step import init_state, make_optimizer, \
        make_train_step
    from tpu_gaussians.models.gaussian_model import activate, init_params
    from tpu_gaussians.ops.dispatch import render

    W = H = 128
    V = 4
    # Ground truth: a synthetic gaussian scene (so PSNR is achievable).
    rng = np.random.default_rng(0)
    from tpu_gaussians.core.types import make_gaussians
    n_true = 150
    g_true = make_gaussians(
        rng.uniform(-0.45, 0.45, (n_true, 3)).astype(np.float32),
        rng.uniform(0.03, 0.12, (n_true, 3)).astype(np.float32),
        rng.uniform(0.4, 0.95, (n_true,)).astype(np.float32),
        colors=rng.uniform(0, 1, (n_true, 3)).astype(np.float32))
    cams = cam.orbit_cameras(V, W, H)
    rc = RenderConfig(width=W, height=H, impl=args.impl, return_aux=True)
    targets = render(g_true, cams, RenderConfig(width=W, height=H,
                                                impl=args.impl))
    zeros = jnp.zeros((V, H, W), jnp.float32)

    raw = init_params(jax.random.PRNGKey(1), 300, 300)
    tx = make_optimizer(0.02)
    lc = LossConfig(silhouette_weight=0.0, depth_weight=0.0)
    step = make_train_step(tx, rc, lc, False, False)
    state = init_state(raw, tx)

    # warm compile (excluded from the wall clock)
    state, m = step(state, cams, targets, zeros, zeros)
    float(m["loss"])
    state = init_state(init_params(jax.random.PRNGKey(1), 300, 300), tx)

    t0 = time.perf_counter()
    hit_t = None
    hit_it = None
    metrics_hist = []
    for it in range(args.iters):
        state, m = step(state, cams, targets, zeros, zeros)
        metrics_hist.append(m["psnr"])
        if (it + 1) % 10 == 0:
            p = float(m["psnr"])
            if hit_t is None and p >= args.psnr:
                hit_t = time.perf_counter() - t0
                hit_it = it + 1
    jax.block_until_ready(state.raw.means)
    total = time.perf_counter() - t0
    final_psnr = float(metrics_hist[-1])

    print(json.dumps({
        "metric": "fit_to_psnr_wallclock",
        "target_psnr_db": args.psnr,
        "reached": hit_t is not None,
        "seconds_to_target": round(hit_t, 3) if hit_t else None,
        "iters_to_target": hit_it,
        "final_psnr_db": round(final_psnr, 2),
        "total_seconds": round(total, 3),
        "iters": args.iters,
    }))


if __name__ == "__main__":
    main()
