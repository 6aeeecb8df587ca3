"""HLO-mapped per-op device-time trace of the FORWARD viewer frame
(interactive preset knobs), the instrument that itemizes the 1M
co-located viewer bound (cli.serve --loop: 20.1 ms device @1M).

Usage: python bench/trace_viewer.py --n 1000000 [--steps 20]
"""

from __future__ import annotations

import argparse
import collections
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--pair_k", type=int, default=8)
    ap.add_argument("--exit_t", type=float, default=1e-3)
    ap.add_argument("--cap", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import Gaussians, RenderConfig
    from tpu_gaussians.ops.dispatch import render_sorted

    N, W, H = args.n, args.width, args.height
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    g = Gaussians(
        means=jax.random.uniform(ks[0], (N, 3), jnp.float32, -1.0, 1.0),
        scales=jax.random.uniform(ks[1], (N, 3), jnp.float32, 0.005, 0.03),
        colors=jax.random.uniform(ks[2], (N, 3), jnp.float32),
        opacities=jax.random.uniform(ks[3], (N,), jnp.float32, 0.2, 0.9),
    )
    rc = RenderConfig(width=W, height=H, impl="pallas", mode="sorted",
                      sorted_pair_k=args.pair_k, sorted_exit_t=args.exit_t,
                      sorted_band_capacity=args.cap)
    c = cam.orbit_cameras(args.steps, W, H, radius=2.5)

    views, projs = c.view, c.proj

    @jax.jit
    def multi(g0, views, projs):
        def frame(carry, i):
            img = render_sorted(g0, views[i], projs[i], rc)[0]
            return carry + jnp.sum(img[::97, ::89]), None

        tot, _ = jax.lax.scan(
            frame, 0.0, jnp.arange(args.steps, dtype=jnp.int32))
        return tot

    import os
    if os.environ.get("TPUGS_VIEWER_HLO"):
        text = multi.lower(g, views, projs).compile().as_text()
        Path(os.environ["TPUGS_VIEWER_HLO"]).write_text(text)
        print(f"wrote {len(text)} chars")
    out = multi(g, views, projs)
    float(out)  # warm + force through the relay

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            out = multi(g, views, projs)
            float(out)
        from tpu_gaussians.utils.profiling import load_trace_events
        evs = load_trace_events(td)

    durs = collections.defaultdict(float)
    cnts = collections.defaultdict(int)
    for e in evs:
        durs[e["name"]] += e.get("dur", 0.0)
        cnts[e["name"]] += 1
    total = max(durs.values()) if durs else 0.0
    print(f"viewer fwd n={N} {W}x{H} K={args.pair_k} exit={args.exit_t} "
          f"cap={args.cap}: total device {total/1000.0:.2f} ms / "
          f"{args.steps} frames = {total/1000.0/args.steps:.3f} ms/frame")
    print(f"\n{'op':60s} {'count':>6s} {'ms/frame':>9s}")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{name[:60]:60s} {cnts[name]:6d} "
              f"{d/1000.0/args.steps:9.3f}")


if __name__ == "__main__":
    main()
