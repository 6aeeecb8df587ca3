"""HLO-mapped per-op device-time trace of the SORTED (or accum) training path
(fwd+bwd through binning + list gather + compositing kernels), the
instrument VERDICT r4 #1 asks for: the flagship treatment
(trace_step.py aggregation) pointed at the at-scale path where real
training time goes.

Runs grad(sum(render_sorted * g)) chained on-device `--steps` times and
aggregates device-op durations by HLO op name, so the ~40% non-kernel
share (binner, slot-scatter AD, postpass) is itemized fusion by fusion.

Usage: python bench/trace_sorted.py --n 100000 --size 512 [--steps 20]
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
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--fp", default="axis", choices=["axis", "ewa"])
    ap.add_argument("--hlo", default="", help="dump compiled HLO here")
    ap.add_argument("--pair_k", type=int, default=0)
    ap.add_argument("--mode", default="sorted", choices=["sorted", "accum"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import Gaussians, RenderConfig
    from tpu_gaussians.ops.dispatch import render_accum, render_sorted

    N, W = args.n, args.size
    H = W
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    g = Gaussians(
        means=jax.random.uniform(ks[0], (N, 3), jnp.float32, -1.0, 1.0),
        scales=jax.random.uniform(ks[1], (N, 3), jnp.float32, 0.005, 0.03),
        colors=jax.random.uniform(ks[2], (N, 3), jnp.float32),
        opacities=jax.random.uniform(ks[3], (N,), jnp.float32, 0.2, 0.9),
        quats=(None if args.fp == "axis" else
               jax.random.normal(ks[4], (N, 4), jnp.float32)),
    )
    c = cam.orbit_cameras(1, W, H)
    view, proj = c.view[0], c.proj[0]
    rc = RenderConfig(width=W, height=H, impl="pallas", mode=args.mode,
                      footprint=args.fp, sorted_pair_k=args.pair_k)
    gcot = jax.random.uniform(ks[5], (H, W, 3), jnp.float32)

    def one(gg, cot):
        def f(p):
            rfn = render_sorted if args.mode == "sorted" else render_accum
            img, alpha, depth = rfn(p, view, proj, rc)
            return jnp.sum(img * cot)
        gr = jax.grad(f)(gg)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b), gr, jnp.float32(0.0))

    def multi(gg, cot, k):
        def body(i, acc):
            # acc-dependent perturbation (numerically 0) keeps EVERY stage
            # — including the binner, which only sees stop_gradient'd
            # positions — loop-variant, so XLA cannot hoist it out of the
            # while loop and the trace reflects real per-step cost.
            gg2 = jax.tree_util.tree_map(lambda x: x + acc * 0.0, gg)
            return acc + one(gg2, cot)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    jf = jax.jit(multi, static_argnums=2)
    if args.hlo:
        text = jf.lower(g, gcot, args.steps).compile().as_text()
        Path(args.hlo).write_text(text)
        print(f"wrote {len(text)} chars to {args.hlo}")
    float(jf(g, gcot, args.steps))  # warm

    logdir = tempfile.mkdtemp(prefix="tpugs_trsorted_")
    jax.profiler.start_trace(logdir)
    float(jf(g, gcot, args.steps))
    jax.profiler.stop_trace()

    from tpu_gaussians.utils.profiling import load_trace_events
    events = load_trace_events(logdir)
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        name = e.get("name", "")
        dur = e.get("dur", 0)
        agg[name] += dur
        cnt[name] += 1
        total += dur
    if not agg:
        print("no device events found")
        return

    st = args.steps
    print(f"{args.mode} {args.fp} fwd+bwd n={N} {W}x{H}: "
          f"total device {total/1e3:.2f} ms / {st} steps "
          f"= {total/st/1e3:.3f} ms/step")
    print(f"\n{'op':64s} {'count':>6s} {'ms/step':>8s}")
    for name, dur in agg.most_common(args.top):
        print(f"{name[:64]:64s} {cnt[name]:6d} {dur/st/1e3:8.3f}")


if __name__ == "__main__":
    main()
