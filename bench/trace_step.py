"""Profiler-trace breakdown of the flagship bench step (VERDICT r2 #2).

Runs the bench.py train step (1200 SH gaussians, 256x256) chained
on-device and captures a jax.profiler trace, then aggregates device-side
op durations by HLO op name so the ~40% non-kernel "rest" of the step is
itemized fusion by fusion instead of guessed at.

Usage: python bench/trace_step.py [--steps 200] [--size 256] [--n 1200]
Prints: per-op total device time, sorted; the top-level split
(pallas kernels vs everything else) and per-step costs.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def load_trace_events(logdir: str):
    """Find the trace.json.gz under logdir and yield complete events."""
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n", type=int, default=1200)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import RenderConfig
    from tpu_gaussians.fit.loss import LossConfig
    from tpu_gaussians.fit.step import init_state, make_optimizer, make_train_step
    from tpu_gaussians.models.gaussian_model import init_params

    SIZE, N = args.size, args.n
    raw = init_params(jax.random.PRNGKey(0), N, N, use_sh=True)
    cams = cam.orbit_cameras(1, SIZE, SIZE)
    targets = jax.random.uniform(jax.random.PRNGKey(1),
                                 (1, SIZE, SIZE, 3), jnp.float32)
    zeros = jnp.zeros((1, SIZE, SIZE), jnp.float32)
    rc = RenderConfig(width=SIZE, height=SIZE, impl="auto", return_aux=True)
    lc = LossConfig(silhouette_weight=0.0, depth_weight=0.0)
    tx = make_optimizer(0.02)
    inner = make_train_step(tx, rc, lc, False, False, jit=False)

    def multi(state, cams, targets, masks, depths, k):
        def body(i, carry):
            s, _ = carry
            s2, m = inner(s, cams, targets, masks, depths)
            return (s2, m["loss"])
        return jax.lax.fori_loop(0, k, body, (state, jnp.float32(0.0)))

    jf = jax.jit(multi)
    st = init_state(raw, tx)
    _, loss = jf(st, cams, targets, zeros, zeros, args.steps)
    float(loss)  # warm

    logdir = tempfile.mkdtemp(prefix="tpugs_trace_")
    jax.profiler.start_trace(logdir)
    _, loss = jf(st, cams, targets, zeros, zeros, args.steps)
    float(loss)
    jax.profiler.stop_trace()

    events = load_trace_events(logdir)
    # Device-side complete events: pid/tid tracks whose name mentions TPU
    # device lanes; fall back to all 'X' events with args containing HLO.
    pid_names = {e["pid"]: e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()}
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0)  # microseconds
        agg[name] += dur
        cnt[name] += 1
        total += dur
    if not agg:
        print("no device events found; pids seen:", pid_names)
        return

    print(f"total device time: {total/1e3:.2f} ms over {args.steps} steps "
          f"({total/args.steps:.1f} us/step)")
    kern = sum(d for n, d in agg.items()
               if "splat" in n or "sorted" in n or "binned" in n
               or "custom-call" in n)
    print(f"pallas-kernel share (name heuristic): {kern/1e3:.2f} ms "
          f"({100*kern/max(total,1e-9):.1f}%)")
    print(f"\n{'op':60s} {'count':>7s} {'total ms':>9s} {'us/step':>8s}")
    for name, dur in agg.most_common(args.top):
        print(f"{name[:60]:60s} {cnt[name]:7d} {dur/1e3:9.2f} "
              f"{dur/args.steps:8.2f}")


if __name__ == "__main__":
    main()
