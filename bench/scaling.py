"""Scaling-efficiency harness (BASELINE config #5 analog).

Measures the sharded fit step's throughput at 1, 2, ..., D devices on the
current platform (real multi-chip mesh when available; a virtual CPU mesh
via --virtual N elsewhere — latency numbers on the virtual mesh are
demonstrative only). Weak scaling: each device gets the same per-device
view load, so ideal scaling keeps per-step time flat while total
pixels/s grows linearly. Prints one JSON line per mesh size plus a final
efficiency summary.

Usage:
  python bench/scaling.py [--virtual 8] [--size 256] [--n 10000]
        [--views_per_device 2] [--impl auto|jnp|pallas]
        [--variant gspmd|shardmap|overlap] [--overlap_chunks 4]

--variant selects the distribution mechanism:
  gspmd     jit + NamedSharding inputs (XLA derives the all-reduce)
  shardmap  explicit shard_map + one trailing pmean (barrier allreduce)
  overlap   shard_map + per-view-chunk pmeans the scheduler can overlap
            with the remaining backward work (VERDICT r1 item #2;
            compare step time vs --variant shardmap)
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
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (testing without a pod)")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--views_per_device", type=int, default=2)
    ap.add_argument("--k", type=int, default=10, help="steps per timing scan")
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "jnp", "pallas"])
    ap.add_argument("--variant", default="gspmd",
                    choices=["gspmd", "shardmap", "overlap"])
    ap.add_argument("--overlap_chunks", type=int, default=4)
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host pod run: jax.distributed bring-up "
                         "(coordinator from the standard env vars; loud "
                         "bounded-timeout failure) and a GLOBAL device "
                         "mesh — see bench/pod_scaling.sh")
    args = ap.parse_args()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.virtual)
    if args.distributed:
        from tpu_gaussians.parallel.mesh import initialize_distributed

        initialize_distributed()
        print(json.dumps({
            "process": jax.process_index(),
            "processes": jax.process_count(),
            "local_devices": len(jax.local_devices()),
            "global_devices": len(jax.devices())}), flush=True)

    from tpu_gaussians.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import RenderConfig
    from tpu_gaussians.fit.loss import LossConfig
    from tpu_gaussians.fit.step import init_state, make_optimizer, make_train_step
    from tpu_gaussians.models.gaussian_model import init_params
    from tpu_gaussians.parallel.mesh import make_mesh, replicated, view_sharding

    from tpu_gaussians.parallel.sharded import (
        make_overlapped_train_step,
        make_shardmap_train_step,
    )

    devices = jax.devices()
    size = args.size
    raw = init_params(jax.random.PRNGKey(0), args.n, args.n, use_sh=True)
    rc = RenderConfig(width=size, height=size, impl=args.impl,
                      return_aux=True)
    lc = LossConfig(silhouette_weight=0.0, depth_weight=0.0)
    tx = make_optimizer(0.02)

    inner = make_train_step(tx, rc, lc, False, False, jit=False)

    def multi(state, cams, targets, masks, depths):
        def body(s, _):
            s2, m = inner(s, cams, targets, masks, depths)
            return s2, m["loss"]
        return jax.lax.scan(body, state, None, length=args.k)

    jf = jax.jit(multi)

    def measure(n_dev: int) -> float:
        v = args.views_per_device * n_dev
        cams = cam.orbit_cameras(v, size, size)
        targets = jax.random.uniform(jax.random.PRNGKey(1),
                                     (v, size, size, 3), jnp.float32)
        zeros = jnp.zeros((v, size, size), jnp.float32)
        st = init_state(raw, tx)
        mesh = make_mesh(n_dev, 1, devices=devices[:n_dev])

        if args.variant != "gspmd" and n_dev > 1:
            # Explicit-collective step fns (single jitted step; timed by
            # looping k times — dispatch overhead is identical across
            # variants, so the overlap-vs-barrier delta is clean).
            make = (make_overlapped_train_step
                    if args.variant == "overlap"
                    else make_shardmap_train_step)
            kw = ({"n_chunks": args.overlap_chunks}
                  if args.variant == "overlap" else {})
            stepf = make(tx, rc, lc, False, False, mesh, **kw)

            def run():
                s = st
                for _ in range(args.k):
                    s, m = stepf(s, cams, targets, zeros, zeros)
                return m["loss"]
        else:
            if n_dev > 1:
                # GSPMD follows the input shardings: state replicated,
                # views sharded -> gradient all-reduce over views.
                cams = cam.Camera(
                    view=jax.device_put(cams.view, view_sharding(mesh, 3)),
                    proj=jax.device_put(cams.proj, view_sharding(mesh, 3)),
                )
                targets = jax.device_put(targets, view_sharding(mesh, 4))
                zeros = jax.device_put(zeros, view_sharding(mesh, 3))
                st = jax.device_put(st, replicated(mesh))

            def run():
                _, losses = jf(st, cams, targets, zeros, zeros)
                return losses[-1]

        float(run())
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(run())
            best = min(best, time.perf_counter() - t0)
        return best / args.k

    sizes = []
    d = 1
    while d <= len(devices):
        sizes.append(d)
        d *= 2
    results = {}
    for n_dev in sizes:
        t = measure(n_dev)
        pix = args.views_per_device * n_dev * size * size / t
        results[n_dev] = pix
        print(json.dumps({"devices": n_dev, "impl": args.impl,
                          "variant": args.variant,
                          "s_per_step": round(t, 5),
                          "pixels_per_s": round(pix, 1)}), flush=True)

    if len(sizes) > 1:
        eff = results[sizes[-1]] / (results[1] * sizes[-1])
        is_pod = args.distributed or (
            jax.default_backend() == "tpu" and len(devices) > 1)
        print(json.dumps({"metric": "scaling_efficiency",
                          "devices": sizes[-1],
                          "value": round(eff, 3),
                          # The falsifiable docs/ICI_MODEL.md predictions
                          # printed next to the slot this measurement
                          # fills (r4 VERDICT #8): only a real multi-chip
                          # TPU mesh tests them — the virtual CPU mesh
                          # measures host contention, not ICI.
                          "ici_model_prediction": (
                              ">=0.99 weak-scaling at 8-64 chips; "
                              ">=0.96 anywhere on a v5e pod"),
                          "prediction_tested": bool(is_pod),
                          "gate": "config #5 requires >= 0.8"}),
              flush=True)


if __name__ == "__main__":
    main()
