"""At-scale render fwd+bwd timings (the BASELINE.md 100k-gaussian rows).

Measures the marginal device time of a full differentiable render
(prepare + binner + kernel + resolve + backward to raw param cotangents)
for the sorted and accum modes at large N — the training-step shape
minus loss/optimizer, matching how BASELINE.md's at-scale numbers were
taken.

Usage: python bench/at_scale.py --n 100000 --sizes 512,1024 [--fp axis]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def marginal(fn, args, k1=2, k2=8, reps=2):
    def multi(k, *a):
        def body(i, acc):
            out = fn(*jax.tree.map(
                lambda x: x + 0.0 * acc
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a))
            # Consume ONE element of EVERY output leaf: consuming only
            # leaves[0] (the loss) lets XLA dead-code the entire
            # backward out of a value_and_grad step and silently turns
            # a "fwd+bwd" row into a forward-only row.
            return sum((jnp.float32(leaf.reshape(-1)[0])
                        for leaf in jax.tree.leaves(out)
                        if jnp.issubdtype(leaf.dtype, jnp.floating)),
                       jnp.float32(0.0))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
    jf = jax.jit(multi, static_argnums=0)

    def timed(k):
        float(jf(k, *args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jf(k, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(k1), timed(k2)
    return max((t2 - t1) / (k2 - k1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--sizes", type=str, default="512,1024")
    ap.add_argument("--fp", type=str, default="axis",
                    choices=["axis", "ewa"])
    ap.add_argument("--modes", type=str, default="sorted,accum")
    ap.add_argument("--binned", type=str, default="auto",
                    choices=["auto", "on", "off"],
                    help="force the accum path's binned/dense selection "
                         "(crossover measurement)")
    ap.add_argument("--cull", type=str, default="exact",
                    choices=["exact", "alpha"],
                    help="binned-accum extent cutoff (alpha = the "
                         "reference C++ w<1e-5 drop)")
    ap.add_argument("--cap", type=int, default=0,
                    help="binned-accum per-tile capacity (0 = auto)")
    ap.add_argument("--pair_k", type=int, default=0,
                    help="sorted-path per-gaussian tile budget "
                         "(0 = auto from PAIR_BUDGET)")
    args = ap.parse_args()

    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import Gaussians, RenderConfig
    from tpu_gaussians.ops.dispatch import render

    N = args.n
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    # EWA runs get genuinely rotated anisotropic footprints (random unit
    # quats + 3:1 scale anisotropy) — identity quats would make the conic
    # near-diagonal and flatter the measurement.
    quats = None
    scales = jax.random.uniform(ks[1], (N, 3), jnp.float32, 0.005, 0.03)
    if args.fp == "ewa":
        quats = jax.random.normal(ks[4], (N, 4), jnp.float32)
        quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
        scales = scales * jnp.array([3.0, 1.0, 1.0], jnp.float32)
    g = Gaussians(
        means=jax.random.uniform(ks[0], (N, 3), jnp.float32, -1.0, 1.0),
        scales=scales,
        colors=jax.random.uniform(ks[2], (N, 3), jnp.float32),
        opacities=jax.random.uniform(ks[3], (N,), jnp.float32, 0.2, 0.9),
        quats=quats,
    )

    for size in [int(x) for x in args.sizes.split(",")]:
        c = cam.orbit_cameras(1, size, size)
        cam1 = jax.tree.map(lambda x: x[0] if x.ndim > 2 else x, c)
        tgt = jax.random.uniform(jax.random.PRNGKey(9),
                                 (size, size, 3), jnp.float32)

        for mode in args.modes.split(","):
            rc = RenderConfig(width=size, height=size, impl="pallas",
                              mode=mode, footprint=args.fp,
                              accum_binned=args.binned,
                              accum_cull=args.cull,
                              sorted_pair_k=args.pair_k,
                              accum_tile_capacity=args.cap)

            def loss(gg):
                img = render(gg, cam1, rc)
                if isinstance(img, tuple):
                    img = img[0]
                return jnp.mean(jnp.abs(img - tgt))

            def step(gg):
                l, gr = jax.value_and_grad(loss)(gg)
                return l, gr

            t = marginal(step, (g,))
            tag = ("" if mode != "accum" or args.binned == "auto"
                   else f"/binned={args.binned}")
            if mode == "accum" and args.cull != "exact":
                tag += f"/cull={args.cull}"
            if mode == "accum" and args.cap:
                tag += f"/cap={args.cap}"
            if mode == "accum":
                from tpu_gaussians.ops.dispatch import render_accum
                _, _, _, stats = jax.jit(
                    lambda gg: render_accum(gg, cam1.view, cam1.proj, rc,
                                            return_stats=True))(g)
                tag += (f" [dropped={int(stats['dropped_pairs'])} "
                        f"full_tiles={int(stats['full_tiles'])}]")
            print(f"N={N} {size}x{size} {mode}/{args.fp}{tag}: "
                  f"fwd+bwd {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
