"""Dump the optimized HLO of the flagship bench step to a file, so the
per-op device timings from bench/trace_step.py can be mapped back to
source ops (fusion.NNN names match the compiled module).

Usage: python bench/dump_step_hlo.py [--out /tmp/step_hlo.txt]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/step_hlo.txt")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n", type=int, default=1200)
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

    compiled = jax.jit(multi).lower(
        init_state(raw, tx), cams, targets, zeros, zeros, 200).compile()
    text = compiled.as_text()
    Path(args.out).write_text(text)
    print(f"wrote {len(text)} chars to {args.out}")


if __name__ == "__main__":
    main()
