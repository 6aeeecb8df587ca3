"""SEP_ROWS experiment: fill the MXU's 128 rows in the band kernels.

The separable band kernels' G matrix has FEAT_PAD*SEP_ROWS = 64 rows at
SEP_ROWS=8 — half the MXU systolic height, a hard 50% utilization
ceiling on the flagship step's dominant matmuls (trace_step.py r3: the
fwd+bwd band kernels are 281 of 335 us/step). SEP_ROWS=16 gives 128
rows at the cost of coarser y-band culling. This measures the flagship
step marginal and checks pallas-vs-jnp parity for both settings.

Usage: python bench/proto_seprows.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

SIZE, N = 256, 1200
K1, K2 = 16, 216


def build_step():
    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import RenderConfig
    from tpu_gaussians.fit.loss import LossConfig
    from tpu_gaussians.fit.step import init_state, make_optimizer, make_train_step
    from tpu_gaussians.models.gaussian_model import init_params

    raw = init_params(jax.random.PRNGKey(0), N, N, use_sh=True)
    cams = cam.orbit_cameras(1, SIZE, SIZE)
    targets = jax.random.uniform(jax.random.PRNGKey(1),
                                 (1, SIZE, SIZE, 3), jnp.float32)
    zeros = jnp.zeros((1, SIZE, SIZE), jnp.float32)
    rc = RenderConfig(width=SIZE, height=SIZE, impl="auto", return_aux=True)
    lc = LossConfig(silhouette_weight=0.0, depth_weight=0.0)
    tx = make_optimizer(0.02)
    inner = make_train_step(tx, rc, lc, False, False, jit=False)

    def multi(state, k):
        def body(i, carry):
            s, _ = carry
            s2, m = inner(s, cams, targets, zeros, zeros)
            return (s2, m["loss"])
        return jax.lax.fori_loop(0, k, body, (state, jnp.float32(0.0)))

    return jax.jit(multi), init_state(raw, tx)


def measure(jf, st):
    def timed(k):
        t0 = time.perf_counter()
        _, loss = jf(st, k)
        float(loss)
        return time.perf_counter() - t0
    for k in (K1, K2):
        timed(k)
    ms = []
    for _ in range(5):
        t1 = min(timed(K1) for _ in range(2))
        t2 = min(timed(K2) for _ in range(2))
        ms.append((t2 - t1) / (K2 - K1))
    ms.sort()
    return ms[len(ms) // 2]


def parity():
    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import RenderConfig
    from tpu_gaussians.ops.dispatch import render
    sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))
    from tests.utils import random_scene

    g = random_scene(300, seed=0)
    c = cam.orbit_cameras(1, SIZE, SIZE)[0]
    ip = RenderConfig(width=SIZE, height=SIZE, impl="pallas",
                      return_aux=True)
    ij = ip.replace(impl="jnp", chunk_size=64)
    outs_p = jax.jit(lambda gg: render(gg, c, ip))(g)
    outs_j = jax.jit(lambda gg: render(gg, c, ij))(g)
    return max(float(jnp.max(jnp.abs(a - b)))
               for a, b in zip(outs_p, outs_j))


def main():
    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from tpu_gaussians.ops.pallas import splat as sp

    for rows in (8, 16):
        import os
        os.environ['TPUGS_SEP_ROWS'] = str(rows)  # r4: rows is per-call now
        jf, st = build_step()
        t = measure(jf, st)
        d = parity()
        print(f"SEP_ROWS={rows:2d}: {t*1e3:7.3f} ms/step "
              f"({SIZE*SIZE/t/1e6:6.1f} Mpix/s)  pallas-vs-jnp maxdiff {d:.2e}")


if __name__ == "__main__":
    main()
