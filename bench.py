"""Benchmark: pixels/s/chip for the fused forward+backward fit step.

Driver metric (BASELINE.json:2): pixels/s/chip fwd+bwd at 256x256 on the
flagship config (#2: 1200 Gaussians, SH, orbit camera). Prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

Measurement method: the full train step (render + loss + backward + Adam)
is chained on device via lax.scan inside a single jit; per-step cost is
the marginal time between a K1-step and a K2-step scan, which excludes
host<->device round-trip latency (the deployment-shaped number — training
loops keep steps on device).

vs_baseline divides by the self-measured reference-renderer throughput
(bench/baseline_measurement.json, from bench/measure_torch_baseline.py —
the reference publishes no numbers, BASELINE.md).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

SIZE = 256
N = 1200
K1, K2 = 8, 40


def main():
    import jax
    import jax.numpy as jnp

    from tpu_gaussians.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import RenderConfig
    from tpu_gaussians.fit.loss import LossConfig
    from tpu_gaussians.fit.step import init_state, make_optimizer, make_train_step
    from tpu_gaussians.models.gaussian_model import init_params

    raw = init_params(jax.random.PRNGKey(0), N, N, use_sh=True)
    cams = cam.orbit_cameras(1, SIZE, SIZE)
    targets = jax.random.uniform(jax.random.PRNGKey(1), (1, SIZE, SIZE, 3),
                                 jnp.float32)
    zeros = jnp.zeros((1, SIZE, SIZE), jnp.float32)

    rc = RenderConfig(width=SIZE, height=SIZE, impl="auto", return_aux=True)
    lc = LossConfig(silhouette_weight=0.0, depth_weight=0.0)
    tx = make_optimizer(0.02)
    inner = make_train_step(tx, rc, lc, False, False, jit=False)

    # Dynamic trip count -> ONE compiled executable serves every K
    # (remote compiles are minutes-slow; this halves bench startup).
    def multi(state, cams, targets, masks, depths, k):
        def body(i, carry):
            s, _ = carry
            s2, m = inner(s, cams, targets, masks, depths)
            return (s2, m["loss"])
        return jax.lax.fori_loop(0, k, body,
                                 (state, jnp.float32(0.0)))

    jf = jax.jit(multi)

    def timed(k, reps=2):
        st = init_state(raw, tx)
        _, loss = jf(st, cams, targets, zeros, zeros, k)
        float(loss)  # warm + sync
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _, loss = jf(st, cams, targets, zeros, zeros, k)
            float(loss)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(K1)
    t2 = timed(K2)
    per_step = max((t2 - t1) / (K2 - K1), 1e-9)
    pixels_per_s = SIZE * SIZE / per_step

    baseline_file = Path(__file__).parent / "bench" / "baseline_measurement.json"
    vs = 0.0
    if baseline_file.exists():
        base = json.loads(baseline_file.read_text())
        vs = pixels_per_s / base["pixels_per_s"]

    print(json.dumps({
        "metric": "pixels_per_s_per_chip_fwd_bwd_256x256_1200sh",
        "value": round(pixels_per_s, 1),
        "unit": "pixels/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
