"""Benchmark: pixels/s/chip for a fused forward+backward render step.

Driver metric (BASELINE.json:2): pixels/s/chip fwd+bwd at 256x256 on the
flagship config (#2: 1200 Gaussians, SH, orbit camera). Prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the self-measured reference implementation
throughput (bench/baseline_measurement.json, produced by
bench/measure_torch_baseline.py — the reference publishes no numbers,
BASELINE.md). Falls back to 0.0 when the measurement file is absent.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

SIZE = 256
N = 1200
STEPS = 20


def main():
    import jax
    import jax.numpy as jnp
    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import RenderConfig
    from tpu_gaussians.fit.loss import LossConfig, loss_fn
    from tpu_gaussians.models.gaussian_model import init_params

    raw = init_params(jax.random.PRNGKey(0), N, N, use_sh=True)
    cams = cam.orbit_cameras(1, SIZE, SIZE)
    key = jax.random.PRNGKey(1)
    targets = jax.random.uniform(key, (1, SIZE, SIZE, 3), jnp.float32)

    rc = RenderConfig(width=SIZE, height=SIZE, impl="auto", return_aux=True)
    lc = LossConfig(silhouette_weight=0.0, depth_weight=0.0)

    # NOTE: cameras/targets must be ARGUMENTS, not closure captures — jit
    # constants baked from device arrays hit a severe slow path on the
    # axon TPU relay (measured: >100x per-call overhead).
    def fwd_bwd(raw, cams, targets):
        def f(tr):
            return loss_fn(raw.with_trainable(tr), cams, targets, None, None,
                           rc, lc)
        (loss, _), grads = jax.value_and_grad(f, has_aux=True)(raw.trainable())
        return loss, grads

    step = jax.jit(fwd_bwd)
    loss, grads = step(raw, cams, targets)  # compile + warmup
    jax.block_until_ready(grads)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        loss, grads = step(raw, cams, targets)
    jax.block_until_ready(grads)
    dt = (time.perf_counter() - t0) / STEPS

    pixels_per_s = SIZE * SIZE / dt

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
