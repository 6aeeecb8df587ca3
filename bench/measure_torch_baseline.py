"""One-time measurement of the reference renderer's fwd+bwd throughput.

Runs the reference torch_renderer (imported from /root/reference when
present) on the BASELINE config #2 workload (1200 SH Gaussians, 256x256)
and records pixels/s for a forward+backward step into
bench/baseline_measurement.json. The reference publishes no numbers
(BASELINE.md), so this self-measured figure is the `vs_baseline`
denominator used by bench.py.

Usage: python bench/measure_torch_baseline.py [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REFERENCE_PY = Path("/root/reference/python")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--n", type=int, default=1200)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    if not REFERENCE_PY.exists():
        print("reference not available; skipping", file=sys.stderr)
        return

    sys.path.insert(0, str(REFERENCE_PY))
    import torch
    from torch_renderer import Camera, look_at, perspective, render_gaussians_torch

    torch.manual_seed(0)
    n, size = args.n, args.size
    device = torch.device("cpu")

    means = torch.nn.Parameter((torch.rand((n, 3)) - 0.5) * 1.2)
    scales_raw = torch.nn.Parameter(torch.full((n, 3), -2.2))
    op_raw = torch.nn.Parameter(torch.full((n,), -2.2))
    sh_raw = torch.nn.Parameter(torch.zeros((n, 4, 3)))
    with torch.no_grad():
        sh_raw[:, 0, :] = 0.1 * torch.rand((n, 3))

    cam = Camera(
        view=look_at(torch.tensor([0.0, 0.5, 2.5]), torch.zeros(3),
                     torch.tensor([0.0, 1.0, 0.0])),
        proj=perspective(60.0, 1.0, 0.01, 100.0),
    )
    target = torch.rand((size, size, 3))

    def step():
        scales = torch.nn.functional.softplus(scales_raw) + 1e-3
        opacities = torch.sigmoid(op_raw)
        pred = render_gaussians_torch(
            means, scales, sh_raw, opacities, cam, width=size, height=size,
            max_gaussians=max(10000, n),
        )
        loss = torch.mean(torch.abs(pred - target))
        loss.backward()
        for p in (means, scales_raw, op_raw, sh_raw):
            p.grad = None
        return loss

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = (time.perf_counter() - t0) / args.iters

    pixels_per_s = size * size / dt
    out = {
        "workload": f"{n} SH gaussians, {size}x{size}, fwd+bwd L1, torch CPU",
        "seconds_per_step": dt,
        "pixels_per_s": pixels_per_s,
        "torch_version": torch.__version__,
    }
    path = Path(__file__).parent / "baseline_measurement.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
