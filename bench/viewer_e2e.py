"""End-to-end interactive viewer throughput (VERDICT r2 #6).

Measures what the split-viewer design actually delivers to a client:
sustained frames/s through cli/serve.py over HTTP, replicating
viewer_client.html's one-in-flight request policy (the next frame is
requested only after the previous response arrives), with the
render/encode/transport split taken from the server's X-Render-Ms /
X-Encode-Ms headers. The reference's comparable product number is the
live FPS HUD of its native viewer (model_viewer_main.cpp:243-261).

Workload mirrors the reference viewer defaults: 960x540, sorted
(depth-ordered) mode, orbiting camera, scenes at 100k and 1M gaussians
(the reference's --max cap, model_viewer_main.cpp:157).

Usage: python bench/viewer_e2e.py [--ns 100000,1000000]
       [--formats jpg,raw] [--frames 60] [--port 8311]
Prints one table row per (scene, format) and a JSON summary line.
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import signal
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

W, H = 960, 540


def make_scene(n: int, path: str):
    import numpy as np

    from tpu_gaussians.core.types import make_gaussians
    from tpu_gaussians.io.npz import save_gaussians_npz

    rng = np.random.default_rng(0)
    g = make_gaussians(
        rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32),
        rng.uniform(0.005, 0.03, (n, 3)).astype(np.float32),
        rng.uniform(0.2, 0.9, (n,)).astype(np.float32),
        colors=rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32),
    )
    save_gaussians_npz(path, g)


def wait_ready(port: int, timeout_s: float = 900.0) -> dict:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
            conn.request("GET", "/info")
            r = conn.getresponse()
            info = json.loads(r.read())
            conn.close()
            return info
        except (ConnectionRefusedError, OSError):
            time.sleep(1.0)
    raise TimeoutError("server never came up")


def drive(port: int, fmt: str, frames: int, warmup: int):
    """One-in-flight orbit sweep; returns dict of measured splits."""
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    render_ms, encode_ms, total_ms, bytes_rx = [], [], [], []
    for i in range(warmup + frames):
        yaw = 0.05 * i
        path = (f"/render?yaw={yaw:.4f}&pitch=0.2&radius=2.5"
                f"&width={W}&height={H}&mode=sorted&format={fmt}")
        t0 = time.perf_counter()
        conn.request("GET", path)
        r = conn.getresponse()
        body = r.read()
        dt = (time.perf_counter() - t0) * 1e3
        if r.status != 200:
            raise RuntimeError(f"HTTP {r.status}: {body[:200]!r}")
        if i < warmup:
            continue
        total_ms.append(dt)
        render_ms.append(float(r.getheader("X-Render-Ms", "0")))
        encode_ms.append(float(r.getheader("X-Encode-Ms", "0")))
        bytes_rx.append(len(body))
    conn.close()

    def med(xs):
        s = sorted(xs)
        return s[len(s) // 2]

    return {
        "fps": 1e3 / med(total_ms),
        "total_ms": med(total_ms),
        "render_ms": med(render_ms),
        "encode_ms": med(encode_ms),
        "transport_ms": med(total_ms) - med(render_ms) - med(encode_ms),
        "kb_per_frame": med(bytes_rx) / 1024.0,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="100000,1000000")
    ap.add_argument("--formats", default="jpg,raw")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--port", type=int, default=8311)
    args = ap.parse_args()

    results = {}
    for n in [int(x) for x in args.ns.split(",")]:
        with tempfile.TemporaryDirectory() as td:
            npz = os.path.join(td, f"scene_{n}.npz")
            make_scene(n, npz)
            proc = subprocess.Popen(
                [sys.executable, "-m", "tpu_gaussians.cli.serve", npz,
                 "--port", str(args.port)],
                cwd=str(Path(__file__).parent.parent),
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                start_new_session=True,
            )
            try:
                info = wait_ready(args.port)
                assert info["num_gaussians"] == n
                for fmt in args.formats.split(","):
                    r = drive(args.port, fmt, args.frames, args.warmup)
                    results[f"{n}_{fmt}"] = r
                    print(f"N={n:>8d} {fmt:>4s}: {r['fps']:6.1f} FPS  "
                          f"(render {r['render_ms']:6.1f} + encode "
                          f"{r['encode_ms']:5.1f} + transport "
                          f"{r['transport_ms']:5.1f} ms; "
                          f"{r['kb_per_frame']:7.0f} KB/frame)")
            finally:
                # Kill exactly the process group we started.
                os.killpg(proc.pid, signal.SIGTERM)
                try:
                    proc.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    os.killpg(proc.pid, signal.SIGKILL)
    print(json.dumps({"viewer_e2e_960x540_sorted": {
        k: {kk: round(vv, 2) for kk, vv in v.items()}
        for k, v in results.items()}}))


if __name__ == "__main__":
    main()
