"""Evaluation CLI: render a fitted model against target views and report
PSNR / SSIM / L1 per view (extension — the reference has no eval tooling;
its only quality signal is the loss.txt artifact, fit_multiview_stub.py:355).

Usage:
  python -m tpu_gaussians.cli.eval fitted.npz --targets_dir views/ \
      [--camera_npz cams.npz] [--width 128 --height 128] [--out eval.json]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("npz", help="Fitted gaussians npz (or .ply)")
    ap.add_argument("--targets_dir", required=True,
                    help="Directory of ground-truth views (PNG/JPG)")
    ap.add_argument("--camera_npz", default="",
                    help="Cameras (view/proj); else the orbit rig")
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--fovy", type=float, default=60.0)
    ap.add_argument("--mode", choices=["accum", "sorted"], default="accum")
    ap.add_argument("--footprint", choices=["auto", "axis", "ewa"],
                    default="auto",
                    help="auto: ewa when the model carries quaternions "
                         "(an EWA-trained model evaluated under the axis "
                         "footprint silently drops its rotations)")
    ap.add_argument("--impl", choices=["auto", "jnp", "pallas"],
                    default="auto")
    ap.add_argument("--out", default="",
                    help="Optional JSON report path")
    return ap


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from tpu_gaussians.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import RenderConfig
    from tpu_gaussians.fit.loss import ssim as ssim_fn
    from tpu_gaussians.io import image as im

    if args.npz.endswith(".ply"):
        from tpu_gaussians.io.ply import load_gaussians_ply as load
    else:
        from tpu_gaussians.io.npz import load_gaussians_npz as load
    g = load(args.npz)

    paths = im.list_target_paths(args.targets_dir)
    targets = np.asarray(im.load_targets(paths, args.width, args.height))
    v = targets.shape[0]

    if args.camera_npz:
        cameras = cam.load_cameras_npz(args.camera_npz)
        if cameras.view.shape[0] != v:
            raise ValueError(
                f"camera count {cameras.view.shape[0]} != targets {v}")
    else:
        cameras = cam.orbit_cameras(v, args.width, args.height,
                                    fovy_deg=args.fovy)

    fp = args.footprint
    if fp == "auto":
        fp = "ewa" if g.quats is not None else "axis"
    config = RenderConfig(width=args.width, height=args.height,
                          mode=args.mode, impl=args.impl, footprint=fp)

    from tpu_gaussians.ops.dispatch import render
    from tpu_gaussians.core.types import Camera

    def metrics(gg, view, proj, tgt):
        out = render(gg, Camera(view=view, proj=proj), config)
        pred = out[0] if isinstance(out, tuple) else out
        if pred.ndim == 3:
            pred = pred[None]
        l1 = jnp.mean(jnp.abs(pred - tgt), axis=(1, 2, 3))
        mse = jnp.mean((pred - tgt) ** 2, axis=(1, 2, 3))
        psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
        return l1, psnr, ssim_fn(pred, tgt)

    l1, psnr, ssim = jax.jit(metrics)(
        g, cameras.view, cameras.proj, jnp.asarray(targets))
    l1, psnr, ssim = np.asarray(l1), np.asarray(psnr), np.asarray(ssim)

    report = {
        "views": [
            {"index": i, "target": str(paths[i]), "psnr": float(psnr[i]),
             "ssim": float(ssim[i]), "l1": float(l1[i])}
            for i in range(v)
        ],
        "mean": {"psnr": float(psnr.mean()), "ssim": float(ssim.mean()),
                 "l1": float(l1.mean())},
        "num_gaussians": int(g.means.shape[0]),
        "mode": args.mode,
        "footprint": fp,
        "size": [args.width, args.height],
    }
    for row in report["views"]:
        print(f"view {row['index']:3d}  PSNR {row['psnr']:6.2f} dB  "
              f"SSIM {row['ssim']:.4f}  L1 {row['l1']:.5f}")
    print(f"mean      PSNR {report['mean']['psnr']:6.2f} dB  "
          f"SSIM {report['mean']['ssim']:.4f}  L1 {report['mean']['l1']:.5f}")

    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(report, indent=2))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
