"""Offline renderer CLI: load a fitted npz and render views to PNG.

The TPU-side counterpart of the reference's forward-only native render
path (gaussian_renderer.render_gaussians, bindings.cpp:30-100): renders a
fitted model from orbit or npz cameras in either compositing mode.

Usage:
  python -m tpu_gaussians.cli.render fitted.npz --out_dir renders \
      --width 960 --height 540 --mode sorted --num_views 8
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("npz", help="Fitted gaussians npz (reference schema)")
    ap.add_argument("--out_dir", default="outputs/renders")
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--fovy", type=float, default=60.0)
    ap.add_argument("--num_views", type=int, default=1)
    ap.add_argument("--camera_npz", default="",
                    help="Optional view/proj cameras; else orbit rig")
    ap.add_argument("--mode", choices=["accum", "sorted"], default="sorted",
                    help="sorted = depth-aware front-to-back "
                         "(viewer default, model_viewer_main.cpp:199)")
    ap.add_argument("--impl", choices=["auto", "jnp", "pallas"], default="auto")
    ap.add_argument("--background", type=float, nargs=3,
                    default=[0.02, 0.02, 0.02])
    ap.add_argument("--shard_bands", type=int, default=0,
                    help="Shard each frame's rows over this many devices "
                         "(0 = single-device render)")
    return ap


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from tpu_gaussians.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import RenderConfig
    from tpu_gaussians.io.image import save_image_png
    from tpu_gaussians.io.npz import load_gaussians_npz
    from tpu_gaussians.ops.dispatch import render

    g = load_gaussians_npz(args.npz)
    print(f"Loaded {g.means.shape[0]} gaussians from {args.npz}")

    if args.camera_npz:
        cameras = cam.load_cameras_npz(args.camera_npz)
    else:
        cameras = cam.orbit_cameras(
            args.num_views, args.width, args.height, fovy_deg=args.fovy
        )

    config = RenderConfig(
        width=args.width, height=args.height, mode=args.mode, impl=args.impl,
        background=tuple(args.background),
    )
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    import jax

    from tpu_gaussians.core.types import Camera

    if args.shard_bands > 0:
        from tpu_gaussians.parallel.tiled import render_tiled

        views = cameras.view if cameras.batched else cameras.view[None]
        projs = cameras.proj if cameras.batched else cameras.proj[None]
        images = np.stack([
            np.asarray(render_tiled(
                g, Camera(view=views[i], proj=projs[i]), config,
                n_devices=args.shard_bands))
            for i in range(views.shape[0])
        ])
    else:
        # jit: eager per-op dispatch is very slow on remote-compile runtimes.
        images = jax.jit(
            lambda gg, view, proj: render(gg, Camera(view=view, proj=proj),
                                          config)
        )(g, cameras.view, cameras.proj)
    if images.ndim == 3:
        images = images[None]
    for i in range(images.shape[0]):
        path = out_dir / f"view_{i:03d}.png"
        save_image_png(path, np.asarray(images[i]))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
