"""End-to-end COLMAP-dataset run (VERDICT r1 item #9).

No dataset ships with the reference, so this script synthesizes one the
way a real capture pipeline would produce it, then exercises the full
user workflow at dataset scale:

  1. Ground truth: a procedural ~6k-gaussian scene ("banded planet with
     a tilted ring") rendered depth-sorted at 256x256 from V orbit
     views -> images/ PNGs. The renders are the "photos".
  2. A COLMAP sparse model (text format) with PINHOLE intrinsics, the
     same poses converted to COLMAP's world->cam convention, and a
     noisy subsample of the gaussian centers as points3D (the "SfM
     reconstruction").
  3. `cli.import_colmap`: model -> cameras.npz + init_points.npz.
  4. `cli.fit`: SfM-initialized fit at 256**2, sorted mode, SH,
     grad-ranked densify (the 3DGS-style recipe).
  5. `cli.eval`: PSNR / SSIM / L1 per view on held-in views.

Reference anchor: /root/reference/python/fit_multiview_stub.py is the
same workflow without the COLMAP/SfM stage (targets + orbit cameras ->
fit -> npz); BASELINE configs #3/#4.

Usage: python bench/e2e_colmap.py [--iters 600] [--size 256]
       [--views 12] [--out_dir outputs/e2e_colmap]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def _rotmat_to_qvec(R):
    """Shepperd's method, wxyz (same as tests/test_colmap.py)."""
    K = np.array([
        [R[0, 0] - R[1, 1] - R[2, 2], R[1, 0] + R[0, 1],
         R[2, 0] + R[0, 2], R[2, 1] - R[1, 2]],
        [R[1, 0] + R[0, 1], R[1, 1] - R[0, 0] - R[2, 2],
         R[2, 1] + R[1, 2], R[0, 2] - R[2, 0]],
        [R[2, 0] + R[0, 2], R[2, 1] + R[1, 2],
         R[2, 2] - R[0, 0] - R[1, 1], R[1, 0] - R[0, 1]],
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
         R[1, 0] - R[0, 1], R[0, 0] + R[1, 1] + R[2, 2]],
    ]) / 3.0
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    return q if q[0] >= 0 else -q


def make_gt_scene(rng: np.random.Generator, n_body=4096, n_ring=2048):
    """Procedural ground truth: color-banded sphere + tilted ring."""
    # Sphere surface points.
    u = rng.normal(size=(n_body, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True) + 1e-9
    body = 0.45 * u
    # Color bands by latitude + a continent-ish noise term.
    lat = u[:, 1]
    phase = np.sin(6.0 * np.arcsin(np.clip(lat, -1, 1)))
    noise = np.sin(7 * u[:, 0] + 3 * u[:, 2]) * np.cos(5 * u[:, 1])
    body_col = np.stack([
        0.55 + 0.35 * phase,
        0.45 + 0.25 * noise,
        0.65 - 0.35 * phase,
    ], axis=1)

    # Tilted ring (annulus) around the body.
    ang = rng.uniform(0, 2 * np.pi, size=n_ring)
    rad = rng.uniform(0.62, 0.85, size=n_ring)
    ring = np.stack([rad * np.cos(ang), 0.02 * rng.normal(size=n_ring),
                     rad * np.sin(ang)], axis=1)
    tilt = 0.35
    rot = np.array([[np.cos(tilt), -np.sin(tilt), 0],
                    [np.sin(tilt), np.cos(tilt), 0],
                    [0, 0, 1.0]])
    ring = ring @ rot.T
    ring_col = np.stack([
        0.75 + 0.15 * np.cos(3 * ang),
        0.65 + 0.10 * np.sin(5 * ang),
        0.45 + 0.0 * ang,
    ], axis=1)

    means = np.concatenate([body, ring]).astype(np.float32)
    colors = np.clip(np.concatenate([body_col, ring_col]), 0, 1)
    n = means.shape[0]
    scales = np.full((n, 3), 0.018, np.float32)
    scales[n_body:] *= 0.7
    opac = np.full((n,), 0.85, np.float32)
    return means, scales, colors.astype(np.float32), opac


def write_colmap_text(model_dir: Path, views: np.ndarray, fx: float,
                      fy: float, w: int, h: int, pts: np.ndarray,
                      rgb: np.ndarray):
    """Write cameras.txt / images.txt / points3D.txt for our poses."""
    model_dir.mkdir(parents=True, exist_ok=True)
    (model_dir / "cameras.txt").write_text(
        "# cameras\n"
        f"1 PINHOLE {w} {h} {fx} {fy} {w / 2.0} {h / 2.0}\n")
    flip = np.diag([1.0, -1.0, -1.0])
    lines = ["# images"]
    for i, view in enumerate(views):
        R = flip @ view[:3, :3]        # our view -> COLMAP world->cam
        t = flip @ view[:3, 3]
        q = _rotmat_to_qvec(R)
        lines.append(
            f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
            f"{t[0]} {t[1]} {t[2]} 1 view_{i:02d}.png")
        lines.append("1.0 1.0 -1")     # one dummy 2D point line
    (model_dir / "images.txt").write_text("\n".join(lines) + "\n")
    plines = ["# points"]
    for k in range(pts.shape[0]):
        p, c = pts[k], rgb[k]
        plines.append(f"{k + 1} {p[0]} {p[1]} {p[2]} "
                      f"{c[0]} {c[1]} {c[2]} 0.5 1 0")
    (model_dir / "points3D.txt").write_text("\n".join(plines) + "\n")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--max_gaussians", type=int, default=20000)
    ap.add_argument("--out_dir", default="outputs/e2e_colmap")
    ap.add_argument("--impl", default="auto")
    ap.add_argument("--mode", default="sorted")
    ap.add_argument("--footprint", default="axis",
                    choices=["axis", "ewa"])
    args = ap.parse_args(argv)

    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp

    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import Gaussians, RenderConfig
    from tpu_gaussians.io.image import save_image_png
    from tpu_gaussians.ops.dispatch import render

    out = Path(args.out_dir)
    img_dir = out / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    size, v = args.size, args.views

    # 1. Ground-truth scene + "photos".
    means, scales, colors, opac = make_gt_scene(rng)
    gt = Gaussians(means=jnp.asarray(means), scales=jnp.asarray(scales),
                   colors=jnp.asarray(colors), opacities=jnp.asarray(opac))
    cams = cam.orbit_cameras(v, size, size, radius=2.2, pitch=0.35)
    rc = RenderConfig(width=size, height=size, impl=args.impl,
                      mode="sorted", background=(0.02, 0.02, 0.02))
    print(f"[e2e] rendering {v} ground-truth views at {size}x{size}")
    for i in range(v):
        c1 = cam.Camera(view=cams.view[i], proj=cams.proj[i])
        img = np.asarray(render(gt, c1, rc))
        save_image_png(img_dir / f"view_{i:02d}.png", img)

    # 2. Synthetic SfM model (text COLMAP): noisy point subsample.
    fovy = 60.0
    fy = size / (2.0 * np.tan(np.radians(fovy) / 2.0))
    fx = fy
    sel = rng.choice(means.shape[0], size=2500, replace=False)
    pts = means[sel] + rng.normal(scale=0.01, size=(sel.size, 3))
    rgb = np.clip(colors[sel] * 255.0, 0, 255).astype(np.uint8)
    sparse = out / "sparse" / "0"
    write_colmap_text(sparse, np.asarray(cams.view), fx, fy, size, size,
                      pts, rgb)

    # 3. Import.
    from tpu_gaussians.cli import import_colmap
    imp_dir = out / "import"
    import_colmap.main(["--colmap_dir", str(sparse), "--out_dir",
                        str(imp_dir), "--init_out"])

    # 4. Fit (the real CLI).
    from tpu_gaussians.cli import fit as fit_cli
    fit_dir = out / "fit"
    t0 = time.perf_counter()
    fit_cli.main([
        "--targets_dir", str(img_dir),
        "--camera_npz", str(imp_dir / "cameras.npz"),
        "--init_npz", str(imp_dir / "init_points.npz"),
        "--out_dir", str(fit_dir),
        "--width", str(size), "--height", str(size),
        "--iters", str(args.iters),
        "--num_gaussians", "2500",
        "--max_gaussians", str(args.max_gaussians),
        "--use_sh", "--render_mode", args.mode,
        "--footprint", args.footprint,
        "--impl", args.impl,
        "--clone_metric", "grad",
        "--ssim_weight", "0.2",
        "--log_every", "100",
    ])
    fit_s = time.perf_counter() - t0

    # 5. Eval.
    from tpu_gaussians.cli import eval as eval_cli
    report = out / "eval.json"
    eval_cli.main([
        str(fit_dir / "gaussians_fitted.npz"),
        "--targets_dir", str(img_dir),
        "--camera_npz", str(imp_dir / "cameras.npz"),
        "--width", str(size), "--height", str(size),
        "--mode", args.mode, "--impl", args.impl,
        "--out", str(report),
    ])
    r = json.loads(report.read_text())
    print(json.dumps({
        "e2e": "colmap->import->fit->eval",
        "size": size, "views": v, "iters": args.iters,
        "mode": args.mode, "footprint": args.footprint,
        "fit_wall_s": round(fit_s, 2),
        "num_gaussians": r.get("num_gaussians"),
        "psnr_mean": r["mean"]["psnr"],
        "ssim_mean": r["mean"]["ssim"],
    }))


if __name__ == "__main__":
    main()
