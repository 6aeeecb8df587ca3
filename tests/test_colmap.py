"""COLMAP sparse-model import: binary/text parsing round-trip, camera
convention (COLMAP world->cam == our OpenGL view after the axis flip),
and SfM-point initialization."""

import struct
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_gaussians.core import camera as cam
from tpu_gaussians.io.colmap import (
    colmap_to_view_proj,
    qvec_to_rotmat,
    read_model,
)
from tpu_gaussians.models.gaussian_model import (
    activate,
    init_params_from_points,
    raw_from_gaussians,
)


def _rotmat_to_qvec(R):
    """Shepperd's method (robust for all rotations, incl. 180 deg)."""
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
    x, y, z, w = vecs[:, np.argmax(vals)]
    q = np.array([w, x, y, z])
    return q if w >= 0 else -q


def _make_model(tmp: Path, binary: bool):
    """Two cameras derived from our own orbit rig, plus 5 points."""
    rig = cam.orbit_cameras(2, 64, 48)
    flip = np.diag([1.0, -1.0, -1.0])
    entries = []
    for i in range(2):
        v = np.asarray(rig.view[i])
        R_colmap = flip @ v[:3, :3]
        t_colmap = flip @ v[:3, 3]
        entries.append((i + 1, _rotmat_to_qvec(R_colmap), t_colmap, 1,
                        f"img_{i:02d}.png"))
    # PINHOLE intrinsics matching the rig's 60-deg fovy at 64x48.
    fy = 24.0 / np.tan(np.radians(30.0))
    fx = fy  # square pixels
    pts = np.array([[0.1, 0.2, 0.3], [-0.2, 0.1, 0.0], [0.3, -0.1, 0.2],
                    [0.0, 0.0, 0.1], [-0.1, -0.2, -0.1]], np.float64)
    rgb = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                    [128, 128, 128], [10, 200, 30]], np.uint8)

    if binary:
        with open(tmp / "cameras.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 1, 64, 48))
            f.write(struct.pack("<4d", fx, fy, 32.0, 24.0))
        with open(tmp / "images.bin", "wb") as f:
            f.write(struct.pack("<Q", len(entries)))
            for iid, q, t, cid, name in entries:
                f.write(struct.pack("<i", iid))
                f.write(struct.pack("<4d", *q))
                f.write(struct.pack("<3d", *t))
                f.write(struct.pack("<i", cid))
                f.write(name.encode() + b"\x00")
                f.write(struct.pack("<Q", 1))  # one 2D point (skipped)
                f.write(struct.pack("<ddq", 1.0, 2.0, -1))
        with open(tmp / "points3D.bin", "wb") as f:
            f.write(struct.pack("<Q", len(pts)))
            for k in range(len(pts)):
                f.write(struct.pack("<q", k))
                f.write(struct.pack("<3d", *pts[k]))
                f.write(struct.pack("<3B", *rgb[k]))
                f.write(struct.pack("<d", 0.5))
                f.write(struct.pack("<Q", 1))
                f.write(struct.pack("<ii", 1, 0))
    else:
        (tmp / "cameras.txt").write_text(
            f"# comment\n1 PINHOLE 64 48 {fx} {fy} 32 24\n")
        lines = ["# images"]
        for iid, q, t, cid, name in entries:
            lines.append(f"{iid} {q[0]} {q[1]} {q[2]} {q[3]} "
                         f"{t[0]} {t[1]} {t[2]} {cid} {name}")
            lines.append("1.0 2.0 -1")
        (tmp / "images.txt").write_text("\n".join(lines) + "\n")
        plines = ["# points"]
        for k in range(len(pts)):
            plines.append(f"{k} {pts[k,0]} {pts[k,1]} {pts[k,2]} "
                          f"{rgb[k,0]} {rgb[k,1]} {rgb[k,2]} 0.5 1 0")
        (tmp / "points3D.txt").write_text("\n".join(plines) + "\n")
    return rig, pts.astype(np.float32), rgb.astype(np.float32) / 255.0


@pytest.mark.parametrize("binary", [True, False])
def test_roundtrip_and_convention(tmp_path, binary):
    rig, pts, rgb = _make_model(tmp_path, binary)
    cams, images, p_xyz, p_rgb = read_model(tmp_path)
    assert [im.name for im in images] == ["img_00.png", "img_01.png"]
    np.testing.assert_allclose(p_xyz, pts, atol=1e-6)
    np.testing.assert_allclose(p_rgb, rgb, atol=1e-2)

    view, proj, (w, h) = colmap_to_view_proj(cams, images)
    assert (w, h) == (64, 48)
    # The imported views must reproduce the orbit rig's view matrices.
    np.testing.assert_allclose(view, np.asarray(rig.view), atol=1e-5)
    # fovy 60 deg at 64x48 square pixels -> proj matches perspective().
    want = np.asarray(cam.perspective(60.0, 64 / 48, 0.01, 100.0))
    np.testing.assert_allclose(proj[0], want, atol=1e-4)


def test_qvec_identity():
    np.testing.assert_allclose(qvec_to_rotmat(np.array([1.0, 0, 0, 0])),
                               np.eye(3), atol=1e-12)


def test_init_from_points():
    key = jax.random.PRNGKey(0)
    pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    rgb = np.random.default_rng(1).uniform(size=(50, 3)).astype(np.float32)
    raw = init_params_from_points(key, pts, rgb, capacity=64)
    g = activate(raw)
    assert int(jnp.sum(raw.alive_mask())) == 50
    np.testing.assert_allclose(np.asarray(g.means)[:50], pts, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.colors)[:50], rgb, atol=1e-3)
    scales = np.asarray(g.scales)[:50]
    assert np.all(scales > 0) and np.all(scales[:, 0] == scales[:, 1])

    # SH variant carries rgb in the dc band.
    raw_sh = init_params_from_points(key, pts, rgb, capacity=64, use_sh=True)
    g_sh = activate(raw_sh)
    np.testing.assert_allclose(np.asarray(g_sh.sh)[:50, 0, :], rgb,
                               atol=1e-3)

    # Subsampling path.
    raw_sub = init_params_from_points(key, pts, rgb, capacity=20)
    assert int(jnp.sum(raw_sub.alive_mask())) == 20


def test_raw_from_gaussians_roundtrip():
    key = jax.random.PRNGKey(2)
    pts = np.random.default_rng(3).normal(size=(30, 3)).astype(np.float32)
    rgb = np.random.default_rng(4).uniform(0.1, 0.9, size=(30, 3)
                                           ).astype(np.float32)
    raw = init_params_from_points(key, pts, rgb, capacity=30)
    g = activate(raw)
    raw2 = raw_from_gaussians(g, capacity=40)
    g2 = activate(raw2)
    np.testing.assert_allclose(np.asarray(g2.means)[:30],
                               np.asarray(g.means)[:30], atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.scales)[:30],
                               np.asarray(g.scales)[:30], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g2.opacities)[:30],
                               np.asarray(g.opacities)[:30], rtol=1e-4)
    assert int(jnp.sum(raw2.alive_mask())) == 30


def test_import_cli_and_fit_init(tmp_path):
    """import_colmap CLI emits cameras.npz + init_points.npz consumable
    by the fit CLI's --init_npz."""
    model = tmp_path / "sparse0"
    model.mkdir()
    _make_model(model, binary=True)
    out = tmp_path / "imported"

    from tpu_gaussians.cli.import_colmap import main as import_main
    import_main(["--colmap_dir", str(model), "--out_dir", str(out),
                 "--init_out", "--max_points", "5"])
    assert (out / "cameras.npz").exists()
    assert (out / "init_points.npz").exists()

    loaded = cam.load_cameras_npz(out / "cameras.npz", 2)
    assert loaded.view.shape == (2, 4, 4)

    # Warm-start a 3-iter fit from the imported init.
    from tpu_gaussians.fit.trainer import fit
    from tpu_gaussians.utils.config import FitConfig

    targets = np.full((2, 48, 64, 3), 0.3, np.float32)
    config = FitConfig(iters=3, width=64, height=48, num_gaussians=5,
                       max_gaussians=8, impl="jnp", use_sh=True,
                       silhouette_weight=0.0, densify_interval=0,
                       prune_interval=0, log_every=1000,
                       init_npz=str(out / "init_points.npz"))
    result = fit(config, targets, loaded)
    assert len(result.loss_log) == 3
