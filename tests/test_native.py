"""Native C++ rasterizer parity vs the NumPy oracle, plus the viewer
binary end-to-end (SURVEY.md §2 native-equivalents table)."""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from . import np_oracle
from .utils import orbit_camera, random_scene

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)

W, H = 64, 48


def _native():
    native = pytest.importorskip("tpu_gaussians.native")
    try:
        native.build()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build failed: {e}")
    return native


def _scene_args(n=40, seed=0):
    g = random_scene(n, seed=seed)
    c = orbit_camera(W, H, index=1)
    return (
        np.asarray(g.means), np.asarray(g.scales), np.asarray(g.colors),
        np.asarray(g.opacities), np.asarray(c.view), np.asarray(c.proj),
    )


def test_accum_mode_matches_oracle():
    native = _native()
    means, scales, colors, opacities, view, proj = _scene_args()
    rgb, alpha = native.render_native(
        means, scales, colors, opacities, view, proj,
        width=W, height=H, background=(0.1, 0.2, 0.3),
        depth_sort=False, as_float=True,
    )
    ref_img, ref_alpha, _ = np_oracle.render_accum(
        means, scales, colors, opacities, view, proj, W, H,
        background=(0.1, 0.2, 0.3),
    )
    # The native path cuts splats at w < 1e-5 (adaptive radius); with up to
    # N contributions the accumulated deviation is bounded by ~N*1e-5.
    np.testing.assert_allclose(rgb, ref_img, atol=5e-4)
    np.testing.assert_allclose(alpha, ref_alpha, atol=5e-4)


def test_sorted_mode_matches_oracle():
    native = _native()
    means, scales, colors, opacities, view, proj = _scene_args(seed=3)
    rgb, alpha = native.render_native(
        means, scales, colors, opacities, view, proj,
        width=W, height=H, background=(0.02, 0.02, 0.02),
        depth_sort=True, as_float=True,
    )
    ref_img, ref_alpha, _ = np_oracle.render_sorted(
        means, scales, colors, opacities, view, proj, W, H,
        background=(0.02, 0.02, 0.02),
    )
    np.testing.assert_allclose(rgb, ref_img, atol=5e-4)
    np.testing.assert_allclose(alpha, ref_alpha, atol=5e-4)


def test_rgba8_output():
    native = _native()
    args = _scene_args(seed=5)
    out = native.render_native(*args, width=W, height=H)
    assert out.shape == (H, W, 4) and out.dtype == np.uint8
    assert (out[..., 3] == 255).all()
    assert out[..., :3].max() > 0  # something rendered


def test_input_validation():
    native = _native()
    means, scales, colors, opacities, view, proj = _scene_args()
    with pytest.raises(ValueError):
        native.render_native(means[:, :2], scales, colors, opacities,
                             view, proj, width=W, height=H)
    with pytest.raises(ValueError):
        native.render_native(means, scales[:-1], colors, opacities,
                             view, proj, width=W, height=H)


def test_viewer_binary(tmp_path):
    viewer = Path(__file__).parent.parent / "native" / "build" / "gs_viewer"
    _native()  # ensure built
    if not viewer.exists():
        pytest.skip("gs_viewer not built (cmake unavailable)")

    # Write a fitted-schema npz and run an offline orbit sweep.
    from tpu_gaussians.io.npz import save_gaussians_npz
    g = random_scene(25, seed=7)
    npz = tmp_path / "model.npz"
    save_gaussians_npz(npz, g)

    out_dir = tmp_path / "frames"
    res = subprocess.run(
        [str(viewer), str(npz), "--width", "64", "--height", "48",
         "--frames", "3", "--out_dir", str(out_dir)],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, res.stderr
    assert "FPS" in res.stdout
    frames = sorted(out_dir.glob("frame_*.ppm"))
    assert len(frames) == 3
    header = frames[0].read_bytes()[:20]
    assert header.startswith(b"P6\n64 48\n255\n")
