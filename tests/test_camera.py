"""Camera math vs closed-form NumPy oracle (SURVEY.md §4 unit tests;
oracle formulas: torch_renderer.py:24-54)."""

import numpy as np
import pytest

from tpu_gaussians.core import camera as cam

from . import np_oracle


def test_perspective_matches_oracle():
    ours = np.asarray(cam.perspective(60.0, 4 / 3, 0.01, 100.0))
    ref = np_oracle.perspective(60.0, 4 / 3, 0.01, 100.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)
    assert ours[3, 2] == -1.0 and ours[3, 3] == 0.0


@pytest.mark.parametrize("eye", [[2.0, 1.0, 2.0], [0.0, 3.0, 0.01], [-1.5, 0.2, 2.2]])
def test_look_at_matches_oracle(eye):
    target = [0.0, 0.0, 0.0]
    up = [0.0, 1.0, 0.0]
    ours = np.asarray(cam.look_at(eye, target, up))
    ref = np_oracle.look_at(eye, target, up)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_look_at_maps_eye_to_origin():
    eye = np.array([1.0, 2.0, 3.0])
    view = np.asarray(cam.look_at(eye, [0, 0, 0], [0, 1, 0]))
    p = view @ np.array([*eye, 1.0])
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)


def test_look_at_forward_is_minus_z():
    eye = np.array([0.0, 0.0, 5.0])
    view = np.asarray(cam.look_at(eye, [0, 0, 0], [0, 1, 0]))
    # A point between eye and target is in front -> negative camera z.
    p = view @ np.array([0.0, 0.0, 2.0, 1.0])
    assert p[2] < 0


def test_camera_position_from_view():
    eye = np.array([1.3, -0.7, 2.9], dtype=np.float32)
    view = cam.look_at(eye, [0, 0, 0], [0, 1, 0])
    pos = np.asarray(cam.camera_position_from_view(view))
    np.testing.assert_allclose(pos, eye, rtol=1e-4, atol=1e-5)


def test_orbit_cameras_match_reference_rig():
    c = cam.orbit_cameras(4, 128, 128)
    assert c.view.shape == (4, 4, 4) and c.proj.shape == (4, 4, 4)
    # View 0: yaw=0 -> eye = (0, r*sin(p), r*cos(p)), r=2.5, p=0.2.
    eye0 = np.asarray(cam.camera_position_from_view(c.view[0]))
    np.testing.assert_allclose(
        eye0, [0.0, 2.5 * np.sin(0.2), 2.5 * np.cos(0.2)], rtol=1e-4, atol=1e-5
    )
    ref_proj = np_oracle.perspective(60.0, 1.0, 0.01, 100.0)
    np.testing.assert_allclose(np.asarray(c.proj[0]), ref_proj, rtol=1e-6, atol=1e-6)


def test_cameras_npz_roundtrip(tmp_path):
    c = cam.orbit_cameras(3, 64, 64)
    path = tmp_path / "cams.npz"
    cam.save_cameras_npz(path, c)
    c2 = cam.load_cameras_npz(path, expected_views=3)
    np.testing.assert_array_equal(np.asarray(c.view), np.asarray(c2.view))
    np.testing.assert_array_equal(np.asarray(c.proj), np.asarray(c2.proj))


def test_cameras_npz_count_mismatch(tmp_path):
    c = cam.orbit_cameras(3, 64, 64)
    path = tmp_path / "cams.npz"
    cam.save_cameras_npz(path, c)
    with pytest.raises(ValueError):
        cam.load_cameras_npz(path, expected_views=5)
