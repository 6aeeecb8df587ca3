"""3DGS-convention PLY interop: roundtrips, convention checks, CLI."""

import numpy as np
import pytest

from tpu_gaussians.io.ply import (
    SH_C0,
    load_gaussians_ply,
    save_gaussians_ply,
)

from .utils import random_scene


def test_rgb_roundtrip(tmp_path):
    g = random_scene(30, seed=1)
    path = tmp_path / "m.ply"
    save_gaussians_ply(path, g)
    g2 = load_gaussians_ply(path)
    np.testing.assert_allclose(np.asarray(g2.means), np.asarray(g.means),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.scales), np.asarray(g.scales),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g2.opacities),
                               np.asarray(g.opacities), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g2.colors), np.asarray(g.colors),
                               rtol=1e-3, atol=1e-5)


def test_sh_and_quats_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    g = random_scene(20, seed=3, use_sh=True)
    quats = rng.normal(size=(20, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    g = g.replace(quats=np.abs(quats))  # keep normalized & deterministic sign
    path = tmp_path / "m.ply"
    save_gaussians_ply(path, g)
    g2 = load_gaussians_ply(path)
    # dc clamped to [0,1] on export (render contract), rest exact
    np.testing.assert_allclose(np.asarray(g2.sh)[:, 0],
                               np.clip(np.asarray(g.sh)[:, 0], 0, 1),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2.sh)[:, 1:],
                               np.asarray(g.sh)[:, 1:], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2.quats), np.asarray(g.quats),
                               rtol=1e-4, atol=1e-5)


def test_ply_follows_3dgs_conventions(tmp_path):
    """Spot-check the on-disk values against the ecosystem conventions:
    log scales, logit opacity, (rgb-0.5)/C0 dc."""
    g = random_scene(5, seed=7)
    path = tmp_path / "m.ply"
    save_gaussians_ply(path, g)

    raw = path.read_bytes()
    end = raw.find(b"end_header\n")
    header = raw[:end].decode().splitlines()
    props = [l.split()[2] for l in header if l.startswith("property")]
    n_props = len(props)
    arr = np.frombuffer(raw[end + 11:], dtype="<f4").reshape(5, n_props)
    col = {p: i for i, p in enumerate(props)}

    np.testing.assert_allclose(
        arr[:, col["scale_0"]], np.log(np.asarray(g.scales)[:, 0]), rtol=1e-4)
    op = np.asarray(g.opacities)
    np.testing.assert_allclose(
        arr[:, col["opacity"]], np.log(op / (1 - op)), rtol=1e-3)
    np.testing.assert_allclose(
        arr[:, col["f_dc_0"]],
        (np.asarray(g.colors)[:, 0] - 0.5) / SH_C0, rtol=1e-4, atol=1e-5)


def test_sh_render_equivalence_through_ply(tmp_path):
    """Rendering the PLY-roundtripped SH model must match the original
    (validates the basis mapping, not just the roundtrip algebra)."""
    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import RenderConfig
    from tpu_gaussians.ops.dispatch import render

    g = random_scene(15, seed=9, use_sh=True)
    path = tmp_path / "m.ply"
    save_gaussians_ply(path, g)
    g2 = load_gaussians_ply(path)

    c = cam.orbit_cameras(3, 32, 32)[1]
    cfg = RenderConfig(width=32, height=32, impl="jnp", chunk_size=8)
    # original with dc clamped like export
    sh_c = np.asarray(g.sh).copy()
    sh_c[:, 0] = np.clip(sh_c[:, 0], 0, 1)
    img1 = np.asarray(render(g.replace(sh=sh_c), c, cfg))
    img2 = np.asarray(render(g2.replace(quats=None), c, cfg))
    np.testing.assert_allclose(img2, img1, atol=1e-4)


def test_convert_cli(tmp_path):
    from tpu_gaussians.cli import convert
    from tpu_gaussians.io.npz import save_gaussians_npz

    g = random_scene(8, seed=11)
    npz = tmp_path / "m.npz"
    save_gaussians_npz(npz, g)
    ply = tmp_path / "m.ply"
    convert.main([str(npz), str(ply)])
    npz2 = tmp_path / "m2.npz"
    convert.main([str(ply), str(npz2)])
    from tpu_gaussians.io.npz import load_gaussians_npz
    g2 = load_gaussians_npz(npz2)
    np.testing.assert_allclose(np.asarray(g2.means), np.asarray(g.means),
                               rtol=1e-5, atol=1e-6)
