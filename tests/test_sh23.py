"""SH degree 2/3 (standard 3DGS real-SH extension, ops/sh.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_gaussians.core.types import RenderConfig, make_gaussians
from tpu_gaussians.ops.dispatch import render
from tpu_gaussians.ops.sh import SH_C0, eval_colors, sh_bands

from .utils import orbit_camera

W, H = 40, 32


def _np_eval_sh3dgs(sh, dirs):
    """Independent NumPy port of the canonical 3DGS computeColorFromSH
    polynomial forms (float64)."""
    C0 = 0.28209479177387814
    C1 = 0.4886025119029199
    C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396]
    C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435]
    sh = sh.astype(np.float64)
    x, y, z = (dirs[:, i:i + 1].astype(np.float64) for i in range(3))
    out = 0.5 + C0 * sh[:, 0]
    out = out - C1 * y * sh[:, 1] + C1 * z * sh[:, 2] - C1 * x * sh[:, 3]
    xx, yy, zz, xy, yz, xz = x * x, y * y, z * z, x * y, y * z, x * z
    out = (out + C2[0] * xy * sh[:, 4] + C2[1] * yz * sh[:, 5]
           + C2[2] * (2 * zz - xx - yy) * sh[:, 6]
           + C2[3] * xz * sh[:, 7] + C2[4] * (xx - yy) * sh[:, 8])
    if sh.shape[1] == 16:
        out = (out + C3[0] * y * (3 * xx - yy) * sh[:, 9]
               + C3[1] * xy * z * sh[:, 10]
               + C3[2] * y * (4 * zz - xx - yy) * sh[:, 11]
               + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[:, 12]
               + C3[4] * x * (4 * zz - xx - yy) * sh[:, 13]
               + C3[5] * z * (xx - yy) * sh[:, 14]
               + C3[6] * x * (xx - 3 * yy) * sh[:, 15])
    return out


@pytest.mark.parametrize("degree", [2, 3])
def test_eval_matches_numpy_oracle(degree):
    rng = np.random.default_rng(degree)
    n, k = 50, sh_bands(degree)
    sh = rng.normal(scale=0.3, size=(n, k, 3)).astype(np.float32)
    means = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    c = orbit_camera(W, H, index=1)
    view = np.asarray(c.view)

    got = np.asarray(eval_colors(jnp.asarray(sh), jnp.asarray(means), c.view))

    cam_pos = np.linalg.inv(view)[:3, 3]
    dirs = means - cam_pos[None, :]
    dirs = dirs / (np.linalg.norm(dirs, axis=1, keepdims=True) + 1e-8)
    want = _np_eval_sh3dgs(sh, dirs)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_render_parity_jnp_vs_pallas_sh3():
    rng = np.random.default_rng(7)
    n = 80
    sh = rng.normal(scale=0.2, size=(n, 16, 3)).astype(np.float32)
    sh[:, 0, :] = rng.uniform(-0.5, 1.5, (n, 3))
    g = make_gaussians(
        rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32),
        rng.uniform(0.02, 0.15, (n, 3)).astype(np.float32),
        rng.uniform(0.2, 0.9, (n,)).astype(np.float32),
        sh=sh,
    )
    c = orbit_camera(W, H, index=2)
    cfg_p = RenderConfig(width=W, height=H, impl="pallas", mode="accum")
    cfg_j = cfg_p.replace(impl="jnp", chunk_size=32)
    img_p = render(g, c, cfg_p)
    img_j = render(g, c, cfg_j)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_j),
                               rtol=1e-4, atol=1e-5)


def test_sh3_is_view_dependent():
    """A degree-3 model with nonzero high-order terms must change color
    with viewpoint."""
    n = 1
    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0, :] = -0.1 / SH_C0  # base 0.4 (leave clamp headroom)
    sh[:, 15, :] = 0.5          # x(x^2-3y^2) lobe: varies strongly with yaw
    g = make_gaussians(
        np.zeros((n, 3), np.float32),
        np.full((n, 3), 0.3, np.float32),
        np.array([0.9], np.float32),
        sh=sh,
    )
    cfg = RenderConfig(width=W, height=H, impl="jnp", mode="accum")
    # index 0 -> view dir along z (x-lobe silent); index 1 -> along x.
    img0 = np.asarray(render(g, orbit_camera(W, H, index=0), cfg))
    img1 = np.asarray(render(g, orbit_camera(W, H, index=1), cfg))
    assert np.abs(img0 - img1).max() > 0.02


@pytest.mark.parametrize("degree", [2, 3])
def test_ply_roundtrip_native_basis(degree, tmp_path):
    from tpu_gaussians.io.ply import load_gaussians_ply, save_gaussians_ply

    rng = np.random.default_rng(degree + 10)
    n, k = 30, sh_bands(degree)
    sh = rng.normal(scale=0.3, size=(n, k, 3)).astype(np.float32)
    g = make_gaussians(
        rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        rng.uniform(0.01, 0.2, (n, 3)).astype(np.float32),
        rng.uniform(0.1, 0.9, (n,)).astype(np.float32),
        sh=sh,
        quats=rng.normal(size=(n, 4)).astype(np.float32),
    )
    p = tmp_path / f"deg{degree}.ply"
    save_gaussians_ply(p, g)
    g2 = load_gaussians_ply(p)
    assert g2.sh.shape == (n, k, 3)
    np.testing.assert_allclose(np.asarray(g2.sh), sh, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.opacities),
                               np.asarray(g.opacities), rtol=1e-4, atol=1e-5)


def test_npz_roundtrip_sh2(tmp_path):
    from tpu_gaussians.io.npz import load_gaussians_npz, save_gaussians_npz

    rng = np.random.default_rng(3)
    n = 20
    sh = rng.normal(scale=0.3, size=(n, 9, 3)).astype(np.float32)
    g = make_gaussians(
        rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        rng.uniform(0.01, 0.2, (n, 3)).astype(np.float32),
        rng.uniform(0.1, 0.9, (n,)).astype(np.float32),
        sh=sh,
    )
    p = tmp_path / "sh2.npz"
    save_gaussians_npz(p, g)
    g2 = load_gaussians_npz(p)
    np.testing.assert_allclose(np.asarray(g2.sh), sh)
    # colors key (for reference viewers) carries the dc color
    data = np.load(p)
    np.testing.assert_allclose(
        data["colors"], np.clip(0.5 + SH_C0 * sh[:, 0, :], 0, 1), atol=1e-6)


def test_fit_smoke_sh_degree2(tmp_path):
    """Short fit with sh_degree=2 decreases loss and emits artifacts."""
    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.fit.trainer import fit, write_artifacts
    from tpu_gaussians.utils.config import FitConfig

    from .utils import random_scene

    g = random_scene(30, seed=42)
    cams = cam.orbit_cameras(2, W, H)
    cfg_r = RenderConfig(width=W, height=H, impl="jnp", chunk_size=32)
    targets = np.asarray(render(g, cams, cfg_r))

    cfg = FitConfig(
        iters=25, width=W, height=H, num_gaussians=40, max_gaussians=64,
        use_sh=True, sh_degree=2, impl="jnp",
        silhouette_weight=0.0, depth_weight=0.0,
        densify_interval=1000, prune_interval=1000, log_every=1000, seed=1,
    )
    result = fit(cfg, targets, cams, out_dir=tmp_path)
    assert result.loss_log[-1] < result.loss_log[0]
    assert result.raw.sh_raw.shape[1] == 9
    write_artifacts(tmp_path, result, cfg)
    assert (tmp_path / "gaussians_fitted.npz").exists()
