"""Pallas depth-sorted kernel vs jnp sorted path and the NumPy oracle."""

import numpy as np
import pytest

from tpu_gaussians.core.types import RenderConfig
from tpu_gaussians.ops.dispatch import render

from . import np_oracle
from .utils import orbit_camera, random_scene

W, H = 40, 32


def _oracle_args(g, c):
    return (
        np.asarray(g.means), np.asarray(g.scales), np.asarray(g.colors),
        np.asarray(g.opacities), np.asarray(c.view), np.asarray(c.proj),
    )


@pytest.mark.parametrize("n,seed", [(25, 0), (600, 3)])
def test_sorted_pallas_matches_oracle(n, seed):
    g = random_scene(n, seed=seed)
    c = orbit_camera(W, H, index=1)
    cfg = RenderConfig(width=W, height=H, impl="pallas", mode="sorted",
                       return_aux=True, background=(0.02, 0.05, 0.1))
    image, alpha, _ = render(g, c, cfg)
    ref_img, ref_alpha, _ = np_oracle.render_sorted(
        *_oracle_args(g, c), W, H, background=(0.02, 0.05, 0.1)
    )
    np.testing.assert_allclose(np.asarray(image), ref_img, atol=5e-4)
    np.testing.assert_allclose(np.asarray(alpha), ref_alpha, atol=5e-4)


def test_viewer_preset_knobs_plumb_and_stay_exact_when_slack():
    """The interactive-viewer forward knobs (sorted_pair_k /
    sorted_exit_t / sorted_band_capacity) must plumb through dispatch;
    on a small scene where the budgets are slack and nothing reaches
    the early-exit threshold they change NOTHING."""
    g = random_scene(80, seed=9)
    c = orbit_camera(W, H, index=1)
    base = RenderConfig(width=W, height=H, impl="pallas", mode="sorted",
                        return_aux=True)
    knobs = base.replace(sorted_pair_k=8, sorted_exit_t=1e-3,
                         sorted_band_capacity=512)
    out_b = render(g, c, base)
    out_k = render(g, c, knobs)
    for a, b in zip(out_k, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_sorted_pallas_matches_jnp():
    g = random_scene(150, seed=5, use_sh=True)
    c = orbit_camera(W, H, index=2)
    cfg_p = RenderConfig(width=W, height=H, impl="pallas", mode="sorted",
                         return_aux=True)
    cfg_j = cfg_p.replace(impl="jnp", chunk_size=32)
    img_p, al_p, d_p = render(g, c, cfg_p)
    img_j, al_j, d_j = render(g, c, cfg_j)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_j),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_p), np.asarray(al_j),
                               rtol=1e-4, atol=1e-5)
    # depth compared on covered pixels only: the num/(alpha+1e-6) resolve
    # amplifies float noise where alpha ~ 1e-6 (empty background).
    covered = np.asarray(al_j) > 0.05
    np.testing.assert_allclose(np.asarray(d_p)[covered],
                               np.asarray(d_j)[covered],
                               rtol=1e-4, atol=1e-4)


def test_ordering_matters_and_is_correct():
    """Two overlapping gaussians at different depths: the nearer one must
    dominate the pixel color (front-to-back, renderer_cpu.cpp:144-146)."""
    from tpu_gaussians.core.types import make_gaussians

    means = np.array([[0.0, 0.0, 0.5], [0.0, 0.0, -0.5]], np.float32)
    g = make_gaussians(
        means, np.full((2, 3), 0.3, np.float32),
        np.array([0.95, 0.95], np.float32),
        colors=np.array([[1, 0, 0], [0, 1, 0]], np.float32),
    )
    c = orbit_camera(W, H)  # camera at +z: gaussian 0 (z=0.5) is nearer
    cfg = RenderConfig(width=W, height=H, impl="pallas", mode="sorted")
    img = np.asarray(render(g, c, cfg))
    cy, cx = H // 2, W // 2
    assert img[cy, cx, 0] > img[cy, cx, 1], "near red gaussian must win"


def test_band_capacity_overflow_drops_farthest():
    """When a band overflows its capacity, the NEAREST gaussians must
    survive (overflow drops the most-occluded tail)."""
    from tpu_gaussians.core.types import make_gaussians

    # Two stacked gaussians at the image center; capacity will keep the
    # nearer (red) one after overflow.
    means = np.array([[0.0, 0.0, 0.5], [0.0, 0.0, -0.5]], np.float32)
    g = make_gaussians(
        means, np.full((2, 3), 0.25, np.float32),
        np.array([0.95, 0.95], np.float32),
        colors=np.array([[1, 0, 0], [0, 1, 0]], np.float32),
    )
    c = orbit_camera(W, H)
    from tpu_gaussians.ops.pallas import sorted as PS
    # Capacity of one chunk; monkeypatching NBS would be invasive, instead
    # render with a generous capacity and assert parity, then with the
    # minimum capacity and assert the near gaussian still renders.
    cfg_small = RenderConfig(width=W, height=H, impl="pallas", mode="sorted",
                             sorted_band_capacity=PS.NBS)
    img = np.asarray(render(g, c, cfg_small))
    cy, cx = H // 2, W // 2
    assert img[cy, cx, 0] > 0.3  # near red gaussian present


def test_sorted_pallas_batched_cameras_and_ewa():
    """Batched-camera (vmap) rendering and EWA footprints through the
    binned sorted kernel."""
    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import make_gaussians

    rng = np.random.default_rng(4)
    n = 60
    g = make_gaussians(
        rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32),
        rng.uniform(0.02, 0.2, (n, 3)).astype(np.float32),
        rng.uniform(0.2, 0.9, (n,)).astype(np.float32),
        colors=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        quats=rng.normal(size=(n, 4)).astype(np.float32),
    )
    cams = cam.orbit_cameras(2, W, H)
    cfg_p = RenderConfig(width=W, height=H, impl="pallas", mode="sorted",
                         footprint="ewa")
    cfg_j = cfg_p.replace(impl="jnp", chunk_size=16)
    imgs_p = render(g, cams, cfg_p)
    imgs_j = render(g, cams, cfg_j)
    assert imgs_p.shape == (2, H, W, 3)
    np.testing.assert_allclose(np.asarray(imgs_p), np.asarray(imgs_j),
                               rtol=1e-4, atol=1e-5)
