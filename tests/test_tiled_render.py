"""Tiled (row-band) single-frame rendering over a device mesh must match
the single-device render exactly (parallel/tiled.py)."""

import numpy as np
import pytest

import jax

from tpu_gaussians.core.types import RenderConfig
from tpu_gaussians.ops.dispatch import render, render_accum
from tpu_gaussians.parallel.tiled import render_tiled

from .utils import orbit_camera, random_scene

W, H = 64, 50  # H deliberately NOT divisible by the band count


@pytest.mark.parametrize("mode,impl", [
    ("accum", "jnp"), ("accum", "pallas"), ("sorted", "pallas"),
])
def test_tiled_matches_full(mode, impl):
    g = random_scene(120, seed=2)
    c = orbit_camera(W, H, index=1)
    cfg = RenderConfig(width=W, height=H, impl=impl, mode=mode,
                       return_aux=True, chunk_size=32)
    full = render(g, c, cfg)
    tiled = render_tiled(g, c, cfg, n_devices=len(jax.devices()))
    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(tiled)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_row_window_is_exact():
    """A row-window render (row0 + proj_height) equals the corresponding
    rows of the full-frame render, including aux outputs."""
    g = random_scene(60, seed=5, use_sh=True)
    c = orbit_camera(W, H, index=2)
    cfg = RenderConfig(width=W, height=H, impl="jnp", return_aux=True,
                       chunk_size=16)
    full = render(g, c, cfg)

    win_cfg = cfg.replace(height=10, proj_height=H)
    win = render_accum(g, c.view, c.proj, win_cfg, row0=20.0)
    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(win)):
        np.testing.assert_allclose(np.asarray(a)[20:30], np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_tiled_rejects_batched_camera():
    from tpu_gaussians.core import camera as cam

    cams = cam.orbit_cameras(2, W, H)
    cfg = RenderConfig(width=W, height=H, impl="jnp")
    with pytest.raises(ValueError):
        render_tiled(random_scene(10), cams, cfg, n_devices=2)
