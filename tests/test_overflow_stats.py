"""Overflow observability of the scale approximations (VERDICT r1 item
#6): the binner reports dropped pairs / full tiles / clipped rects, the
loss surfaces them in metrics, and exact paths report zeros."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_gaussians.core import camera as cam
from tpu_gaussians.core.types import Gaussians, RenderConfig
from tpu_gaussians.ops.dispatch import render_accum, render_sorted

from tests.utils import random_scene

W, H = 128, 64


def _clustered_scene(n, seed=0):
    """n gaussians crammed into one screen region -> one hot tile."""
    g = random_scene(n, seed=seed)
    rng = np.random.default_rng(seed)
    means = np.array(g.means)  # writable copy
    means[:, :2] = rng.normal(scale=0.02, size=(n, 2))  # tight cluster
    return g.replace(means=jnp.asarray(means))


def test_sorted_capacity_overflow_reported():
    g = _clustered_scene(700, seed=1)
    c = cam.orbit_cameras(1, W, H)
    # Band capacity floor is NBS=512; 700 clustered gaussians overflow it.
    cfg = RenderConfig(width=W, height=H, impl="pallas", mode="sorted",
                       sorted_band_capacity=512)
    img, alpha, depth, stats = render_sorted(
        g, c.view[0], c.proj[0], cfg, return_stats=True)
    assert int(stats["dropped_pairs"]) > 0
    assert int(stats["full_tiles"]) > 0


def test_sorted_no_overflow_reports_zero():
    g = random_scene(64, seed=2)
    c = cam.orbit_cameras(1, W, H)
    cfg = RenderConfig(width=W, height=H, impl="pallas", mode="sorted")
    *_, stats = render_sorted(g, c.view[0], c.proj[0], cfg,
                              return_stats=True)
    assert int(stats["dropped_pairs"]) == 0
    assert int(stats["full_tiles"]) == 0


def test_rect_budget_clipping_reported():
    """A huge-footprint gaussian under a k=1 tile budget loses true
    overlaps -> clipped_rect_pairs > 0."""
    from tpu_gaussians.ops.pallas.sorted import _bin_pairs_2d

    n = 4
    px = jnp.full((n,), W / 2.0)
    py = jnp.full((n,), H / 2.0)
    sx = jnp.full((n,), 200.0)  # covers every tile of a 128x64 frame
    sy = jnp.full((n,), 200.0)
    op = jnp.full((n,), 0.9)
    z = jnp.arange(n, dtype=jnp.float32) + 1.0
    order, slots, cnt, stats = _bin_pairs_2d(
        px, py, sx, sy, op, z, tiles_x=1, tiles_y=4, cap=512,
        width=W, height=H, k=1)
    assert int(stats["clipped_rect_pairs"]) > 0
    assert int(stats["dropped_pairs"]) == 0


def test_jnp_path_reports_zeros():
    g = random_scene(32, seed=3)
    c = cam.orbit_cameras(1, W, H)
    cfg = RenderConfig(width=W, height=H, impl="jnp", chunk_size=16)
    *_, stats = render_accum(g, c.view[0], c.proj[0], cfg,
                             return_stats=True)
    assert all(int(v) == 0 for v in stats.values())


def test_loss_metrics_carry_counters():
    from tpu_gaussians.fit.loss import LossConfig, loss_fn
    from tpu_gaussians.models.gaussian_model import init_params

    raw = init_params(jax.random.PRNGKey(0), 32, 48)
    c = cam.orbit_cameras(2, 32, 32)
    targets = jnp.full((2, 32, 32, 3), 0.4)
    rc = RenderConfig(width=32, height=32, impl="jnp", chunk_size=16,
                      return_aux=True)
    _, metrics = loss_fn(raw, c, targets, None, None, rc, LossConfig())
    for k in ("binner_dropped_pairs", "binner_full_tiles",
              "binner_clipped_rect_pairs"):
        assert k in metrics and float(metrics[k]) == 0.0
