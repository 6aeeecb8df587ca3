"""Shared test fixtures: random scenes and cameras."""

from __future__ import annotations

import numpy as np

from tpu_gaussians.core import camera as cam
from tpu_gaussians.core.types import Camera, Gaussians, make_gaussians


def random_scene(n: int, seed: int = 0, use_sh: bool = False,
                 alive_frac: float | None = None) -> Gaussians:
    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.6, 0.6, size=(n, 3)).astype(np.float32)
    scales = rng.uniform(0.02, 0.25, size=(n, 3)).astype(np.float32)
    opacities = rng.uniform(0.05, 0.95, size=(n,)).astype(np.float32)
    alive = None
    if alive_frac is not None:
        alive = (rng.uniform(size=(n,)) < alive_frac).astype(np.float32)
    if use_sh:
        sh = np.zeros((n, 4, 3), dtype=np.float32)
        sh[:, 0] = rng.uniform(0.0, 1.0, size=(n, 3))
        sh[:, 1:] = rng.normal(0.0, 0.15, size=(n, 3, 3))
        return make_gaussians(means, scales, opacities, sh=sh, alive=alive)
    colors = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    return make_gaussians(means, scales, opacities, colors=colors, alive=alive)


def orbit_camera(width: int, height: int, index: int = 0, views: int = 4) -> Camera:
    return cam.orbit_cameras(views, width, height)[index]
