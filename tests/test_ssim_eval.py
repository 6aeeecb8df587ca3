"""SSIM loss term + eval CLI (TPU-native extensions; reference is L1-only
with no eval tooling)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_gaussians.core import camera as cam
from tpu_gaussians.core.types import RenderConfig
from tpu_gaussians.fit.loss import ssim
from tpu_gaussians.io.image import save_image_png
from tpu_gaussians.io.npz import save_gaussians_npz
from tpu_gaussians.ops.dispatch import render

from .utils import random_scene

W, H = 48, 32


def test_ssim_identity_and_degradation():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, H, W, 3)).astype(np.float32))
    s_same = np.asarray(ssim(x, x))
    np.testing.assert_allclose(s_same, 1.0, atol=1e-5)

    noisy = jnp.clip(x + 0.2 * jnp.asarray(
        rng.normal(size=x.shape).astype(np.float32)), 0, 1)
    s_noisy = np.asarray(ssim(x, noisy))
    assert (s_noisy < 0.9).all()
    # less noise -> higher ssim
    slightly = jnp.clip(x + 0.02 * jnp.asarray(
        rng.normal(size=x.shape).astype(np.float32)), 0, 1)
    assert (np.asarray(ssim(x, slightly)) > s_noisy).all()


def test_ssim_differentiable():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    g = jax.grad(lambda p: jnp.mean(1.0 - ssim(p, t)))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0


def test_fit_with_ssim_weight_decreases_loss(tmp_path):
    from tpu_gaussians.fit.trainer import fit
    from tpu_gaussians.utils.config import FitConfig

    g = random_scene(30, seed=42)
    cams = cam.orbit_cameras(2, W, H)
    cfg_r = RenderConfig(width=W, height=H, impl="jnp", chunk_size=32)
    targets = np.asarray(render(g, cams, cfg_r))

    cfg = FitConfig(
        iters=25, width=W, height=H, num_gaussians=40, max_gaussians=64,
        impl="jnp", ssim_weight=0.2, silhouette_weight=0.0,
        densify_interval=1000, prune_interval=1000, log_every=1000, seed=1,
    )
    result = fit(cfg, targets, cams, out_dir=tmp_path)
    assert result.loss_log[-1] < result.loss_log[0]


def test_eval_cli(tmp_path):
    from tpu_gaussians.cli import eval as eval_cli

    g = random_scene(25, seed=3)
    cams = cam.orbit_cameras(3, W, H)
    cfg_r = RenderConfig(width=W, height=H, impl="jnp", chunk_size=32)
    imgs = np.asarray(render(g, cams, cfg_r))

    tdir = tmp_path / "targets"
    tdir.mkdir()
    for i in range(3):
        save_image_png(tdir / f"v{i:02d}.png", imgs[i])

    npz = tmp_path / "model.npz"
    save_gaussians_npz(npz, g)

    out = tmp_path / "eval.json"
    eval_cli.main([str(npz), "--targets_dir", str(tdir),
                   "--width", str(W), "--height", str(H),
                   "--impl", "jnp", "--out", str(out)])
    report = json.loads(out.read_text())
    assert len(report["views"]) == 3
    # Self-eval against its own renders: near-lossless (PNG quantization).
    assert report["mean"]["psnr"] > 40.0
    assert report["mean"]["ssim"] > 0.98
