"""Golden-parity tests: pure-jnp renderer vs the independent NumPy oracle
(SURVEY.md §4 "Golden-parity tests"), plus gradient checks vs finite
differences and semantic edge cases from the reference contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_gaussians.core.types import Camera, RenderConfig, make_gaussians
from tpu_gaussians.ops.dispatch import render

from . import np_oracle
from .utils import orbit_camera, random_scene

W, H = 48, 40


def _oracle_args(g, c):
    colors = g.sh if g.use_sh else g.colors
    return (
        np.asarray(g.means), np.asarray(g.scales), np.asarray(colors),
        np.asarray(g.opacities), np.asarray(c.view), np.asarray(c.proj),
    )


@pytest.mark.parametrize("use_sh", [False, True])
def test_accum_matches_oracle(use_sh):
    g = random_scene(37, seed=3, use_sh=use_sh)
    c = orbit_camera(W, H)
    cfg = RenderConfig(width=W, height=H, impl="jnp", return_aux=True,
                       background=(0.1, 0.2, 0.3), chunk_size=16)
    image, alpha, depth = render(g, c, cfg, validate=True)
    ref_img, ref_alpha, ref_depth = np_oracle.render_accum(
        *_oracle_args(g, c), W, H, background=(0.1, 0.2, 0.3)
    )
    np.testing.assert_allclose(np.asarray(image), ref_img, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha), ref_alpha, atol=2e-5)
    np.testing.assert_allclose(np.asarray(depth), ref_depth, atol=2e-4, rtol=1e-4)


def test_sorted_matches_oracle():
    g = random_scene(29, seed=7)
    c = orbit_camera(W, H, index=1)
    cfg = RenderConfig(width=W, height=H, impl="jnp", mode="sorted",
                       return_aux=True, background=(0.02, 0.02, 0.02),
                       chunk_size=8)
    image, alpha, _ = render(g, c, cfg)
    ref_img, ref_alpha, _ = np_oracle.render_sorted(
        *_oracle_args(g, c), W, H, background=(0.02, 0.02, 0.02)
    )
    np.testing.assert_allclose(np.asarray(image), ref_img, atol=3e-5)
    np.testing.assert_allclose(np.asarray(alpha), ref_alpha, atol=3e-5)


def test_alive_mask_equals_dropping_rows():
    """Rendering with alive=0 rows must equal rendering without those rows
    (the fixed-capacity contract)."""
    g = random_scene(40, seed=11, alive_frac=0.6)
    c = orbit_camera(W, H, index=2)
    cfg = RenderConfig(width=W, height=H, impl="jnp", chunk_size=16)
    img_masked = render(g, c, cfg)

    keep = np.asarray(g.alive) > 0.5
    g_dense = make_gaussians(
        np.asarray(g.means)[keep], np.asarray(g.scales)[keep],
        np.asarray(g.opacities)[keep], colors=np.asarray(g.colors)[keep],
    )
    img_dense = render(g_dense, c, cfg)
    np.testing.assert_allclose(
        np.asarray(img_masked), np.asarray(img_dense), atol=1e-6
    )


def test_behind_camera_gaussians_are_culled():
    """ndc_z outside [-1,1] must not contribute (torch_renderer.py:75)."""
    means = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 100.0]], dtype=np.float32)
    g = make_gaussians(
        means, np.full((2, 3), 0.1, np.float32), np.array([0.9, 0.9], np.float32),
        colors=np.full((2, 3), 1.0, np.float32),
    )
    c = orbit_camera(W, H)
    cfg = RenderConfig(width=W, height=H, impl="jnp", return_aux=True)
    _, alpha, _ = render(g, c, cfg)
    g1 = make_gaussians(
        means[:1], np.full((1, 3), 0.1, np.float32), np.array([0.9], np.float32),
        colors=np.full((1, 3), 1.0, np.float32),
    )
    _, alpha1, _ = render(g1, c, cfg)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha1), atol=1e-6)


def test_batched_camera_equals_loop():
    from tpu_gaussians.core import camera as cam

    g = random_scene(20, seed=5)
    cams = cam.orbit_cameras(3, W, H)
    cfg = RenderConfig(width=W, height=H, impl="jnp", chunk_size=16)
    batched = render(g, cams, cfg)
    assert batched.shape == (3, H, W, 3)
    for i in range(3):
        single = render(g, cams[i], cfg)
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single), atol=1e-6
        )


def test_gradients_match_finite_differences():
    g = random_scene(8, seed=13)
    c = orbit_camera(W, H)
    cfg = RenderConfig(width=W, height=H, impl="jnp", chunk_size=8)
    target = jnp.zeros((H, W, 3), dtype=jnp.float32) + 0.25

    def loss_fn(means, scales, colors, opacities):
        gg = g.replace(means=means, scales=scales, colors=colors,
                       opacities=opacities)
        img = render(gg, c, cfg)
        return jnp.mean(jnp.abs(img - target))

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(
        g.means, g.scales, g.colors, g.opacities
    )
    # Finite differences on a few coordinates of each parameter.
    rng = np.random.default_rng(0)
    args = [np.asarray(a, dtype=np.float64)
            for a in (g.means, g.scales, g.colors, g.opacities)]

    def loss_np(arrs):
        v = loss_fn(*[jnp.asarray(a, jnp.float32) for a in arrs])
        return float(v)

    eps = 1e-3
    for ai, grad in enumerate(grads):
        flat = args[ai].reshape(-1)
        for idx in rng.choice(flat.size, size=min(4, flat.size), replace=False):
            pert = [a.copy() for a in args]
            pert[ai].reshape(-1)[idx] += eps
            up = loss_np(pert)
            pert[ai].reshape(-1)[idx] -= 2 * eps
            down = loss_np(pert)
            fd = (up - down) / (2 * eps)
            got = float(np.asarray(grad).reshape(-1)[idx])
            assert abs(fd - got) < 5e-3, (
                f"param {ai} idx {idx}: fd={fd:.6f} grad={got:.6f}"
            )


def test_zero_capacity_edge():
    g = random_scene(4, seed=1)
    g = g.replace(alive=jnp.zeros((4,), jnp.float32))
    c = orbit_camera(W, H)
    cfg = RenderConfig(width=W, height=H, impl="jnp", return_aux=True,
                       background=(0.5, 0.5, 0.5))
    image, alpha, depth = render(g, c, cfg)
    np.testing.assert_allclose(np.asarray(image), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=1e-6)


def test_validation_rejects_bad_shapes():
    from tpu_gaussians.core.types import validate_gaussians

    g = random_scene(4)
    with pytest.raises(ValueError):
        validate_gaussians(g.replace(scales=g.scales[:2]))
    with pytest.raises(ValueError):
        validate_gaussians(g.replace(colors=None))
