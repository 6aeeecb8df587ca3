"""Pallas kernel parity vs the pure-jnp oracle (SURVEY.md §4 kernel tests):
forward accumulation, fused VJP vs jax.grad, end-to-end render + fit-step
agreement. On CPU these run the same kernels in interpret mode; set
TPUGS_TEST_TPU=1 to run compiled on hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_gaussians.core.types import RenderConfig
from tpu_gaussians.ops.common import prepare_splats
from tpu_gaussians.ops.dispatch import render
from tpu_gaussians.ops.jnp_renderer import accumulate_jnp
from tpu_gaussians.ops.pallas.splat import splat_accumulate

from .utils import orbit_camera, random_scene

W, H = 40, 24  # small: interpret mode is slow


def _splat_inputs(n=30, seed=0, use_sh=False):
    g = random_scene(n, seed=seed, use_sh=use_sh)
    c = orbit_camera(W, H)
    return prepare_splats(g, c.view, c.proj, W, H), g, c


def test_forward_matches_jnp():
    s, _, _ = _splat_inputs(37, seed=2)
    acc_ref = np.asarray(accumulate_jnp(s, H, W, chunk=16))
    acc_pal = np.asarray(splat_accumulate(s, H, W))
    np.testing.assert_allclose(acc_pal, acc_ref, rtol=1e-5, atol=1e-5)


def test_vjp_matches_autodiff():
    s, _, _ = _splat_inputs(23, seed=4)
    hw = H * W
    rng = np.random.default_rng(0)
    g_out = jnp.asarray(rng.normal(size=(hw, 5)).astype(np.float32))

    def f_jnp(px, py, ca, cb, cc, op, feats):
        acc = accumulate_jnp(
            s._replace(px=px, py=py, conic_a=ca, conic_b=cb, conic_c=cc,
                       op_eff=op, feats=feats), H, W, chunk=16
        )
        return jnp.sum(acc * g_out)

    def f_pal(px, py, ca, cb, cc, op, feats):
        acc = splat_accumulate(
            s._replace(px=px, py=py, conic_a=ca, conic_b=cb, conic_c=cc,
                       op_eff=op, feats=feats), H, W
        )
        return jnp.sum(acc * g_out)

    args = (s.px, s.py, s.conic_a, s.conic_b, s.conic_c, s.op_eff, s.feats)
    grads_ref = jax.grad(f_jnp, argnums=tuple(range(7)))(*args)
    grads_pal = jax.grad(f_pal, argnums=tuple(range(7)))(*args)
    names = ["px", "py", "ca", "cb", "cc", "op", "feats"]
    for name, a, b in zip(names, grads_pal, grads_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"grad mismatch for {name}",
        )


@pytest.mark.parametrize("use_sh", [False, True])
def test_end_to_end_render_parity(use_sh):
    g = random_scene(33, seed=6, use_sh=use_sh)
    c = orbit_camera(W, H, index=1)
    cfg_j = RenderConfig(width=W, height=H, impl="jnp", return_aux=True,
                         background=(0.1, 0.0, 0.2), chunk_size=16)
    cfg_p = cfg_j.replace(impl="pallas")
    img_j, al_j, d_j = render(g, c, cfg_j)
    img_p, al_p, d_p = render(g, c, cfg_p)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_j),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_p), np.asarray(al_j),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_j),
                               rtol=1e-4, atol=1e-4)


def test_full_loss_grad_parity():
    """End-to-end: grads of an L1 loss through the full render pipeline
    (projection+SH+activation chained through the custom VJP)."""
    g = random_scene(21, seed=8, use_sh=True)
    c = orbit_camera(W, H)
    target = jnp.linspace(0, 1, H * W * 3).reshape(H, W, 3).astype(jnp.float32)

    def loss(means, scales, sh, opacities, impl):
        gg = g.replace(means=means, scales=scales, sh=sh, opacities=opacities)
        cfg = RenderConfig(width=W, height=H, impl=impl, chunk_size=16)
        img = render(gg, c, cfg)
        return jnp.mean(jnp.abs(img - target))

    args = (g.means, g.scales, g.sh, g.opacities)
    gj = jax.grad(lambda *a: loss(*a, "jnp"), argnums=(0, 1, 2, 3))(*args)
    gp = jax.grad(lambda *a: loss(*a, "pallas"), argnums=(0, 1, 2, 3))(*args)
    for name, a, b in zip(["means", "scales", "sh", "op"], gp, gj):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5,
            err_msg=f"grad mismatch for {name}",
        )


def test_separable_forward_matches_jnp():
    """axis=True routes through the rank-1 separable kernels; the axis
    footprint's conic_b is identically zero, which is the contract."""
    s, _, _ = _splat_inputs(37, seed=2)
    assert float(jnp.max(jnp.abs(s.conic_b))) == 0.0
    acc_ref = np.asarray(accumulate_jnp(s, H, W, chunk=16))
    acc_pal = np.asarray(splat_accumulate(s, H, W, axis=True))
    np.testing.assert_allclose(acc_pal, acc_ref, rtol=1e-5, atol=1e-5)


def test_separable_vjp_matches_autodiff():
    s, _, _ = _splat_inputs(23, seed=4)
    hw = H * W
    rng = np.random.default_rng(0)
    g_out = jnp.asarray(rng.normal(size=(hw, 5)).astype(np.float32))

    def f_jnp(px, py, ca, cc, op, feats):
        acc = accumulate_jnp(
            s._replace(px=px, py=py, conic_a=ca, conic_c=cc,
                       op_eff=op, feats=feats), H, W, chunk=16
        )
        return jnp.sum(acc * g_out)

    def f_pal(px, py, ca, cc, op, feats):
        acc = splat_accumulate(
            s._replace(px=px, py=py, conic_a=ca, conic_c=cc,
                       op_eff=op, feats=feats), H, W, axis=True
        )
        return jnp.sum(acc * g_out)

    args = (s.px, s.py, s.conic_a, s.conic_c, s.op_eff, s.feats)
    grads_ref = jax.grad(f_jnp, argnums=tuple(range(6)))(*args)
    grads_pal = jax.grad(f_pal, argnums=tuple(range(6)))(*args)
    names = ["px", "py", "ca", "cc", "op", "feats"]
    for name, a, b in zip(names, grads_pal, grads_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"grad mismatch for {name}",
        )


def test_large_n_padding():
    """N not a multiple of the gaussian block; HW not a multiple of the
    pixel tile."""
    s, _, _ = _splat_inputs(130, seed=9)
    acc_ref = np.asarray(accumulate_jnp(s, H, W, chunk=64))
    acc_pal = np.asarray(splat_accumulate(s, H, W))
    np.testing.assert_allclose(acc_pal, acc_ref, rtol=1e-5, atol=1e-5)
