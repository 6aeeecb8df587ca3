"""Parity of the tile-binned accumulation path (ops/pallas/binned.py)
against the dense jnp oracle, for both values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_gaussians.core import camera as cam
from tpu_gaussians.core.types import RenderConfig
from tpu_gaussians.ops.dispatch import render_accum

from tests.utils import random_scene


def _configs(w, h):
    cb = RenderConfig(width=w, height=h, impl="pallas", accum_binned="on",
                      return_aux=True)
    cj = RenderConfig(width=w, height=h, impl="jnp", return_aux=True)
    return cb, cj


@pytest.mark.parametrize("seed,n", [(0, 300), (2, 1025)])
def test_binned_accum_matches_jnp(seed, n):
    g = random_scene(n, seed=seed)
    c = cam.orbit_cameras(1, 96, 64)
    view, proj = c.view[0], c.proj[0]
    cb, cj = _configs(96, 64)

    ib, ab, db = render_accum(g, view, proj, cb)
    ij, aj, dj = render_accum(g, view, proj, cj)
    np.testing.assert_allclose(np.asarray(ib), np.asarray(ij),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ab), np.asarray(aj),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db), np.asarray(dj),
                               rtol=1e-3, atol=1e-4)


def test_binned_accum_alpha_cull_close():
    """accum_cull="alpha" (the reference C++ w<1e-5 drop at extent level,
    renderer_cpu.cpp:113) must stay visually identical to the exact
    path: per-pixel error is bounded by the truncated sub-cutoff tails.
    Gradients stay finite and close."""
    g = random_scene(700, seed=3)
    c = cam.orbit_cameras(1, 96, 64)
    view, proj = c.view[0], c.proj[0]
    cb, _ = _configs(96, 64)
    ca = cb.replace(accum_cull="alpha")

    ie, ae, de = render_accum(g, view, proj, cb)
    ia, aa, da = render_accum(g, view, proj, ca)
    np.testing.assert_allclose(np.asarray(ia), np.asarray(ie), atol=2e-3)
    np.testing.assert_allclose(np.asarray(aa), np.asarray(ae), atol=2e-3)

    def loss(config):
        def f(gg):
            img, alpha, _ = render_accum(gg, view, proj, config)
            return jnp.mean(jnp.abs(img)) + jnp.mean(alpha)
        return f

    ga = jax.grad(loss(ca))(g)
    ge = jax.grad(loss(cb))(g)
    for name in ("means", "scales", "opacities"):
        a = np.asarray(getattr(ga, name))
        e = np.asarray(getattr(ge, name))
        assert np.all(np.isfinite(a)), name
        scale = max(1e-3, float(np.abs(e).max()))
        assert np.abs(a - e).max() <= 5e-3 * scale, (
            f"{name}: {np.abs(a - e).max():.2e} vs {scale:.2e}")


def test_binned_accum_grad_matches_jnp():
    g = random_scene(400, seed=5)
    c = cam.orbit_cameras(1, 96, 64)
    view, proj = c.view[0], c.proj[0]
    cb, cj = _configs(96, 64)
    ks = jax.random.split(jax.random.PRNGKey(9), 2)
    wi = jax.random.normal(ks[0], (64, 96, 3))
    wa = jax.random.normal(ks[1], (64, 96))

    def loss(config):
        def f(gg):
            img, alpha, depth = render_accum(gg, view, proj, config)
            return jnp.sum(img * wi) + jnp.sum(alpha * wa)
        return f

    gb = jax.grad(loss(cb))(g)
    gj = jax.grad(loss(cj))(g)
    for name in ("means", "scales", "colors", "opacities"):
        got = np.asarray(getattr(gb, name))
        want = np.asarray(getattr(gj, name))
        scale = max(1e-3, float(np.abs(want).max()))
        np.testing.assert_allclose(
            got, want, rtol=2e-3, atol=2e-4 * scale,
            err_msg=f"grad mismatch for {name}")


def test_binned_accum_sh_and_ewa():
    g = random_scene(200, seed=7, use_sh=True)
    qkey = jax.random.PRNGKey(1)
    quats = jax.random.normal(qkey, (200, 4))
    quats = quats / jnp.linalg.norm(quats, axis=1, keepdims=True)
    g = g.replace(quats=quats)
    c = cam.orbit_cameras(1, 64, 64)
    view, proj = c.view[0], c.proj[0]
    cb = RenderConfig(width=64, height=64, impl="pallas", accum_binned="on",
                      footprint="ewa")
    cj = RenderConfig(width=64, height=64, impl="jnp", footprint="ewa")
    ib = render_accum(g, view, proj, cb)[0]
    ij = render_accum(g, view, proj, cj)[0]
    np.testing.assert_allclose(np.asarray(ib), np.asarray(ij),
                               rtol=1e-4, atol=1e-5)
