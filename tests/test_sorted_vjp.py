"""Gradient parity of the fused Pallas sorted-compositing VJP.

Oracle: jax.grad through the pure-jnp composite_sorted (differentiable via
autodiff through the fixed permutation + cumprod). The Pallas path's
hand-fused backward (ops/pallas/sorted.py _sorted_bwd_kernel) must agree
on every gaussian-field gradient, and on finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_gaussians.core import camera as cam
from tpu_gaussians.core.types import Gaussians, RenderConfig
from tpu_gaussians.ops.dispatch import render_sorted

from tests.utils import random_scene


def _loss(impl, width=64, height=48):
    config = RenderConfig(width=width, height=height, impl=impl,
                          mode="sorted")

    def f(g, view, proj, wi, wa):
        img, alpha, _ = render_sorted(g, view, proj, config)
        return jnp.sum(img * wi) + jnp.sum(alpha * wa)

    return f


@pytest.mark.parametrize("seed,n", [(0, 40), (1, 200), (7, 513)])
def test_sorted_grad_matches_jnp_oracle(seed, n):
    g = random_scene(n, seed=seed)
    c = cam.orbit_cameras(1, 64, 48)
    view, proj = c.view[0], c.proj[0]
    ks = jax.random.split(jax.random.PRNGKey(seed + 100), 2)
    wi = jax.random.normal(ks[0], (48, 64, 3))
    wa = jax.random.normal(ks[1], (48, 64))

    gp = jax.grad(_loss("pallas"))(g, view, proj, wi, wa)
    gj = jax.grad(_loss("jnp"))(g, view, proj, wi, wa)

    for name in ("means", "scales", "colors", "opacities"):
        got = np.asarray(getattr(gp, name))
        want = np.asarray(getattr(gj, name))
        scale = max(1e-3, float(np.abs(want).max()))
        np.testing.assert_allclose(
            got, want, rtol=2e-3, atol=2e-4 * scale,
            err_msg=f"grad mismatch for {name}")


def test_sorted_grad_finite_difference():
    g = random_scene(24, seed=3)
    c = cam.orbit_cameras(1, 32, 32)
    view, proj = c.view[0], c.proj[0]
    wi = jnp.ones((32, 32, 3))
    wa = jnp.zeros((32, 32))

    f = _loss("pallas", 32, 32)
    grad = jax.grad(f)(g, view, proj, wi, wa)

    eps = 1e-3
    rng = np.random.RandomState(0)
    for _ in range(4):
        i = rng.randint(24)
        d = rng.randint(3)
        dm = jnp.zeros_like(g.means).at[i, d].set(eps)
        fp = f(g.replace(means=g.means + dm), view, proj, wi, wa)
        fm = f(g.replace(means=g.means - dm), view, proj, wi, wa)
        fd = (fp - fm) / (2 * eps)
        an = grad.means[i, d]
        assert abs(float(fd - an)) <= 2e-2 * max(1.0, abs(float(fd))), (
            f"fd {float(fd)} vs analytic {float(an)} at means[{i},{d}]")


@pytest.mark.parametrize("seed,n", [(2, 48), (5, 257)])
def test_sorted_depth_value_and_grad_parity(seed, n):
    """The sorted expected-depth aux agrees between pallas and the jnp
    oracle (VERDICT round-1 item #5: feats row 4 already carries z, the
    kernel emits sum T*a*z for free), in value AND in gradient."""
    g = random_scene(n, seed=seed)
    c = cam.orbit_cameras(1, 64, 48)
    view, proj = c.view[0], c.proj[0]

    # The resolve num/(alpha + 1e-6) amplifies tiny float diffs where
    # alpha ~ 1e-6 (empty pixels; same amplification exists in the
    # reference's own depth aux) — weight the comparison and the test
    # loss by covered pixels only.
    aj, dj = render_sorted(g, view, proj,
                           RenderConfig(width=64, height=48, impl="jnp",
                                        mode="sorted"))[1:]
    ap, dp = render_sorted(g, view, proj,
                           RenderConfig(width=64, height=48, impl="pallas",
                                        mode="sorted"))[1:]
    covered = jnp.asarray(np.asarray(aj) > 0.05, jnp.float32)
    np.testing.assert_allclose(np.asarray(dp * covered),
                               np.asarray(dj * covered),
                               rtol=1e-4, atol=1e-4)

    wd = jax.random.normal(jax.random.PRNGKey(seed), (48, 64)) * covered

    def f(impl):
        config = RenderConfig(width=64, height=48, impl=impl, mode="sorted")

        def loss(gg):
            _, _, depth = render_sorted(gg, view, proj, config)
            return jnp.sum(depth * wd)

        return loss

    gp = jax.grad(f("pallas"))(g)
    gj = jax.grad(f("jnp"))(g)
    for name in ("means", "scales", "opacities"):
        got = np.asarray(getattr(gp, name))
        want = np.asarray(getattr(gj, name))
        scale = max(1e-3, float(np.abs(want).max()))
        np.testing.assert_allclose(
            got, want, rtol=2e-3, atol=2e-4 * scale,
            err_msg=f"depth-grad mismatch for {name}")


def test_sorted_mode_depth_supervision_runs():
    """Config #4's full loss stack (L1 + silhouette + depth) now runs in
    sorted mode (VERDICT item #5 lifted the fit/loss.py restriction)."""
    from tpu_gaussians.fit.loss import LossConfig, loss_fn
    from tpu_gaussians.models.gaussian_model import init_params

    raw = init_params(jax.random.PRNGKey(0), 32, 48)
    c = cam.orbit_cameras(2, 32, 32)
    targets = jnp.full((2, 32, 32, 3), 0.4)
    masks = jnp.ones((2, 32, 32))
    depths = jnp.full((2, 32, 32), 0.5)
    rc = RenderConfig(width=32, height=32, impl="jnp", mode="sorted",
                      chunk_size=16)
    lc = LossConfig(depth_weight=0.05)

    loss, metrics = loss_fn(raw, c, targets, masks, depths, rc, lc)
    assert np.isfinite(float(loss))
    assert float(metrics["depth"]) > 0.0
    grads = jax.grad(
        lambda r: loss_fn(r, c, targets, masks, depths, rc, lc)[0]
    )(raw)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(grads))


def test_sorted_training_step_decreases_loss():
    """A few Adam steps through the sorted pallas path reduce an L1 loss
    toward a target rendered by the jnp sorted oracle."""
    import optax

    g_target = random_scene(60, seed=11)
    c = cam.orbit_cameras(2, 48, 48)
    config_j = RenderConfig(width=48, height=48, impl="jnp", mode="sorted")
    config_p = RenderConfig(width=48, height=48, impl="pallas",
                            mode="sorted")

    targets = jnp.stack([
        render_sorted(g_target, c.view[v], c.proj[v], config_j)[0]
        for v in range(2)])

    g0 = random_scene(60, seed=12)
    params = {"means": g0.means, "colors": g0.colors,
              "opacities": g0.opacities}

    def loss(p):
        g = g0.replace(**p)
        pred = jnp.stack([
            render_sorted(g, c.view[v], c.proj[v], config_p)[0]
            for v in range(2)])
        return jnp.mean(jnp.abs(pred - targets))

    tx = optax.adam(0.02)
    state = tx.init(params)
    l0 = None
    vg = jax.jit(jax.value_and_grad(loss))
    for _ in range(12):
        lv, gr = vg(params)
        if l0 is None:
            l0 = float(lv)
        up, state = tx.update(gr, state)
        params = jax.tree.map(lambda a, u: a + u, params, up)
    l1 = float(loss(params))
    assert l1 < l0 * 0.85, (l0, l1)
