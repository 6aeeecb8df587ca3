"""Parameterization parity with _build_params (fit_multiview_stub.py:114-137):
init distributions, activations, capacity layout."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_gaussians.models.gaussian_model import activate, init_params


def test_init_distributions_and_layout():
    raw = init_params(jax.random.PRNGKey(0), 500, 800, use_sh=False)
    assert raw.capacity == 800
    means = np.asarray(raw.means)
    # Alive rows ~ U(-0.6, 0.6) (reference: (rand-0.5)*1.2)
    assert means[:500].min() >= -0.6 and means[:500].max() <= 0.6
    assert abs(means[:500].mean()) < 0.05
    np.testing.assert_array_equal(means[500:], 0.0)
    np.testing.assert_allclose(np.asarray(raw.scales_raw), -2.2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(raw.opacities_raw), -2.2, atol=1e-6)
    cr = np.asarray(raw.colors_raw)
    assert cr[:500].min() >= 0.0 and cr[:500].max() <= 0.1
    alive = np.asarray(raw.alive)
    np.testing.assert_array_equal(alive, (np.arange(800) < 500).astype(np.float32))


def test_init_sh():
    raw = init_params(jax.random.PRNGKey(1), 100, 200, use_sh=True)
    sh = np.asarray(raw.sh_raw)
    assert sh.shape == (200, 4, 3)
    assert sh[:100, 0].max() <= 0.1 and sh[:100, 0].min() >= 0.0
    np.testing.assert_array_equal(sh[:, 1:], 0.0)
    assert raw.use_sh and raw.colors_raw is None


def test_activation_formulas():
    raw = init_params(jax.random.PRNGKey(2), 50, 50)
    g = activate(raw)
    sr = np.asarray(raw.scales_raw, dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(g.scales), np.log1p(np.exp(sr)) + 1e-3, rtol=1e-5
    )
    opr = np.asarray(raw.opacities_raw, dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(g.opacities), 1.0 / (1.0 + np.exp(-opr)), rtol=1e-5
    )
    cr = np.asarray(raw.colors_raw, dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(g.colors), 1.0 / (1.0 + np.exp(-cr)), rtol=1e-5
    )


def test_trainable_excludes_alive():
    raw = init_params(jax.random.PRNGKey(3), 10, 20)
    tr = raw.trainable()
    assert set(tr) == {"means", "scales_raw", "opacities_raw", "colors_raw"}
    raw2 = raw.with_trainable({k: v + 1.0 for k, v in tr.items()})
    np.testing.assert_array_equal(np.asarray(raw2.alive), np.asarray(raw.alive))
    np.testing.assert_allclose(
        np.asarray(raw2.means), np.asarray(raw.means) + 1.0
    )
