"""Densify/prune invariants vs _densify_and_prune
(fit_multiview_stub.py:140-197): prune threshold, 64-survivor floor,
capacity cap, clone count/ordering/jitter, compaction semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_gaussians.fit.densify import DensifyConfig, densify_and_prune
from tpu_gaussians.models.gaussian_model import RawParams


def _make_raw(op_raw_values, capacity=None, seed=0):
    n = len(op_raw_values)
    c = capacity or n
    rng = np.random.default_rng(seed)
    alive = (np.arange(c) < n).astype(np.float32)
    op = np.full((c,), -10.0, np.float32)
    op[:n] = op_raw_values
    return RawParams(
        means=jnp.asarray(rng.normal(size=(c, 3)).astype(np.float32)),
        scales_raw=jnp.asarray(rng.normal(size=(c, 3)).astype(np.float32)),
        opacities_raw=jnp.asarray(op),
        colors_raw=jnp.asarray(rng.uniform(size=(c, 3)).astype(np.float32)),
        alive=jnp.asarray(alive),
    )


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_prune_removes_low_opacity():
    # 100 alive: half high opacity (sigmoid(2)≈0.88), half low (sigmoid(-8)≈3e-4)
    op_raw = np.array([2.0] * 50 + [-8.0] * 50, np.float32)
    raw = _make_raw(op_raw, capacity=120)
    cfg = DensifyConfig(densify_ratio=0.0)
    new, stats = densify_and_prune(raw, jax.random.PRNGKey(0), cfg)
    assert int(stats["n_after"]) == 64  # floor: 50 pass threshold < 64 -> top-64
    # With ratio 0, no clones.
    assert int(stats["n_cloned"]) == 0
    # All 50 high-opacity survive and come first (order preserved).
    np.testing.assert_allclose(
        np.asarray(new.opacities_raw)[:50], 2.0, atol=1e-6
    )


def test_prune_threshold_above_floor():
    op_raw = np.array([2.0] * 80 + [-8.0] * 40, np.float32)
    raw = _make_raw(op_raw, capacity=200)
    cfg = DensifyConfig(densify_ratio=0.0)
    new, stats = densify_and_prune(raw, jax.random.PRNGKey(0), cfg)
    assert int(stats["n_after"]) == 80
    alive = np.asarray(new.alive)
    np.testing.assert_array_equal(alive, (np.arange(200) < 80).astype(np.float32))


def test_densify_count_and_children():
    op_raw = np.linspace(0.5, 2.5, 100).astype(np.float32)
    raw = _make_raw(op_raw, capacity=150, seed=3)
    cfg = DensifyConfig(densify_ratio=0.15)
    new, stats = densify_and_prune(raw, jax.random.PRNGKey(1), cfg)
    # All pass threshold; add_n = min(150-100, floor(100*0.15)) = 15
    assert int(stats["n_after"]) == 115
    assert int(stats["n_cloned"]) == 15

    op_new = np.asarray(new.opacities_raw)
    # Children are the top-15 by opacity (the largest op_raw values),
    # appended best-first, each with op_raw - 0.1 (:174).
    expected_parents = np.sort(op_raw)[::-1][:15]
    np.testing.assert_allclose(op_new[100:115], expected_parents - 0.1, atol=1e-5)

    # Child scales/colors copied from parents.
    parent_idx = np.argsort(-op_raw, kind="stable")[:15]
    np.testing.assert_allclose(
        np.asarray(new.scales_raw)[100:115],
        np.asarray(raw.scales_raw)[parent_idx], atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new.colors_raw)[100:115],
        np.asarray(raw.colors_raw)[parent_idx], atol=1e-6,
    )
    # Child means = parent + 0.25 * scales * noise -> bounded deviation check.
    scales_act = np.log1p(np.exp(np.asarray(raw.scales_raw)[parent_idx])) + 1e-3
    dev = np.abs(np.asarray(new.means)[100:115]
                 - np.asarray(raw.means)[parent_idx])
    assert (dev <= 0.25 * scales_act * 6.0).all()  # 6-sigma bound
    assert dev.max() > 0.0  # jitter actually applied


def test_capacity_cap():
    op_raw = np.full((95,), 2.0, np.float32)
    raw = _make_raw(op_raw, capacity=100)
    cfg = DensifyConfig(densify_ratio=0.5)
    new, stats = densify_and_prune(raw, jax.random.PRNGKey(2), cfg)
    # room = 5 < floor(95*0.5) -> capped at 5
    assert int(stats["n_cloned"]) == 5
    assert int(stats["n_after"]) == 100
    assert float(jnp.sum(new.alive_mask())) == 100.0


def test_shapes_never_change():
    raw = _make_raw(np.full((50,), 1.0, np.float32), capacity=80)
    new, _ = densify_and_prune(raw, jax.random.PRNGKey(3), DensifyConfig())
    for a, b in zip(jax.tree.leaves(raw), jax.tree.leaves(new)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_grad_metric_ranking():
    op_raw = np.full((40,), 2.0, np.float32)
    raw = _make_raw(op_raw, capacity=60, seed=5)
    grad_acc = np.zeros((60,), np.float32)
    grad_acc[:40] = np.linspace(0, 1, 40)
    cfg = DensifyConfig(densify_ratio=0.25, clone_metric="grad")
    new, stats = densify_and_prune(
        raw, jax.random.PRNGKey(4), cfg,
        grad_norm_accum=jnp.asarray(grad_acc),
        grad_steps=jnp.asarray(10, jnp.int32),
    )
    assert int(stats["n_cloned"]) == 10
    # Parents should be the 10 highest-gradient rows (indices 30..39),
    # children appended best-first.
    parent_idx = np.arange(40)[np.argsort(-grad_acc[:40], kind="stable")][:10]
    np.testing.assert_allclose(
        np.asarray(new.scales_raw)[40:50],
        np.asarray(raw.scales_raw)[parent_idx], atol=1e-6,
    )


def test_split_shrinks_parent_and_child():
    """3DGS split: clone sources above split_scale_thresh shrink by
    split_shrink in BOTH the parent row and the child row, and the child
    keeps the parent opacity (no -0.1)."""
    op_raw = np.full((20,), 2.0, np.float32)
    raw = _make_raw(op_raw, capacity=40, seed=7)
    # Make every scale huge so all clone sources split.
    raw = raw.__class__(**{**raw.__dict__,
                           "scales_raw": jnp.full((40, 3), 3.0)})
    act = np.log1p(np.exp(3.0)) + 1e-3
    cfg = DensifyConfig(densify_ratio=0.5, split_scale_thresh=act * 0.5,
                        split_shrink=1.6)
    new, stats = densify_and_prune(raw, jax.random.PRNGKey(0), cfg)
    add_n = int(stats["n_cloned"])
    assert add_n == 10
    want_act = act / 1.6
    got_child = np.log1p(np.exp(np.asarray(new.scales_raw)[20:20 + add_n])) + 1e-3
    np.testing.assert_allclose(got_child, want_act, rtol=1e-5)
    # Parents (the cloned sources) also shrunk.
    got_parent = np.log1p(np.exp(np.asarray(new.scales_raw)[:add_n])) + 1e-3
    np.testing.assert_allclose(got_parent, want_act, rtol=1e-5)
    # Split children keep opacity (clone would subtract 0.1).
    np.testing.assert_allclose(
        np.asarray(new.opacities_raw)[20:20 + add_n], 2.0, atol=1e-6)


def test_split_disabled_matches_reference_clone():
    op_raw = np.full((20,), 2.0, np.float32)
    raw = _make_raw(op_raw, capacity=40, seed=8)
    cfg0 = DensifyConfig(densify_ratio=0.5)
    cfg1 = DensifyConfig(densify_ratio=0.5, split_scale_thresh=1e9)
    a, _ = densify_and_prune(raw, jax.random.PRNGKey(1), cfg0)
    b, _ = densify_and_prune(raw, jax.random.PRNGKey(1), cfg1)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
