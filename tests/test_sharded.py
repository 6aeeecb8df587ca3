"""Distributed tests on the forced 8-device CPU mesh (SURVEY.md §4):
sharded fit step must match the single-device step; shardings must hold."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_gaussians.core import camera as cam
from tpu_gaussians.core.types import RenderConfig
from tpu_gaussians.fit.loss import LossConfig
from tpu_gaussians.fit.step import init_state, make_optimizer, make_train_step
from tpu_gaussians.models.gaussian_model import init_params
from tpu_gaussians.parallel.mesh import make_mesh, view_sharding
from tpu_gaussians.parallel.sharded import make_sharded_train_step

W = H = 16
V = 8


def _setup():
    key = jax.random.PRNGKey(0)
    raw = init_params(key, 24, 32)
    cams = cam.orbit_cameras(V, W, H)
    targets = jnp.asarray(
        np.random.default_rng(0).uniform(size=(V, H, W, 3)).astype(np.float32)
    )
    zeros = jnp.zeros((V, H, W), jnp.float32)
    rc = RenderConfig(width=W, height=H, impl="jnp", chunk_size=8,
                      return_aux=True)
    lc = LossConfig()
    tx = make_optimizer(0.02)
    return raw, cams, targets, zeros, rc, lc, tx


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("shard_rows", [False, True])
def test_sharded_step_matches_single_device(shard_rows):
    raw, cams, targets, zeros, rc, lc, tx = _setup()

    single = make_train_step(tx, rc, lc, False, False, donate=False)
    s1, m1 = single(init_state(raw, tx), cams, targets, zeros, zeros)

    mesh = make_mesh(4, 2) if shard_rows else make_mesh(8, 1)
    sharded = make_sharded_train_step(tx, rc, lc, False, False, mesh,
                                      shard_rows=shard_rows)
    s2, m2 = sharded(init_state(raw, tx), cams, targets, zeros, zeros)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.raw), jax.tree.leaves(s2.raw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_input_sharding_layout():
    mesh = make_mesh(8, 1)
    targets = jnp.zeros((V, H, W, 3), jnp.float32)
    sharded = jax.device_put(targets, view_sharding(mesh, 4))
    # Each device holds exactly one view shard.
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(1, H, W, 3)}


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_multi_step_convergence_sharded():
    raw, cams, targets, zeros, rc, lc, tx = _setup()
    mesh = make_mesh(8, 1)
    sharded = make_sharded_train_step(tx, rc, lc, False, False, mesh)
    state = init_state(raw, tx)
    losses = []
    for _ in range(10):
        state, m = sharded(state, cams, targets, zeros, zeros)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_shardmap_step_matches_single_device():
    """Explicit shard_map + psum variant == single-device step."""
    from tpu_gaussians.parallel.sharded import make_shardmap_train_step

    raw, cams, targets, zeros, rc, lc, tx = _setup()

    single = make_train_step(tx, rc, lc, False, False, donate=False)
    s1, m1 = single(init_state(raw, tx), cams, targets, zeros, zeros)

    mesh = make_mesh(8, 1)
    sharded = make_shardmap_train_step(tx, rc, lc, False, False, mesh)
    s2, m2 = sharded(init_state(raw, tx), cams, targets, zeros, zeros)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.raw), jax.tree.leaves(s2.raw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_trainer_num_view_shards(tmp_path):
    """The trainer's num_view_shards path produces the same fit as the
    single-device trainer."""
    from tpu_gaussians.fit.trainer import fit
    from tpu_gaussians.utils.config import FitConfig

    rng = np.random.default_rng(1)
    targets = rng.uniform(size=(8, H, W, 3)).astype(np.float32)
    cams8 = cam.orbit_cameras(8, W, H)
    base = dict(iters=6, width=W, height=H, num_gaussians=16,
                max_gaussians=24, densify_interval=1000, prune_interval=1000,
                impl="jnp", silhouette_weight=0.0, log_every=1000, seed=4)
    r1 = fit(FitConfig(**base), targets, cams8)
    r8 = fit(FitConfig(**{**base, "num_view_shards": 8}), targets, cams8)
    np.testing.assert_allclose(np.asarray(r8.raw.means),
                               np.asarray(r1.raw.means),
                               rtol=2e-4, atol=2e-6)
