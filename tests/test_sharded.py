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


def _setup(impl="jnp"):
    key = jax.random.PRNGKey(0)
    raw = init_params(key, 24, 32)
    cams = cam.orbit_cameras(V, W, H)
    targets = jnp.asarray(
        np.random.default_rng(0).uniform(size=(V, H, W, 3)).astype(np.float32)
    )
    zeros = jnp.zeros((V, H, W), jnp.float32)
    rc = RenderConfig(width=W, height=H, impl=impl, chunk_size=8,
                      return_aux=True)
    lc = LossConfig()
    tx = make_optimizer(0.02)
    return raw, cams, targets, zeros, rc, lc, tx


def _assert_states_match(s1, m1, s2, m2):
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.raw), jax.tree.leaves(s2.raw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


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
    _assert_states_match(s1, m1, s2, m2)


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
    _assert_states_match(s1, m1, s2, m2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("n_chunks", [1, 2, 4])
def test_overlapped_step_matches_barrier(n_chunks):
    """Chunked-pmean (overlapped allreduce) step == the barrier shard_map
    step == the single-device step (VERDICT r1 item #2: mean over equal
    view chunks of per-chunk pmeans equals the global mean exactly in
    real arithmetic)."""
    from tpu_gaussians.parallel.sharded import make_overlapped_train_step

    raw, cams, targets, zeros, rc, lc, tx = _setup()

    single = make_train_step(tx, rc, lc, False, False, donate=False)
    s1, m1 = single(init_state(raw, tx), cams, targets, zeros, zeros)

    mesh = make_mesh(8, 1)
    # 8 views over 8 shards -> 1 local view; n_chunks clamps to it, so
    # also exercise a 4-shard mesh with 2 local views.
    mesh4 = make_mesh(4, 1, devices=jax.devices()[:4])
    for m in (mesh, mesh4):
        stepped = make_overlapped_train_step(
            tx, rc, lc, False, False, m, n_chunks=n_chunks)
        s2, m2 = stepped(init_state(raw, tx), cams, targets, zeros, zeros)
        _assert_states_match(s1, m1, s2, m2)


# ---- the REAL kernels under the distributed step (VERDICT r1 item #1) ----
#
# Every configuration runs the Pallas kernels (interpret mode on the
# 8-device CPU mesh) inside the sharded training step and must match the
# same-impl single-device step — proving shard_map / GSPMD composition
# with pallas_call, not just with the jnp oracle.

_PALLAS_CONFIGS = [
    # (mode, accum_binned) — dense band kernels, tile-binned lists, and
    # the depth-sorted compositing kernel with its fused VJP.
    ("accum", "off"),
    ("accum", "on"),
    ("sorted", "off"),
]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("mode,binned", _PALLAS_CONFIGS)
def test_shardmap_pallas_step_matches_single(mode, binned):
    from tpu_gaussians.parallel.sharded import make_shardmap_train_step

    raw, cams, targets, zeros, rc, lc, tx = _setup(impl="pallas")
    rc = rc.replace(mode=mode, accum_binned=binned)

    single = make_train_step(tx, rc, lc, False, False, donate=False)
    s1, m1 = single(init_state(raw, tx), cams, targets, zeros, zeros)

    mesh = make_mesh(8, 1)
    sharded = make_shardmap_train_step(tx, rc, lc, False, False, mesh)
    s2, m2 = sharded(init_state(raw, tx), cams, targets, zeros, zeros)
    _assert_states_match(s1, m1, s2, m2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("mode,binned", _PALLAS_CONFIGS)
def test_gspmd_pallas_step_matches_single(mode, binned):
    """GSPMD (jit + NamedSharding) must also partition the pallas-path
    step: params replicated, views sharded."""
    raw, cams, targets, zeros, rc, lc, tx = _setup(impl="pallas")
    rc = rc.replace(mode=mode, accum_binned=binned)

    single = make_train_step(tx, rc, lc, False, False, donate=False)
    s1, m1 = single(init_state(raw, tx), cams, targets, zeros, zeros)

    mesh = make_mesh(8, 1)
    sharded = make_sharded_train_step(tx, rc, lc, False, False, mesh)
    s2, m2 = sharded(init_state(raw, tx), cams, targets, zeros, zeros)
    _assert_states_match(s1, m1, s2, m2)


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
