"""Checkpoint/resume (SURVEY.md §5): periodic orbax saves, restore of the
full training state, and resumed-fit equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_gaussians.core import camera as cam
from tpu_gaussians.core.types import RenderConfig
from tpu_gaussians.fit.step import init_state, make_optimizer
from tpu_gaussians.fit.trainer import fit
from tpu_gaussians.models.gaussian_model import init_params
from tpu_gaussians.utils.config import FitConfig

W = H = 24


def test_save_restore_roundtrip(tmp_path):
    ocp = pytest.importorskip("orbax.checkpoint")
    from tpu_gaussians.io.checkpoint import Checkpointer

    tx = make_optimizer(0.02)
    raw = init_params(jax.random.PRNGKey(0), 10, 16)
    state = init_state(raw, tx)
    key = jax.random.PRNGKey(42)

    ckpt = Checkpointer(tmp_path / "ckpts")
    ckpt.save(7, state, key)
    assert ckpt.latest_step() == 7

    raw2 = init_params(jax.random.PRNGKey(99), 10, 16)  # different template
    state2 = init_state(raw2, tx)
    step, restored, rkey = ckpt.restore(state2, jax.random.PRNGKey(0))
    assert step == 7
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(key), np.asarray(rkey))
    ckpt.close()


def test_fit_resume(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    rng = np.random.default_rng(0)
    targets = rng.uniform(size=(2, H, W, 3)).astype(np.float32)
    cams = cam.orbit_cameras(2, W, H)

    base = dict(iters=20, width=W, height=H, num_gaussians=12,
                max_gaussians=16, densify_interval=1000,
                prune_interval=1000, impl="jnp", silhouette_weight=0.0,
                log_every=1000, seed=3, checkpoint_every=10)

    # Full run.
    out_full = tmp_path / "full"
    r_full = fit(FitConfig(**base), targets, cams, out_dir=out_full)

    # Interrupted run: 10 iters, checkpointed, then resumed to 20.
    out_res = tmp_path / "resumed"
    fit(FitConfig(**{**base, "iters": 10}), targets, cams, out_dir=out_res)
    r_res = fit(FitConfig(**{**base, "resume": True}), targets, cams,
                out_dir=out_res)

    np.testing.assert_allclose(
        np.asarray(r_res.raw.means), np.asarray(r_full.raw.means),
        rtol=1e-5, atol=1e-6,
    )
    assert len(r_res.loss_log) == 10  # only the resumed segment
