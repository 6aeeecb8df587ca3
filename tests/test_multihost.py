"""Multi-host smoke (SURVEY.md §4): two jax.distributed processes run the
sharded train step over a global 4-device mesh; the global loss must match
a single-process computation of the same step."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).parent.parent


def _single_process_loss():
    import jax
    import jax.numpy as jnp

    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import RenderConfig
    from tpu_gaussians.fit.loss import LossConfig
    from tpu_gaussians.fit.step import init_state, make_optimizer, \
        make_train_step
    from tpu_gaussians.models.gaussian_model import init_params

    W = H = 16
    V = 4
    raw = init_params(jax.random.PRNGKey(0), 24, 32)
    cams = cam.orbit_cameras(V, W, H)
    targets = jnp.asarray(np.random.default_rng(0).uniform(
        size=(V, H, W, 3)).astype(np.float32))
    zeros = jnp.zeros((V, H, W), jnp.float32)
    rc = RenderConfig(width=W, height=H, impl="jnp", chunk_size=8,
                      return_aux=True)
    tx = make_optimizer(0.02)
    step = make_train_step(tx, rc, LossConfig(), False, False, donate=False)
    _, metrics = step(init_state(raw, tx), cams, targets, zeros, zeros)
    return float(metrics["loss"])


def test_two_process_sharded_step_matches_single():
    port = "12731"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests.multihost_worker", str(pid), "2",
             port],
            cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outputs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"

    losses = []
    for out in outputs:
        for line in out.splitlines():
            if line.startswith("LOSS "):
                losses.append(float(line.split()[1]))
    assert len(losses) == 2, f"missing LOSS lines:\n{outputs}"
    assert losses[0] == losses[1]

    ref = _single_process_loss()
    np.testing.assert_allclose(losses[0], ref, rtol=1e-5, atol=1e-6)
