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


def _run_two_workers(port, impl="jnp", variant="gspmd", timeout=240):
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests.multihost_worker", str(pid), "2",
             port, impl, variant],
            cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outputs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"

    losses = []
    for out in outputs:
        for line in out.splitlines():
            if line.startswith("LOSS "):
                losses.append(float(line.split()[1]))
    assert len(losses) == 2, f"missing LOSS lines:\n{outputs}"
    assert losses[0] == losses[1]
    return losses[0]


def test_two_process_sharded_step_matches_single():
    loss = _run_two_workers("12731")
    ref = _single_process_loss()
    np.testing.assert_allclose(loss, ref, rtol=1e-5, atol=1e-6)


def test_two_process_pallas_interpret_step():
    """2-process shard_map step through the REAL kernels (interpret mode
    on CPU devices) — the multi-host analog of the sharded-pallas tests
    (VERDICT round-1 item #8)."""
    loss = _run_two_workers("12733", impl="pallas", variant="shardmap",
                            timeout=420)
    ref = _single_process_loss()
    # interpret-mode pallas vs the jnp single-process reference: float
    # tolerance only (different accumulation order).
    np.testing.assert_allclose(loss, ref, rtol=1e-4, atol=1e-5)


def test_dead_coordinator_fails_loudly():
    """A worker pointed at a coordinator that never comes up must fail
    within the timeout with a clear diagnostic, not hang or silently
    degrade to single-host (VERDICT round-1 weak #5). Depending on the
    JAX version the failure surfaces either as our RuntimeError wrapper
    or as the coordination client's own fatal DEADLINE_EXCEEDED abort —
    both are loud + bounded; silence or a zero exit is the bug."""
    code = (
        "from tpu_gaussians.parallel.mesh import initialize_distributed\n"
        "try:\n"
        "    initialize_distributed('localhost:1', num_processes=2,\n"
        "                           process_id=1, timeout_s=15)\n"
        "except RuntimeError as e:\n"
        "    assert 'failed within' in str(e), str(e)\n"
        "    print('LOUD_FAILURE_OK')\n"
        "else:\n"
        "    print('SILENT_DEGRADE_BUG')\n"
    )
    p = subprocess.run(
        [sys.executable, "-c", code], cwd=ROOT, capture_output=True,
        text=True, timeout=180,
    )
    assert "SILENT_DEGRADE_BUG" not in p.stdout, p.stdout
    wrapped = "LOUD_FAILURE_OK" in p.stdout
    aborted = p.returncode != 0 and (
        "DEADLINE_EXCEEDED" in p.stderr or "Deadline" in p.stderr)
    assert wrapped or aborted, (p.returncode, p.stdout, p.stderr[-500:])
