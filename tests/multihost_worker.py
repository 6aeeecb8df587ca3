"""Worker for the multi-host smoke test: one process of a 2-process
jax.distributed run executing the sharded train step on a global mesh.

Usage: python -m tests.multihost_worker <process_id> <num_processes> <port> \
           [impl] [variant]
  impl     "jnp" (default) or "pallas" (interpret mode on the CPU devices)
  variant  "gspmd" (default: jit + NamedSharding) or "shardmap"
Prints "LOSS <value>" computed over the GLOBAL view batch.
"""

import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    impl = sys.argv[4] if len(sys.argv) > 4 else "jnp"
    variant = sys.argv[5] if len(sys.argv) > 5 else "gspmd"
    os.environ.pop("JAX_PLATFORMS", None)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import RenderConfig
    from tpu_gaussians.fit.loss import LossConfig
    from tpu_gaussians.fit.step import init_state, make_optimizer, \
        make_train_step
    from tpu_gaussians.models.gaussian_model import init_params
    from tpu_gaussians.parallel.mesh import make_mesh, replicated, \
        view_sharding
    from tpu_gaussians.parallel.sharded import make_sharded_train_step

    W = H = 16
    V = 4
    devices = jax.devices()
    assert len(devices) == 2 * nproc, f"expected global devices, got {devices}"
    mesh = make_mesh(len(devices), 1, devices=devices)

    # Deterministic inputs, identical in every process.
    raw = init_params(jax.random.PRNGKey(0), 24, 32)
    cams = cam.orbit_cameras(V, W, H)
    targets_np = np.random.default_rng(0).uniform(
        size=(V, H, W, 3)).astype(np.float32)
    zeros_np = np.zeros((V, H, W), np.float32)

    def globalize(np_arr, sharding):
        return jax.make_array_from_callback(
            np_arr.shape, sharding, lambda idx: np_arr[idx])

    repl = replicated(mesh)
    tx = make_optimizer(0.02)
    state = jax.tree.map(
        lambda a: globalize(np.asarray(a), repl), init_state(raw, tx))
    cams_g = cam.Camera(
        view=globalize(np.asarray(cams.view), view_sharding(mesh, 3)),
        proj=globalize(np.asarray(cams.proj), view_sharding(mesh, 3)),
    )
    targets = globalize(targets_np, view_sharding(mesh, 4))
    zeros = globalize(zeros_np, view_sharding(mesh, 3))

    rc = RenderConfig(width=W, height=H, impl=impl, chunk_size=8,
                      return_aux=True)
    if variant == "shardmap":
        from tpu_gaussians.parallel.sharded import make_shardmap_train_step
        step = make_shardmap_train_step(tx, rc, LossConfig(), False, False,
                                        mesh)
    else:
        step = make_sharded_train_step(tx, rc, LossConfig(), False, False,
                                       mesh)
    new_state, metrics = step(state, cams_g, targets, zeros, zeros)
    print(f"LOSS {float(metrics['loss']):.8f}", flush=True)


if __name__ == "__main__":
    main()
