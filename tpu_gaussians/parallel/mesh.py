"""Device mesh and sharding helpers — the framework's communication layer.

The reference has no distributed code at all (SURVEY.md §2 inventory
verdict); this layer is designed from the north star (BASELINE.json:5):
views/tiles sharded per chip, Gaussian parameters replicated, gradient
all-reduce inserted by GSPMD over ICI (within a slice) / DCN (across
hosts). Axis names:

  "views" — data parallelism over the multiview batch (the loss is a mean
            over views, fit_multiview_stub.py:278-308 → psum of grads)
  "rows"  — spatial parallelism over image rows (the accumulation mode is
            order-independent per pixel, so row shards are independent)

No hand-written collectives: `jax.jit` with NamedSharding-annotated inputs
lets XLA insert psum/all-gather where the einsum structure requires them.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

VIEW_AXIS = "views"
ROW_AXIS = "rows"


def make_mesh(
    n_view_shards: Optional[int] = None,
    n_row_shards: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (views, rows) mesh. Defaults to all devices on the views axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_view_shards is None:
        n_view_shards = len(devices) // n_row_shards
    n = n_view_shards * n_row_shards
    if n > len(devices):
        raise ValueError(
            f"mesh {n_view_shards}x{n_row_shards} needs {n} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[:n]).reshape(n_view_shards, n_row_shards)
    return Mesh(grid, (VIEW_AXIS, ROW_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def view_sharding(mesh: Mesh, rank: int, row_dim: Optional[int] = None) -> NamedSharding:
    """Shard axis 0 over views and (optionally) `row_dim` over rows for an
    array of the given rank (e.g. targets (V,H,W,3) with row_dim=1)."""
    spec = [None] * rank
    spec[0] = VIEW_AXIS
    if row_dim is not None and mesh.shape[ROW_AXIS] > 1:
        spec[row_dim] = ROW_AXIS
    return NamedSharding(mesh, P(*spec))


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           timeout_s: float = 120.0) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` with loud,
    bounded failure (SURVEY.md §5 failure-detection row; VERDICT round-1
    weak #5 replaced the silent except here).

    Auto-detection (no args): only attempted when the environment is
    actually multi-process-configured; an init failure in that case is
    re-raised with context instead of being swallowed. Explicit
    coordination: the coordinator handshake runs under
    `initialization_timeout` so a dead/typo'd coordinator fails in
    `timeout_s` seconds with a clear message rather than hanging the job.
    """
    import os

    already = getattr(
        getattr(jax.distributed, "global_state", None), "client", None)
    if already is not None:
        return  # initialized earlier in this process — idempotent

    if coordinator is None and num_processes is None:
        auto_env = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                    "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")
        if not any(os.environ.get(k) for k in auto_env):
            return  # single-process run: nothing to bring up
        try:
            jax.distributed.initialize(
                initialization_timeout=int(timeout_s))
        except Exception as e:  # noqa: BLE001 — re-raise with context
            raise RuntimeError(
                "multi-host auto-initialization failed although the "
                f"environment looks multi-process ({[k for k in auto_env if os.environ.get(k)]}); "
                "refusing to silently degrade to single-host"
            ) from e
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=int(timeout_s),
        )
    except Exception as e:  # noqa: BLE001 — re-raise with context
        raise RuntimeError(
            f"jax.distributed.initialize(coordinator={coordinator!r}, "
            f"num_processes={num_processes}, process_id={process_id}) "
            f"failed within {timeout_s:.0f}s — check the coordinator "
            "address/port and that every process was launched"
        ) from e
