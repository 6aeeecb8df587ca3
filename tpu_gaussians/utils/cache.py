"""Persistent XLA compilation cache.

Compilation through the TPU runtime is expensive (minutes for the fused
train step); the persistent cache makes repeat runs start in seconds.
Called by the CLIs, bench.py and __graft_entry__. Respects
JAX_COMPILATION_CACHE_DIR when already set.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(directory: str | None = None) -> None:
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured it
    if directory is None:
        directory = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "tpu_gaussians", "xla",
        )
    Path(directory).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these options
