"""Debug configuration (SURVEY.md §5 race/sanitizer row).

Pallas kernels are race-free by construction (no cross-tile mutation);
the debug aids here are:
- `interpret_mode()`: force all Pallas kernels through the interpreter
  (runs the same kernel code on CPU, numerically checkable).
- `assert_finite(tree, name)`: checkify-free NaN/Inf guard usable inside
  jitted code via `jax.debug` semantics (error surfaces on fetch), or
  eagerly outside jit.
- `determinism_check(fn, *args)`: golden determinism — same inputs must
  produce bitwise-identical outputs across two runs (the analog of the
  reference's implicit atomicAdd-ordering question, which TPU kernels do
  not have).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def assert_finite(tree, name: str = "value") -> None:
    for i, leaf in enumerate(jax.tree.leaves(tree)):
        ok = bool(jnp.all(jnp.isfinite(leaf)))
        if not ok:
            raise FloatingPointError(f"non-finite values in {name}[leaf {i}]")


def determinism_check(fn, *args) -> bool:
    """Run fn twice; return True iff all outputs are bitwise identical."""
    a = jax.tree.leaves(fn(*args))
    b = jax.tree.leaves(fn(*args))
    return all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, b)
    )
