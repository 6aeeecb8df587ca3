"""Checkpoint/resume — the subsystem the reference lacks entirely
(SURVEY.md §5: reference saves only a final npz with no resume path,
fit_multiview_stub.py:339-355).

Orbax-backed periodic checkpoints of the full training state: raw params,
Adam state, step counter, PRNG key, and grad stats. Checkpoints live under
<out_dir>/checkpoints/<step>/ with retention of the latest few; `resume`
restores the latest. The final npz export (reference schema) remains
separate in io/npz.py.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


class Checkpointer:
    def __init__(self, directory: Path, max_to_keep: int = 3):
        ocp = _ocp()
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, key: jax.Array) -> None:
        ocp = _ocp()
        payload = {"state": state, "key": key}
        self.manager.save(step, args=ocp.args.StandardSave(payload))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, abstract_state: Any, abstract_key: jax.Array
                ) -> Tuple[int, Any, jax.Array]:
        """Restore the latest checkpoint given abstract (shape/dtype)
        templates of the state pytree."""
        ocp = _ocp()
        step = self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        template = {
            "state": jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                abstract_state,
            ),
            "key": jax.ShapeDtypeStruct(abstract_key.shape, abstract_key.dtype),
        }
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        return step, restored["state"], restored["key"]

    def close(self):
        self.manager.close()
