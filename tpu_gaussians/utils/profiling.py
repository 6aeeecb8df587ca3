"""Profiling & observability hooks (SURVEY.md §5: the reference has only a
hand-rolled FPS EMA, model_viewer_main.cpp:243-251 — this is the
TPU-native replacement).

- `trace(logdir)`: context manager around `jax.profiler` producing a
  TensorBoard-loadable trace of the steps inside.
- `annotate(name)`: `jax.named_scope` wrapper used around the renderer
  stages (project / splat / resolve / loss) so traces show named regions.
- `StepTimer`: EMA wall-clock per-step timer + pixels/s counter (the
  fitting-loop analog of the viewer's FPS HUD).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.named_scope(name)


class StepTimer:
    """EMA-smoothed step timing (same smoothing constants as the reference
    viewer HUD: 0.8 old / 0.2 new)."""

    def __init__(self, pixels_per_step: int = 0, ema: float = 0.8):
        self.pixels_per_step = pixels_per_step
        self.ema = ema
        self._last: Optional[float] = None
        self.step_s: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.step_s = (dt if self.step_s is None
                           else self.ema * self.step_s + (1 - self.ema) * dt)
        self._last = now
        return self.step_s

    @property
    def pixels_per_s(self) -> Optional[float]:
        if self.step_s is None or self.pixels_per_step == 0:
            return None
        return self.pixels_per_step / self.step_s
