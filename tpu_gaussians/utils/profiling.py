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


def load_trace_events(logdir: str):
    """Find the newest trace.json.gz under logdir and return its complete
    ('X') trace events restricted to device-side (TPU) process tracks."""
    import glob
    import gzip
    import json as _json
    import os

    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = _json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e["pid"]: e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()}
    if not device_pids:
        # No device-side track (CPU run / trace-format change): return
        # NOTHING rather than every host event — callers (bench.py's
        # device_us_per_step headline) must fall back to their wall-clock
        # path EXPLICITLY instead of silently labelling host durations
        # as device time (r4 advisor finding).
        return []
    return [e for e in events
            if e.get("ph") == "X" and e.get("pid") in device_pids]


def device_program_times_us(fn, prefix: str = "jit_"):
    """Run `fn()` under the profiler and return the device-side execution
    durations (microseconds) of every top-level jitted program event whose
    name starts with `prefix`, in trace order.

    This is the host-state-immune way to time an on-device program on
    this runtime: wall clocks see the relay's dispatch latency and any
    host hiccup; the profiler timeline records what the chip actually
    executed (VERDICT r3 missing #2 — the 194-vs-236 Mpix/s bimodality
    was exactly wall-vs-device disagreement).
    """
    import shutil
    import tempfile

    logdir = tempfile.mkdtemp(prefix="tpugs_devtime_")
    try:
        with trace(logdir):
            fn()
        events = load_trace_events(logdir)
        durs = [(e.get("ts", 0), float(e.get("dur", 0.0)))
                for e in events if e.get("name", "").startswith(prefix)]
        durs.sort()
        return [d for _, d in durs]
    finally:
        shutil.rmtree(logdir, ignore_errors=True)


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
