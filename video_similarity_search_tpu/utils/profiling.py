"""jax.profiler wiring (SURVEY §5 'Tracing / profiling').

The reference only logs wall-clock prints (online_train.py:611-629,
:429-434). Here profiling is first-class: set ``TPU.PROFILE_DIR`` (or
``$VSS_PROFILE_DIR``) and the train driver captures a jax.profiler trace of
a small window of steps in the first epoch — viewable in
TensorBoard/Perfetto/xprof — plus per-step throughput in the epoch logs.
"""

from __future__ import annotations

import os
import time
from typing import Optional


class StepProfiler:
    """Captures a jax.profiler trace over steps [start, start+num).

    No-op when ``out_dir`` is falsy. Call :meth:`step` once per train step
    with the step index; the trace starts before step ``start`` runs and
    stops after ``start + num - 1`` completes.
    """

    def __init__(self, out_dir: Optional[str], start: int = 5, num: int = 5):
        # None = "use the env var"; "" = explicitly disabled (the driver
        # passes "" for every epoch after 0 — the env fallback must NOT
        # re-enable tracing there)
        if out_dir is None:
            out_dir = os.environ.get("VSS_PROFILE_DIR", "")
        self.out_dir = out_dir
        self.start = start
        self.num = num
        self._active = False
        self._done = False

    def step(self, idx: int) -> None:
        if not self.out_dir or self._done:
            return
        import jax

        if not self._active and idx == self.start:
            os.makedirs(self.out_dir, exist_ok=True)
            jax.profiler.start_trace(self.out_dir)
            self._active = True
        elif self._active and idx >= self.start + self.num:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            self._done = True


class Throughput:
    """Per-epoch steps/sec + clips/sec meter (excludes the first, compiling
    step so the rate reflects steady state)."""

    def __init__(self):
        self.t0: Optional[float] = None
        self.steps = 0
        self.items = 0

    def tick(self, n_items: int) -> None:
        if self.t0 is None:  # first step = compile; start the clock after
            self.t0 = time.perf_counter()
            return
        self.steps += 1
        self.items += n_items

    @property
    def steps_per_sec(self) -> float:
        if self.t0 is None or self.steps == 0:
            return 0.0
        return self.steps / (time.perf_counter() - self.t0)

    @property
    def items_per_sec(self) -> float:
        if self.t0 is None or self.steps == 0:
            return 0.0
        return self.items / (time.perf_counter() - self.t0)
