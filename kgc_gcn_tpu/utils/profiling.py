"""Tracing / profiling helpers (SURVEY.md §5.1).

The reference has no profiling beyond a tqdm bar (reference main.py:56,74-75).
Here:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` for a device
    trace viewable in TensorBoard/XProf;
  * ``annotate(name)`` — a ``TraceAnnotation`` for labelling host-side spans;
  * ``StepTimer`` — throughput counter reporting steps/s and edges/s-per-chip
    (the BASELINE.json headline metric) with the host-sync caveats this
    environment needs (see BENCH_NOTES.md: always sync via a host pull).
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
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock throughput over training steps.

    ``update`` must be called after a true host sync (e.g. ``float(loss)``);
    the first interval is treated as warmup/compile and excluded.
    """

    def __init__(self, edges_per_step: int, n_chips: int = 1):
        self.edges_per_step = edges_per_step
        self.n_chips = max(1, n_chips)
        self._t0: Optional[float] = None
        self.steps = 0
        self.seconds = 0.0

    def update(self, n_steps: int = 1) -> None:
        now = time.perf_counter()
        if self._t0 is not None:
            self.seconds += now - self._t0
            self.steps += n_steps
        self._t0 = now

    def add(self, seconds: float, n_steps: int) -> None:
        """Credit an externally-timed span (e.g. one epoch, excluding eval)."""
        self.seconds += seconds
        self.steps += n_steps

    @property
    def steps_per_s(self) -> float:
        return self.steps / self.seconds if self.seconds else 0.0

    @property
    def edges_per_s_per_chip(self) -> float:
        return self.steps_per_s * self.edges_per_step / self.n_chips

    def report(self) -> str:
        return (f"{self.steps_per_s:.1f} steps/s, "
                f"{self.edges_per_s_per_chip / 1e6:.1f} Medges/s/chip")
