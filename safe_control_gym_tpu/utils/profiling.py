"""Profiling & tracing utilities.

The reference's only instrumentation is scattered wall-clock prints
(SURVEY §5: opti t_wall, ppo elapsed_time, render speed-up factor). The TPU
framework upgrades this to a small subsystem:

* ``Timer`` / ``timed`` — accumulating per-phase wall-clock timers (the
  t_wall/elapsed_time role) with a summary table;
* ``trace`` — context manager around ``jax.profiler`` emitting a TensorBoard
  trace of device execution (XLA ops, fusion boundaries, HBM transfers);
* ``annotate`` — named TraceAnnotation for marking phases inside traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

__all__ = ['Timer', 'timed', 'trace', 'annotate']


class Timer:
    """Accumulating named wall-clock timers."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, block: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block:
                # Ensure device work launched in the phase is included.
                try:
                    jax.effects_barrier()
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        lines = [f'{"phase":<28}{"total_s":>10}{"calls":>8}{"mean_ms":>10}']
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            tot = self.totals[name]
            n = self.counts[name]
            lines.append(f'{name:<28}{tot:>10.3f}{n:>8}{tot / n * 1e3:>10.2f}')
        return '\n'.join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


#: process-global default timer
timed = Timer()


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device-execution trace viewable in TensorBoard
    (tensorboard --logdir <log_dir>; 'profile' tab)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation that shows up inside profiler traces."""
    return jax.profiler.TraceAnnotation(name)
