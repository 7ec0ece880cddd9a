"""Throughput metering and JAX profiler helpers.

The reference has no instrumentation at all (SURVEY.md §5.1 — only a HUD text
overlay); here the north-star metric (env-steps/s/chip) gets a first-class
meter, plus a context manager around the JAX trace profiler for kernel-level
inspection in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepsPerSecond:
    """Steady-state steps/s meter; excludes the first (compile) window."""

    def __init__(self, steps_per_tick: int = 1):
        self.steps_per_tick = steps_per_tick
        self._t0: Optional[float] = None
        self._ticks = 0
        self._warm = False

    def tick(self, n: Optional[int] = None):
        now = time.perf_counter()
        if not self._warm:  # drop the compile/warmup tick
            self._warm = True
            self._t0 = now
            self._ticks = 0
            return
        self._ticks += n if n is not None else self.steps_per_tick

    @property
    def value(self) -> float:
        if self._t0 is None or self._ticks == 0:
            return 0.0
        return self._ticks / (time.perf_counter() - self._t0)


@contextlib.contextmanager
def trace_profile(logdir: str = "/tmp/mti_trace"):
    """Profile a block with the JAX/XLA trace profiler."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
