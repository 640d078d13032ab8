"""Tracing / profiling / numerics-debug utilities.

The reference has none of these (SURVEY.md §5): progress bars and prints
were its entire observability story.  TPU-native equivalents:
  * ``trace(...)``: context manager around ``jax.profiler`` traces
    (view in TensorBoard / xprof)
  * ``annotate(name)``: a ``TraceAnnotation`` for labelling train-step
    phases inside the device timeline
  * ``Throughput``: a small rays/sec + step-time meter with EMA
  * ``debug_nans(enable)``: toggles ``jax_debug_nans`` (the equivalent of
    the reference's NaN-loss guards, but at the op level)
  * ``StepTimer``: wall-clock phase timing with ``block_until_ready``
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation that shows up on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


class Throughput:
    """Rays/sec and step-time meter with exponential moving averages."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.rays_per_sec: Optional[float] = None
        self.step_time: Optional[float] = None
        self._last: Optional[float] = None
        self.total_rays = 0
        self.total_time = 0.0

    def step(self, n_rays: int) -> None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            rps = n_rays / max(dt, 1e-9)
            self.step_time = (dt if self.step_time is None
                              else self.ema * self.step_time
                              + (1 - self.ema) * dt)
            self.rays_per_sec = (rps if self.rays_per_sec is None
                                 else self.ema * self.rays_per_sec
                                 + (1 - self.ema) * rps)
            self.total_rays += n_rays
            self.total_time += dt
        self._last = now

    def summary(self) -> Dict[str, float]:
        return {
            "rays_per_sec_ema": self.rays_per_sec or 0.0,
            "step_time_ema": self.step_time or 0.0,
            "rays_per_sec_total": self.total_rays / max(self.total_time,
                                                        1e-9),
        }


class StepTimer:
    """Accumulates wall-clock time per named phase (blocks on results)."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.times[name] = self.times.get(name, 0.0) + (
            time.perf_counter() - t0)
