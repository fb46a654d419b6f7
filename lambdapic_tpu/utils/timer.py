"""Stage timers (reference core/utils/timer.py:10-97).

``Timer`` wraps a named scope with perf_counter_ns and logs at the TIMER
level when enabled. On an asynchronous-dispatch backend like TPU the wall
time of a stage is only meaningful if the work is synchronized, so Timer
optionally calls ``block_until_ready`` on a result pytree; it also opens a
``jax.profiler.TraceAnnotation`` so stages show up in XLA profiles.
"""
from __future__ import annotations

import time
from typing import Any, Optional

import jax

from .logger import TIMER, logger

_timer_enabled = False


def set_timer_enabled(enabled: bool) -> None:
    global _timer_enabled
    _timer_enabled = enabled


def timer_enabled() -> bool:
    return _timer_enabled


class Timer:
    """Context manager timing one named scope (reference timer.py:29-97)."""

    def __init__(self, name: str, sync: Any = None, threshold_ms: float = 0.1):
        self.name = name
        self.sync = sync
        self.threshold_ms = threshold_ms
        self._trace = None

    def __enter__(self):
        if _timer_enabled:
            self._trace = jax.profiler.TraceAnnotation(self.name)
            self._trace.__enter__()
            self.start = time.perf_counter_ns()
        return self

    def __exit__(self, *exc):
        if _timer_enabled:
            if self.sync is not None:
                jax.block_until_ready(self.sync)
            elapsed_ms = (time.perf_counter_ns() - self.start) / 1e6
            if self._trace is not None:
                self._trace.__exit__(*exc)
            if elapsed_ms > self.threshold_ms:
                logger.timer(f"Rank 0 {self.name} took {elapsed_ms:.3f} ms")
        return False
