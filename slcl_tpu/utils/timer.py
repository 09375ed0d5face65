"""Wall-clock tracing helpers (reference utils/timer.py:4-55) + an optional
jax.profiler trace context for real TPU profiling."""
from __future__ import annotations

import contextlib
import functools
import time
from typing import Dict, Optional


def timeit(fn):
    """Print wall-clock of the wrapped call (reference @timer.timeit)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        print(f"[timeit] {fn.__qualname__}: {time.perf_counter() - t0:.3f}s")
        return out
    return wrapper


class TimeChecker:
    """Named split-timer (reference timer.py:30-55)."""

    def __init__(self):
        self._t0 = time.perf_counter()
        self._splits: Dict[str, float] = {}

    def check(self, name: str) -> float:
        now = time.perf_counter()
        dt = now - self._t0
        self._splits[name] = self._splits.get(name, 0.0) + dt
        self._t0 = now
        return dt

    def summary(self) -> Dict[str, float]:
        return dict(self._splits)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str] = None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
