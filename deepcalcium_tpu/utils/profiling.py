"""Profiling hooks: jax.profiler traces + throughput counters.

The reference had no profiling beyond wall-clock prints (SURVEY §5). Here:
- :func:`trace` wraps a block in a ``jax.profiler`` trace (viewable in
  TensorBoard / Perfetto) when a directory is given, and is a no-op
  otherwise — callers can always wrap.
- :class:`ThroughputMeter` accumulates items/sec per phase (frames, px,
  windows) for the BASELINE-style reporting.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Profile the enclosed block to ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-span inside an active profiler trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


class ThroughputMeter:
    """Accumulate per-phase item counts and wall time; report rates."""

    def __init__(self):
        self._items: dict[str, float] = {}
        self._secs: dict[str, float] = {}

    @contextlib.contextmanager
    def track(self, phase: str, items: float):
        tic = time.perf_counter()
        yield
        self._secs[phase] = self._secs.get(phase, 0.0) + time.perf_counter() - tic
        self._items[phase] = self._items.get(phase, 0.0) + items

    def rates(self) -> dict:
        return {
            k: (self._items[k] / self._secs[k] if self._secs[k] > 0 else 0.0)
            for k in self._items
        }
