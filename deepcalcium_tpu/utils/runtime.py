"""Runtime helpers: logger naming, timers, simple profiling hooks.

Parity target: reference ``utils/runtime.py:4-5`` (``funcname``). The rebuild
adds :func:`phase_timer`, used by the predict path to report views/sec
(first-class metrics per BASELINE.md; per-phase accumulation lives in
utils.profiling.ThroughputMeter, used by ingest).
"""

import contextlib
import inspect
import logging
import time


def funcname() -> str:
    """Name of the calling function, for ``logging.getLogger(funcname())``."""
    frame = inspect.currentframe()
    try:
        return frame.f_back.f_code.co_name  # type: ignore[union-attr]
    finally:
        del frame


@contextlib.contextmanager
def phase_timer(name: str, items: int | None = None, unit: str = "items"):
    """Context manager logging elapsed wall-clock and optional throughput.

    Used around ingest/predict phases; replaces the reference's ad-hoc
    ``time()`` bookkeeping (``unet_2d_summary.py:66,120``).
    """
    logger = logging.getLogger(name)
    tic = time.perf_counter()
    yield
    dt = time.perf_counter() - tic
    if items is not None and dt > 0:
        logger.info("%s: %.3fs (%.1f %s/s)", name, dt, items / dt, unit)
    else:
        logger.info("%s: %.3fs", name, dt)
