"""Performance counters and profiling hooks.

TPU-native equivalent of the reference's two timing mechanisms
(SURVEY.md §5): the compile-time ``PERFORMANCE`` µs wall timers around
dispatch (src/netFPGA.cpp:262-284, def/defines.h:9) become
:class:`PerfTimer` (µs, measured around ``block_until_ready`` so async
dispatch is charged honestly), and the vendored-but-unused OpenCL event
profiler (``aocl_utils::getStartEndTime``) becomes :func:`device_trace`,
a ``jax.profiler`` context that captures device-side timelines.

Counters are enabled by default, matching the reference default
(def/defines.h:9); set ``PERFORMANCE_COUNTERS = False`` to compile them out,
in which case getters return 0 exactly like the ``#ifdef``-disabled build
(src/netFPGA.cpp:593-611).
"""

from __future__ import annotations

import contextlib
import time

PERFORMANCE_COUNTERS: bool = True


class PerfTimer:
    """µs wall-clock timer. Use as a context manager; read ``.us`` after."""

    __slots__ = ("us", "_t0")

    def __init__(self):
        self.us = 0
        self._t0 = 0.0

    def __enter__(self):
        if PERFORMANCE_COUNTERS:
            self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if PERFORMANCE_COUNTERS:
            self.us = int((time.perf_counter() - self._t0) * 1e6)
        return False


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device-side profile (xprof) for the enclosed region."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
