"""Bounded asynchronous streaming pipeline.

TPU-native redesign of the reference's 24-slot OpenCL event ring
(src/netFPGA.cpp:12, 292-365): the reference chains per-slot
write->compute->read events so up to 24 frames are in flight while the host
only ever blocks on the *oldest* frame's read event.  On TPU, JAX's async
dispatch IS that event graph — every submitted computation returns
immediately with a future-like ``jax.Array`` — so the ring reduces to a
bounded FIFO of in-flight results:

  * submit  = dispatch the jitted kernel, append the un-materialized result
    (host->HBM copy, device compute, and HBM->host readback all overlap
    across slots, exactly like the reference's event chains).
  * retrieve = pop the oldest entry and materialize it (the lone blocking
    point, ≙ ``clWaitForEvents`` on the read event, src/netFPGA.cpp:349).
  * overflow  -> frame DROPPED with a warning (≙ "PILA LLENA",
    src/netFPGA.cpp:330-333).
  * underflow -> empty sentinel with a warning (≙ "PILA VACIA",
    src/netFPGA.cpp:358-361).
"""

from __future__ import annotations

import logging
from collections import deque
from typing import Any, Callable, Deque, Generic, Optional, Tuple, TypeVar

log = logging.getLogger("vit_fpga_tpu.pipeline")

T = TypeVar("T")
M = TypeVar("M")


class StreamingRing(Generic[T, M]):
    """A depth-bounded FIFO of in-flight async results + metadata."""

    def __init__(self, depth: int):
        if depth < 1:
            raise ValueError("ring depth must be >= 1")
        self.depth = depth
        self._ring: Deque[Tuple[T, M]] = deque()
        self.dropped = 0       # frames rejected on overflow
        self.submitted = 0
        self.retrieved = 0

    def __len__(self) -> int:
        return len(self._ring)

    @property
    def free(self) -> int:
        """Free slots (≙ ``g_free_batch``, src/netFPGA.cpp:54-56)."""
        return self.depth - len(self._ring)

    def try_submit(self, dispatch: Callable[[], T], meta: M) -> bool:
        """Dispatch and enqueue; returns False (frame dropped) when full.

        ``dispatch`` must be non-blocking (JAX async dispatch qualifies).
        """
        from ..utils.log import Metrics
        if len(self._ring) >= self.depth:
            self.dropped += 1
            Metrics.incr("ring/dropped")
            log.warning("streaming ring full (depth=%d): dropping frame",
                        self.depth)
            print("vit_fpga_tpu: ring full, dropping frame")
            return False
        self._ring.append((dispatch(), meta))
        self.submitted += 1
        Metrics.incr("ring/submitted")
        return True

    def try_retrieve(self) -> Optional[Tuple[T, M]]:
        """Pop the oldest in-flight entry, or None when drained."""
        if not self._ring:
            log.warning("streaming ring empty")
            print("vit_fpga_tpu: ring empty")
            return None
        self.retrieved += 1
        return self._ring.popleft()

    def drain(self) -> None:
        self._ring.clear()
