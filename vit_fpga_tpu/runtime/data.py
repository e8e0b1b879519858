"""Training data pipeline: host batching + device prefetch.

The reference has no IO story at all (weights and train sets arrive as
in-memory ``net_data``/``net_sets`` structs — SURVEY.md §5 "Checkpoint /
resume: none on disk").  Production training needs the host to stay ahead
of the device: this loader decodes/augments on worker threads and keeps
``prefetch`` batches already transferred to device (or sharded onto a
mesh) while the current step runs, so the TPU never waits on PCIe.

TPU-first division of labor (same as serving): bytes -> arrays on host
threads; normalize/augment math that XLA can fuse stays in the jitted
step.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import numpy as np


class HostLoader:
    """Pull items from ``source`` on worker threads, assemble fixed-size
    (images, labels) numpy batches.

    ``source`` yields (image_u8 (S,S,3), label int) pairs — e.g. decoded
    files or a synthetic generator.  Order across workers is not
    guaranteed (standard for shuffled training)."""

    def __init__(self, source: Callable[[], Iterable], batch_size: int,
                 workers: int = 4, queue_depth: int = 8):
        self._batch = batch_size
        self._q: "queue.Queue" = queue.Queue(maxsize=queue_depth)
        self._stop = threading.Event()
        self._threads = []
        self._iter_lock = threading.Lock()
        self._it = iter(source())
        for i in range(workers):
            t = threading.Thread(target=self._worker, daemon=True,
                                 name=f"loader-{i}")
            t.start()
            self._threads.append(t)

    def _next_items(self, n):
        out = []
        with self._iter_lock:
            for _ in range(n):
                try:
                    out.append(next(self._it))
                except StopIteration:
                    break
        return out

    def _worker(self) -> None:
        while not self._stop.is_set():
            items = self._next_items(self._batch)
            if not items:
                self._q.put(None)   # end-of-stream sentinel per worker
                return
            imgs = np.stack([np.asarray(im, np.uint8) for im, _ in items])
            labels = np.asarray([lb for _, lb in items], np.int32)
            if len(items) < self._batch:   # pad the final partial batch
                pad = self._batch - len(items)
                imgs = np.concatenate([imgs, np.zeros(
                    (pad,) + imgs.shape[1:], np.uint8)])
                labels = np.concatenate(
                    [labels, np.full((pad,), -1, np.int32)])
            self._q.put((imgs, labels))

    def __iter__(self) -> Iterator:
        ended = 0
        while ended < len(self._threads):
            item = self._q.get()
            if item is None:
                ended += 1
                continue
            yield item

    def close(self) -> None:
        self._stop.set()


def device_prefetch(batches: Iterable, prefetch: int = 2,
                    sharding: Optional[Any] = None) -> Iterator:
    """Wrap a host-batch iterable so the next ``prefetch`` batches are
    already on device (optionally sharded over a mesh) while the caller
    consumes the current one — JAX's async dispatch overlaps the
    transfers with the running step."""
    import jax

    def put(batch):
        if sharding is None:
            return jax.tree_util.tree_map(jax.device_put, batch)
        imgs, labels = batch
        from ..parallel.sharding import batch_sharding
        mesh = sharding if hasattr(sharding, "devices") else None
        if mesh is not None:
            return (jax.device_put(imgs, batch_sharding(mesh, imgs.ndim)),
                    jax.device_put(labels,
                                   batch_sharding(mesh, labels.ndim)))
        return jax.device_put(batch, sharding)

    it = iter(batches)
    buf = []
    try:
        for _ in range(prefetch):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    for nxt in it:
        out = buf.pop(0)
        buf.append(put(nxt))
        yield out
    while buf:
        yield buf.pop(0)


def synthetic_source(n: int, image_size: int, num_classes: int,
                     seed: int = 0) -> Callable[[], Iterable]:
    """Deterministic synthetic (image, label) stream for tests/benches."""

    def gen():
        rng = np.random.default_rng(seed)
        for _ in range(n):
            yield (rng.integers(0, 256, (image_size, image_size, 3),
                                np.uint8),
                   int(rng.integers(0, num_classes)))

    return gen
