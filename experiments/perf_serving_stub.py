"""Round 4: ImageServer pipeline overlap proof with a stub device (CPU).

The axon tunnel's H2D path is ~2 orders of magnitude too slow to run
CLIP-L b256 serving end-to-end (perf_serving_overlap.py measures the
transport), so the PIPELINE claim — the decode pool, batcher, and
completer overlap host decode with device compute — is proven here
with a stub device clocked at the measured real rates:

  * stub forward models the REAL dispatch semantics: it returns
    immediately (async dispatch) with a lazy result whose
    materialization (np.asarray in the completer) blocks until a
    serial device queue would have finished the batch — DEVICE_MS per
    batch, FIFO.  A first cut that slept on the batcher thread
    (blocking dispatch) measured e2e 577 img/s vs the 1012 device
    rate, i.e. a 0.57 overlap — that is the number this pipeline
    design AVOIDS by dispatching async and fetching in a separate
    completer thread.
  * submit saturating JPEG load; e2e img/s vs min(decode, device)
    gives the overlap factor: ~1.0 = the slower stage fully hides
    the other; ~(1/2) = serialized stages

DEVICE_MS defaults to 253 ms (CLIP-L/14 b256 at the measured 1011
img/s).  A second run clocks the stub 4x faster to show the pipeline
goes decode-bound gracefully.  Runs on CPU: JAX never touches the
batch (the stub ignores it), so jnp.asarray costs a host copy only.

Run: JAX_PLATFORMS=cpu python experiments/perf_serving_stub.py
"""
import io
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

import jax

jax.config.update("jax_platforms", "cpu")   # beat the axon sitecustomize

from vit_fpga_tpu.runtime.serving import ImageServer  # noqa: E402

BATCH, SIZE = 256, 224
N_JPEG = 64
N_IMAGES = int(os.environ.get("N_BATCHES", "8")) * BATCH

rng = np.random.default_rng(0)
yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
jpegs = []
for i in range(N_JPEG):
    base = (128 + 100 * np.sin(xx / (6 + i % 11) + i)
            * np.cos(yy / (9 + i % 7))).astype(np.float32)
    img = np.clip(base[..., None]
                  + rng.normal(0, 12, (SIZE, SIZE, 3)), 0, 255)
    buf = io.BytesIO()
    Image.fromarray(img.astype(np.uint8)).save(buf, format="JPEG",
                                               quality=90)
    jpegs.append(buf.getvalue())

EMB = np.zeros((BATCH, 768), np.float32)


def make_stub(device_ms: float):
    import threading

    class Lazy:
        """Result handle: materializing blocks until the modeled serial
        device queue has finished this batch (FIFO, device_ms each)."""

        def __init__(self, t_done: float):
            self._t = t_done

        def __array__(self, dtype=None, copy=None):
            wait = self._t - time.perf_counter()
            if wait > 0:
                time.sleep(wait)
            return EMB

    free = [0.0]
    lock = threading.Lock()

    def stub_fwd(batch):   # async dispatch: returns immediately
        with lock:
            free[0] = max(free[0], time.perf_counter()) + device_ms / 1e3
            return Lazy(free[0])

    return stub_fwd


def run(device_ms: float, workers: int) -> None:
    stub_fwd = make_stub(device_ms)
    with ImageServer(stub_fwd, image_size=SIZE, batch_size=BATCH,
                     decode_workers=workers, max_inflight=4) as srv:
        # warm the pool/threads
        for f in [srv.submit(jpegs[i % N_JPEG]) for i in range(BATCH)]:
            f.result(timeout=60)
        t0 = time.perf_counter()
        futs = [srv.submit(jpegs[i % N_JPEG]) for i in range(N_IMAGES)]
        for f in futs:
            f.result(timeout=120)
        dt = time.perf_counter() - t0
        e2e = N_IMAGES / dt
        dev_rate = BATCH / (device_ms / 1e3)
        pct = srv.latency_percentiles()
        print(f"device {device_ms:6.1f} ms/b, w={workers:2d}: "
              f"e2e {e2e:7.1f} img/s, device-rate {dev_rate:7.1f}, "
              f"batches {srv.batches}, p50 {pct.get('p50', 0):.0f} ms "
              f"p99 {pct.get('p99', 0):.0f} ms", flush=True)


# decode-only baseline for the overlap arithmetic
from concurrent.futures import ThreadPoolExecutor  # noqa: E402
from vit_fpga_tpu.runtime.serving import decode_jpeg  # noqa: E402
for w in (8, 16):
    pool = ThreadPoolExecutor(w)
    n = 4 * BATCH
    t0 = time.perf_counter()
    list(pool.map(lambda i: decode_jpeg(jpegs[i % N_JPEG], SIZE),
                  range(n)))
    print(f"decode-only w={w:2d}: {n / (time.perf_counter() - t0):7.1f} "
          f"img/s", flush=True)
    pool.shutdown()

run(253.0, 8)    # CLIP-L b256 at the measured 1011 img/s device rate
run(253.0, 16)
run(63.0, 16)    # 4x faster device: pipeline should go decode-bound
