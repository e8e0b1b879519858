"""Serving pipeline tests: decode -> batch -> device -> futures."""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_fpga_tpu.models import vit
from vit_fpga_tpu.runtime.serving import ImageServer, decode_jpeg

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _jpeg_bytes(img: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")  # lossless -> exact parity
    return buf.getvalue()


def _tiny_forward():
    cfg = vit.ViTConfig(image_size=32, patch_size=8, hidden_dim=64,
                        depth=2, num_heads=4, mlp_dim=128, num_classes=8,
                        dtype="float32", attn_impl="xla")
    params = vit.init_params(jax.random.key(0), cfg)
    jfwd = vit.jit_forward(cfg, raw=True)
    return cfg, params, lambda batch: jfwd(params, batch)


def test_serving_end_to_end_matches_direct():
    cfg, params, fwd = _tiny_forward()
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (32, 32, 3), np.uint8) for _ in range(10)]
    with ImageServer(fwd, image_size=32, batch_size=4,
                     decode_workers=2) as server:
        futs = [server.submit(_jpeg_bytes(im)) for im in imgs]
        results = [f.result(timeout=60) for f in futs]
    direct = np.asarray(fwd(jnp.asarray(np.stack(imgs))))
    for got, want in zip(results, direct):
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert len(results) == 10


def test_serving_partial_batch_flush_and_counters():
    _, _, fwd = _tiny_forward()
    rng = np.random.default_rng(1)
    with ImageServer(fwd, image_size=32, batch_size=256,
                     flush_ms=10.0) as server:
        fut = server.submit_raw(rng.integers(0, 256, (32, 32, 3),
                                             np.uint8))
        out = fut.result(timeout=60)
        assert out.shape == (8,)
        assert server.served == 1 and server.batches == 1


def test_serving_decode_error_isolated():
    _, _, fwd = _tiny_forward()
    with ImageServer(fwd, image_size=32, batch_size=2) as server:
        bad = server.submit(b"not an image")
        good = server.submit_raw(np.zeros((32, 32, 3), np.uint8))
        with pytest.raises(Exception):
            bad.result(timeout=30)
        assert good.result(timeout=60).shape == (8,)


def test_decode_resizes():
    img = np.random.default_rng(2).integers(0, 256, (64, 48, 3), np.uint8)
    out = decode_jpeg(_jpeg_bytes(img), 32)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8


def test_serving_device_failure_isolated():
    """A forward that raises must fail that batch's futures, not the
    server (the batcher thread keeps serving later batches)."""
    calls = {"n": 0}

    def flaky(batch):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("device exploded")
        import jax.numpy as jnp
        return jnp.zeros((batch.shape[0], 4), jnp.float32)

    with ImageServer(flaky, image_size=8, batch_size=1) as server:
        bad = server.submit_raw(np.zeros((8, 8, 3), np.uint8))
        with pytest.raises(RuntimeError):
            bad.result(timeout=30)
        good = server.submit_raw(np.zeros((8, 8, 3), np.uint8))
        assert good.result(timeout=30).shape == (4,)


def test_serving_close_drains_pending():
    """close() must resolve every accepted request — no stranded futures
    (round-2 hardening)."""
    _, _, fwd = _tiny_forward()
    rng = np.random.default_rng(3)
    server = ImageServer(fwd, image_size=32, batch_size=4, flush_ms=50.0)
    futs = [server.submit_raw(rng.integers(0, 256, (32, 32, 3), np.uint8))
            for _ in range(6)]
    server.close()          # drain=True default
    for f in futs:
        assert f.done()
        assert f.result(timeout=1).shape == (8,)


def test_serving_submit_after_close_rejected():
    from vit_fpga_tpu.runtime.serving import ServerClosed
    _, _, fwd = _tiny_forward()
    server = ImageServer(fwd, image_size=32, batch_size=4)
    server.close()
    with pytest.raises(ServerClosed):
        server.submit_raw(np.zeros((32, 32, 3), np.uint8))
    with pytest.raises(ServerClosed):
        server.submit(b"bytes")


def test_serving_flush_deadline_is_per_batch():
    """A steady trickle must not hold a partial batch open past ~flush_ms
    total (the deadline is absolute per batch, not per arrival)."""
    import threading
    import time as _time
    _, _, fwd = _tiny_forward()
    rng = np.random.default_rng(4)
    with ImageServer(fwd, image_size=32, batch_size=64,
                     flush_ms=80.0) as server:
        stop = threading.Event()

        def trickle():
            while not stop.is_set():
                try:
                    server.submit_raw(
                        rng.integers(0, 256, (32, 32, 3), np.uint8))
                except Exception:
                    return
                _time.sleep(0.02)   # arrivals every 20ms < 80ms flush

        t = threading.Thread(target=trickle, daemon=True)
        first = server.submit_raw(rng.integers(0, 256, (32, 32, 3),
                                               np.uint8))
        t0 = _time.monotonic()
        t.start()
        first.result(timeout=30)
        elapsed = _time.monotonic() - t0
        stop.set()
        t.join(timeout=5)
    # under the old per-arrival deadline this stretches to ~batch*flush
    # (> 5s); per-batch it's flush + one forward + slack
    assert elapsed < 3.0, f"flush stretched to {elapsed:.2f}s"


def test_serving_latency_percentiles_exported():
    from vit_fpga_tpu.utils.log import Metrics
    _, _, fwd = _tiny_forward()
    Metrics.reset()
    with ImageServer(fwd, image_size=32, batch_size=2) as server:
        futs = [server.submit_raw(np.zeros((32, 32, 3), np.uint8))
                for _ in range(4)]
        for f in futs:
            f.result(timeout=60)
        pct = server.latency_percentiles()
    assert "p50" in pct and "p99" in pct and pct["p50"] > 0
    snap = Metrics.snapshot()
    assert any(k.startswith("serving/latency_ms/") for k in snap)


def test_serving_priority_lane_jumps_queue():
    """High-priority submits are batched ahead of earlier normal ones."""
    import threading
    order = []
    gate = threading.Event()

    def slow_fwd(batch):
        gate.wait(timeout=10)   # hold the first batch until all submitted
        import jax.numpy as jnp
        order.append(int(batch[0, 0, 0, 0]))
        return jnp.zeros((batch.shape[0], 4), jnp.float32)

    with ImageServer(slow_fwd, image_size=8, batch_size=1,
                     flush_ms=1.0) as srv:
        futs = [srv.submit_raw(np.full((8, 8, 3), i, np.uint8))
                for i in (1, 2, 3)]
        hi = srv.submit_raw(np.full((8, 8, 3), 9, np.uint8), priority=True)
        gate.set()
        for f in futs + [hi]:
            f.result(timeout=30)
    # first picked-up batch may already hold item 1; the high-priority
    # request must run before the remaining normal ones
    assert order.index(9) <= 1, order


def test_serving_queue_timeout_and_cancel():
    import threading
    gate = threading.Event()

    def gated_fwd(batch):
        gate.wait(timeout=10)
        import jax.numpy as jnp
        return jnp.zeros((batch.shape[0], 4), jnp.float32)

    with ImageServer(gated_fwd, image_size=8, batch_size=1,
                     flush_ms=1.0) as srv:
        blocker = srv.submit_raw(np.zeros((8, 8, 3), np.uint8))
        expired = srv.submit_raw(np.zeros((8, 8, 3), np.uint8),
                                 timeout_ms=1.0)
        cancelled = srv.submit_raw(np.zeros((8, 8, 3), np.uint8))
        assert cancelled.cancel()
        import time as _t
        _t.sleep(0.05)          # let the deadline lapse while gated
        gate.set()
        assert blocker.result(timeout=30).shape == (4,)
        with pytest.raises(TimeoutError):
            expired.result(timeout=30)
        assert cancelled.cancelled()


# ---------------------------------------------------------------------------
# int8 serving (VERDICT r3 #4): the quantized datapath behind the SAME
# serving API — JPEGs in, int8-engine logits out, parity vs direct calls.
# ---------------------------------------------------------------------------

def _tiny_int8_forward():
    from vit_fpga_tpu.models import quantized
    cfg = vit.ViTConfig(image_size=32, patch_size=8, hidden_dim=64,
                        depth=2, num_heads=4, mlp_dim=128, num_classes=8,
                        dtype="bfloat16", attn_impl="xla")
    params = vit.init_params(jax.random.key(0), cfg)
    qparams = quantized.quantize_vit_fast(params)
    jfwd = quantized.jit_forward_int8(cfg, raw=True)
    return cfg, params, qparams, lambda batch: jfwd(qparams, batch)


def test_int8_serving_end_to_end_matches_direct():
    cfg, _, _, fwd = _tiny_int8_forward()
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, (32, 32, 3), np.uint8) for _ in range(10)]
    with ImageServer(fwd, image_size=32, batch_size=4,
                     decode_workers=2) as server:
        futs = [server.submit(_jpeg_bytes(im)) for im in imgs]
        results = [f.result(timeout=60) for f in futs]
    direct = np.asarray(fwd(jnp.asarray(np.stack(imgs))))
    for got, want in zip(results, direct):
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert len(results) == 10


def test_int8_serving_tracks_bf16_serving_path():
    """The int8 server's outputs stay close to the bf16 server's on the
    same JPEGs (quantization noise, not a different model)."""
    cfg, params, qparams, int8_fwd = _tiny_int8_forward()
    bf16_jfwd = vit.jit_forward(cfg, raw=True)
    bf16_fwd = lambda b: bf16_jfwd(params, b)  # noqa: E731
    rng = np.random.default_rng(8)
    imgs = [rng.integers(0, 256, (32, 32, 3), np.uint8) for _ in range(6)]
    outs = {}
    for tag, fwd in (("int8", int8_fwd), ("bf16", bf16_fwd)):
        with ImageServer(fwd, image_size=32, batch_size=4) as server:
            futs = [server.submit(_jpeg_bytes(im)) for im in imgs]
            outs[tag] = np.stack([f.result(timeout=60) for f in futs])
    a, b = outs["int8"], outs["bf16"]
    cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.99, f"int8 serving diverged from bf16: cosine {cos}"


def test_serving_work_conserving_flush():
    """The flush deadline only applies when the device pipeline is idle:
    while a batch is in flight, a partial batch keeps filling (flushing
    early would burn a full device-batch time on a fraction of a batch —
    experiments/perf_serving_stub.py measured 525 vs 1012 img/s)."""
    import threading
    import time as _time

    release = threading.Event()
    calls = []

    class Lazy:
        """Unmaterialized 'device' result: the batch is in flight until
        release is set."""

        def __array__(self, dtype=None, copy=None):
            assert release.wait(10.0), "test device never released"
            return np.zeros((4, 8), np.float32)

    def fwd(batch):
        calls.append(np.asarray(batch).copy())
        return Lazy() if len(calls) == 1 else np.zeros((4, 8), np.float32)

    img = np.full((8, 8, 3), 7, np.uint8)
    server = ImageServer(fwd, image_size=8, batch_size=4, flush_ms=5.0,
                         decode_workers=2)
    try:
        # batch 1: device idle -> partial flush at ~flush_ms with 1 image
        f1 = server.submit_raw(img)
        deadline = _time.monotonic() + 5.0
        while len(calls) < 1 and _time.monotonic() < deadline:
            _time.sleep(0.005)
        assert len(calls) == 1
        # device now busy: 3 more must NOT flush at flush_ms
        f2 = [server.submit_raw(img) for _ in range(3)]
        _time.sleep(0.15)   # 30x flush_ms
        assert len(calls) == 1, "partial batch flushed while device busy"
        release.set()       # device drains -> inflight 0 -> flush
        deadline = _time.monotonic() + 5.0
        while len(calls) < 2 and _time.monotonic() < deadline:
            _time.sleep(0.005)
        assert len(calls) == 2
        # the deferred batch carried all 3 waiting images
        filled = int((calls[1] == 7).all(axis=(1, 2, 3)).sum())
        assert filled == 3, f"expected 3 filled rows, got {filled}"
        f1.result(timeout=10)
        for f in f2:
            f.result(timeout=10)
    finally:
        release.set()
        server.close()


def test_serving_full_batch_dispatches_while_device_busy():
    """A FULL batch must not wait for device idle — assembly is done, so
    holding it adds latency for nothing (pipeline depth is max_inflight's
    job, not the batcher's)."""
    import threading
    import time as _time

    release = threading.Event()
    calls = []

    class Lazy:
        def __array__(self, dtype=None, copy=None):
            assert release.wait(10.0), "test device never released"
            return np.zeros((4, 8), np.float32)

    def fwd(batch):
        calls.append(len(calls))
        return Lazy() if len(calls) == 1 else np.zeros((4, 8), np.float32)

    img = np.full((8, 8, 3), 7, np.uint8)
    server = ImageServer(fwd, image_size=8, batch_size=4, flush_ms=5.0,
                         decode_workers=2)
    try:
        f1 = server.submit_raw(img)   # partial flush while idle
        deadline = _time.monotonic() + 5.0
        while len(calls) < 1 and _time.monotonic() < deadline:
            _time.sleep(0.005)
        fs = [server.submit_raw(img) for _ in range(4)]   # a FULL batch
        deadline = _time.monotonic() + 5.0
        while len(calls) < 2 and _time.monotonic() < deadline:
            _time.sleep(0.005)
        assert len(calls) == 2, "full batch waited for device idle"
        release.set()
        f1.result(timeout=10)
        for f in fs:
            f.result(timeout=10)
    finally:
        release.set()
        server.close()


# ---------------------------------------------------------------------------
# Work-conserving hold vs per-request latency contracts (ADVICE r4): the
# hold must not disable timeout_ms deadlines or priority, and expired
# riders fail instead of being served stale.
# ---------------------------------------------------------------------------

def _busy_device_server(**kw):
    """Server whose FIRST batch stays in flight until release is set."""
    import threading

    release = threading.Event()
    calls = []

    class Lazy:
        def __array__(self, dtype=None, copy=None):
            assert release.wait(10.0), "test device never released"
            return np.zeros((4, 8), np.float32)

    def fwd(batch):
        calls.append(np.asarray(batch).copy())
        return Lazy() if len(calls) == 1 else np.zeros((4, 8), np.float32)

    server = ImageServer(fwd, image_size=8, batch_size=4, **kw)
    return server, release, calls


def test_serving_held_deadline_flushes_before_expiry():
    """A held rider WITH a deadline is dispatched in time even while the
    device is busy — the work-conserving hold yields to the rider's own
    latency contract (ADVICE r4: deadlines were never re-checked)."""
    import time as _time

    server, release, calls = _busy_device_server(flush_ms=5.0,
                                                 decode_workers=2)
    img = np.full((8, 8, 3), 7, np.uint8)
    try:
        f1 = server.submit_raw(img)           # flushes idle -> device busy
        deadline = _time.monotonic() + 5.0
        while len(calls) < 1 and _time.monotonic() < deadline:
            _time.sleep(0.005)
        assert len(calls) == 1
        # rider with a 300 ms budget: without the fix it would be held
        # until the device drains (release), i.e. indefinitely here
        f2 = server.submit_raw(img, timeout_ms=300.0)
        deadline = _time.monotonic() + 5.0
        while len(calls) < 2 and _time.monotonic() < deadline:
            _time.sleep(0.005)
        assert len(calls) == 2, "held rider's deadline did not flush"
        release.set()
        f1.result(timeout=10)
        f2.result(timeout=10)
    finally:
        release.set()
        server.close()


def test_serving_priority_not_held_by_busy_device():
    """A priority-lane rider caps the work-conserving hold at flush_ms —
    priority means latency-sensitive (ADVICE r4)."""
    import time as _time

    server, release, calls = _busy_device_server(flush_ms=5.0,
                                                 decode_workers=2)
    img = np.full((8, 8, 3), 7, np.uint8)
    try:
        f1 = server.submit_raw(img)
        deadline = _time.monotonic() + 5.0
        while len(calls) < 1 and _time.monotonic() < deadline:
            _time.sleep(0.005)
        f2 = server.submit_raw(img, priority=True)
        deadline = _time.monotonic() + 5.0
        while len(calls) < 2 and _time.monotonic() < deadline:
            _time.sleep(0.005)
        assert len(calls) == 2, "priority rider held past flush_ms"
        release.set()
        f1.result(timeout=10)
        f2.result(timeout=10)
    finally:
        release.set()
        server.close()


def test_serving_rider_deadline_shortens_idle_fill():
    """With the device IDLE and a long flush window, a rider's shorter
    deadline pulls the flush forward so it is served, not expired."""
    import time as _time

    calls = []

    def fwd(batch):
        calls.append(len(calls))
        return np.zeros((4, 8), np.float32)

    img = np.full((8, 8, 3), 7, np.uint8)
    with ImageServer(fwd, image_size=8, batch_size=4, flush_ms=2000.0,
                     decode_workers=2) as server:
        t0 = _time.monotonic()
        fut = server.submit_raw(img, timeout_ms=300.0)
        out = fut.result(timeout=10)   # must not expire or wait 2 s
        assert out.shape == (8,)
        assert _time.monotonic() - t0 < 1.5, "rider waited the long flush"
