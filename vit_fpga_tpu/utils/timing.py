"""Event-pair timing helpers — the ``aocl_utils::getStartEndTime`` analogue.

The reference vendors OpenCL event profiling (`getStartEndTime` in
``opencl.o``, SURVEY.md §5 "Tracing") to read device-side start/end
nanoseconds per enqueued command.  On TPU, per-dispatch device timestamps
come from the profiler; for everyday use the right primitive is a
steady-state timed loop around ``block_until_ready`` with an explicit
warmup — that is what :func:`time_fn` provides, and what every bench in
this repo uses.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Sequence

import jax


@dataclass
class Timing:
    """Wall-clock stats over repeated device executions (seconds)."""
    mean_s: float
    p50_s: float
    min_s: float
    max_s: float
    iters: int

    @property
    def mean_us(self) -> float:
        return self.mean_s * 1e6


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 3,
            inner: int = 1) -> Timing:
    """Time ``fn(*args)`` with compile/transfer warmup.

    ``inner`` > 1 amortizes host dispatch overhead by running the function
    ``inner`` times per measured sample (results are per-call).
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) / inner)
    samples.sort()
    n = len(samples)
    return Timing(mean_s=sum(samples) / n,
                  p50_s=samples[n // 2],
                  min_s=samples[0], max_s=samples[-1], iters=n)


_roundtrip_cache: dict = {}


def _roundtrip_s(reps: int = 5) -> float:
    """Best-case host->device->host latency of fetching one jitted scalar
    (compiled once per process; used to de-bias single-loop timings)."""
    import jax.numpy as jnp
    if "fn" not in _roundtrip_cache:
        _roundtrip_cache["fn"] = jax.jit(lambda x: jnp.sum(x) * 1.000001)
        float(_roundtrip_cache["fn"](jnp.ones((8, 8))))  # compile
    fn = _roundtrip_cache["fn"]
    x = jnp.ones((8, 8))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best


def time_device_loop_single(fn: Callable, args: tuple, n: int = 16,
                            reps: int = 3) -> float:
    """Like :func:`time_device_loop` but compiles only ONE loop program
    (for transports where each compile costs minutes): measures T(n),
    subtracts the cached scalar-fetch roundtrip, divides by n."""
    import jax.numpy as jnp

    def loop(*args):
        first = args[-1]

        def body(i, carry):
            acc, a = carry
            out = fn(*args[:-1], a)
            s = jnp.sum(out).astype(jnp.float32)
            a = a + (s * 1e-37).astype(a.dtype)
            return acc + s, a

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), first))
        return acc

    jl = jax.jit(loop)
    float(jl(*args))  # compile + warm
    rt = _roundtrip_s()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jl(*args))
        best = min(best, time.perf_counter() - t0)
    return max((best - rt) / n, 1e-9)


def time_device_loop(fn: Callable, args: tuple, n_lo: int = 4,
                     n_hi: int = 20, reps: int = 3) -> float:
    """Seconds per ``fn(*args)`` call measured ON DEVICE, tunnel-proof.

    Some transports (e.g. the axon tunnel) ack dispatch before device
    completion, so host-side ``block_until_ready`` timing under-reports.
    This timer chains N calls inside ONE jitted ``lax.fori_loop`` with a
    serial data dependency (a vanishing perturbation XLA cannot fold away),
    fetches a scalar, and returns the slope (T(n_hi) - T(n_lo)) /
    (n_hi - n_lo) — both the host->device roundtrip and any constant
    overhead cancel.
    """
    import jax.numpy as jnp

    def make_loop(n):
        def loop(*args):
            first = args[-1]

            def body(i, carry):
                acc, a = carry
                out = fn(*args[:-1], a)
                s = jnp.sum(out).astype(jnp.float32)
                # serial dependency; 1e-37 * s underflows to ~0 at runtime
                # but cannot be constant-folded
                a = a + (s * 1e-37).astype(a.dtype)
                return acc + s, a

            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), first))
            return acc

        return jax.jit(loop)

    lo, hi = make_loop(n_lo), make_loop(n_hi)
    float(lo(*args))  # compile + warm
    float(hi(*args))

    def best(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = best(lo), best(hi)
    slope = (t_hi - t_lo) / (n_hi - n_lo)
    # Contention guard: if another job inflates the SHORT run, the slope
    # collapses and over-reports throughput (observed: an "above int8
    # roofline" reading).  The single-loop estimate (long run minus the
    # cached scalar-fetch roundtrip) is immune to that failure mode;
    # take the slower (conservative) of the two.
    single = (t_hi - _roundtrip_s()) / n_hi
    return max(slope, single, 1e-9)


def summarize(name: str, t: Timing, work_per_call: float | None = None,
              unit: str = "items") -> str:
    msg = (f"{name}: mean {t.mean_s * 1e3:.3f} ms  p50 {t.p50_s * 1e3:.3f} ms"
           f"  min {t.min_s * 1e3:.3f} ms over {t.iters} iters")
    if work_per_call:
        msg += f"  ({work_per_call / t.p50_s:,.0f} {unit}/s)"
    return msg
