"""Double-buffered HBM weight streaming GEMM — BASELINE config 4's pattern.

For models whose weights do not all fit VMEM-resident working sets
(ViT-L/16 @384: 4096-wide MLPs at seq 577), the classic TPU pattern is to
keep the weight matrix in HBM and stream K-tiles into VMEM with a
two-slot DMA pipeline so the copy of tile k+1 overlaps the MXU work on
tile k (pallas_guide.md "Patterns: Double Buffering").

This kernel implements the pattern explicitly with manual
``make_async_copy`` DMAs: a (bt, K) row tile of x sits VMEM-resident
while the matching (K, bn) column panel of W streams through two
(bk, bn) VMEM slots; a (rows, cols) grid covers any geometry.  Parity-
tested against jnp.dot (interpret + hardware).  The production MLP /
attention kernels get the same effect from Mosaic's revolving block
buffers — the round-5 A/B (experiments/perf_streamed_ab.py, recorded in
docs/perf.md) measured Mosaic's pipeline ahead at every production
shape, so this stays the explicit-DMA record/fallback, not a call site.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import round_up


def _streamed_kernel(x_ref, w_hbm, o_ref, w_slots, sems, acc, *,
                     k_steps: int, bk: int, bn: int):
    """x_ref: (bt, K) VMEM row tile; w_hbm: full (K, N) in HBM/ANY;
    o_ref: (bt, bn) out tile.  Two-slot double buffer over K: start the
    DMA for K-tile k+1, wait tile k, MAC."""
    j = pl.program_id(1)

    def dma(slot, k_idx):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(k_idx * bk, bk), pl.ds(j * bn, bn)],
            w_slots.at[slot],
            sems.at[slot])

    dma(0, 0).start()
    acc[:] = jnp.zeros_like(acc)

    def body(k_idx, _):
        slot = jax.lax.rem(k_idx, 2)
        next_slot = jax.lax.rem(k_idx + 1, 2)

        @pl.when(k_idx + 1 < k_steps)
        def _():
            dma(next_slot, k_idx + 1).start()

        dma(slot, k_idx).wait()
        x_tile = x_ref[:, pl.ds(k_idx * bk, bk)]
        acc[:] += jnp.dot(x_tile, w_slots[slot],
                          preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, k_steps, body, 0)
    o_ref[:] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bk", "bt", "bn", "interpret"))
def streamed_gemm(x: jax.Array, w: jax.Array, bk: int = 512,
                  bt: int | None = None, bn: int | None = None,
                  interpret: bool = False) -> jax.Array:
    """(T, K) @ (K, N) with W streamed HBM->VMEM, double-buffered.

    ``bk``: K-tile depth of each DMA; ``bt``/``bn``: row/column tile of
    the output grid (default: whole T / whole N, i.e. the original
    single-cell layout when it fits VMEM)."""
    t, k = x.shape
    k2, n = w.shape
    assert k == k2
    bt = t if bt is None else min(bt, t)
    bn = n if bn is None else min(bn, n)
    kp = round_up(k, bk)
    tp = round_up(t, bt)
    np_ = round_up(n, bn)
    if kp != k or tp != t:
        x = jnp.pad(x, ((0, tp - t), (0, kp - k)))
    if kp != k or np_ != n:
        w = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    k_steps = kp // bk

    out = pl.pallas_call(
        functools.partial(_streamed_kernel, k_steps=k_steps, bk=bk, bn=bn),
        grid=(tp // bt, np_ // bn),
        in_specs=[
            pl.BlockSpec((bt, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # W stays in HBM
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, np_), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bk, bn), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((bt, bn), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * kp * np_,
            bytes_accessed=(tp * kp + kp * np_ + tp * np_)
            * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x, w)
    return out[:t, :n]
