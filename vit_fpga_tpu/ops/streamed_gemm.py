"""Double-buffered HBM weight streaming GEMM — BASELINE config 4's pattern.

For models whose weights do not all fit VMEM-resident working sets
(ViT-L/16 @384: 4096-wide MLPs at seq 577), the classic TPU pattern is to
keep the weight matrix in HBM and stream K-tiles into VMEM with a
two-slot DMA pipeline so the copy of tile k+1 overlaps the MXU work on
tile k (pallas_guide.md "Patterns: Double Buffering").

This kernel demonstrates the pattern explicitly with manual
``make_async_copy`` DMAs: x stays VMEM-resident, W streams through two
(bk, N) VMEM slots.  Parity-tested against jnp.dot; the automatic-pipeline
variants in fused_mlp.py/quant.py get the same effect from Mosaic's
revolving block buffers, so this is both a teaching kernel and the
fallback for weight shapes too large for block-resident scheduling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import round_up


def _streamed_kernel(x_ref, w_hbm, o_ref, w_slots, sems, acc, *,
                     k_steps: int, bk: int):
    """x_ref: (T, K) VMEM; w_hbm: (K, N) in HBM/ANY; o_ref: (T, N).

    Two-slot double buffer: start DMA for tile k+1, wait tile k, MAC.
    """
    def dma(slot, k_idx):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(k_idx * bk, bk), :],
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


@functools.partial(jax.jit, static_argnames=("bk", "interpret"))
def streamed_gemm(x: jax.Array, w: jax.Array, bk: int = 512,
                  interpret: bool = False) -> jax.Array:
    """(T, K) @ (K, N) with W streamed HBM->VMEM, double-buffered."""
    t, k = x.shape
    k2, n = w.shape
    assert k == k2
    kp = round_up(k, bk)
    if kp != k:
        x = jnp.pad(x, ((0, 0), (0, kp - k)))
        w = jnp.pad(w, ((0, kp - k), (0, 0)))
    k_steps = kp // bk

    return pl.pallas_call(
        functools.partial(_streamed_kernel, k_steps=k_steps, bk=bk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # W stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bk, n), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((t, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * kp * n,
            bytes_accessed=(t * kp + kp * n + t * n) * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x, w)
