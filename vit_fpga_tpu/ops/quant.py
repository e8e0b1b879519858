"""Int8 quantized datapath — the fixed-point FPGA datapath, TPU-native.

The reference drove a fixed-point FPGA pipeline (BASELINE north_star: "the
reference's fixed-point/quantized FPGA datapath maps to an int8/bf16
quantized inference mode with bit-accurate logit parity against the C
reference").  The TPU analogue: symmetric per-tensor int8 with int32 MXU
accumulation.  Because int8 x int8 -> int32 accumulation is EXACT on both
the CPU oracle and the MXU, and dequantization is elementwise f32, the CPU
and TPU quantized paths can agree bit-for-bit given identical scales —
which is precisely what tests/test_quant.py asserts.

One source of truth for semantics, two executors:
  * ``*_numpy``  — the oracle (used by NetCPU and the parity harness)
  * jnp / Pallas — the device path (int8 GEMM on the MXU; v5e runs int8
    at 2x bf16 throughput, 394 TOPS)

Quantizer definition (shared): ``scale = absmax / 127``;
``q = clip(rint(x / scale), -127, 127)`` with rint = round-half-to-even
(both numpy and XLA default), zero-point 0.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import round_up

QMAX = 127.0


# ---------------------------------------------------------------------------
# Quantizer (numpy oracle + jnp, identical semantics)
# ---------------------------------------------------------------------------

def quantize_numpy(x: np.ndarray, axis: Optional[int] = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric int8: returns (q, scale). axis=None -> per-tensor scale."""
    absmax = np.max(np.abs(x), axis=axis, keepdims=axis is not None)
    scale = np.maximum(absmax, 1e-12).astype(np.float32) / QMAX
    q = np.clip(np.rint(x / scale), -QMAX, QMAX).astype(np.int8)
    return q, np.float32(scale)


def quantize_jnp(x: jax.Array, axis: Optional[int] = None
                 ) -> Tuple[jax.Array, jax.Array]:
    absmax = jnp.max(jnp.abs(x), axis=axis, keepdims=axis is not None)
    scale = (jnp.maximum(absmax, 1e-12) / QMAX).astype(jnp.float32)
    q = jnp.clip(jnp.rint(x / scale), -QMAX, QMAX).astype(jnp.int8)
    return q, scale


def dequantize(q, scale):
    return q.astype(jnp.float32) * scale


# ---------------------------------------------------------------------------
# Int8 linear: exact int32 accumulation, then f32 dequant (+bias)
# ---------------------------------------------------------------------------

def int8_linear_numpy(xq: np.ndarray, sx: np.ndarray, wq: np.ndarray,
                      sw: np.ndarray, bias: Optional[np.ndarray] = None
                      ) -> np.ndarray:
    """Oracle: (B, K) int8 @ (K, N) int8 -> f32.

    Fixed-point epilogue (TFLite-style, faithful to an FPGA datapath AND
    bit-stable under compiler fusion): the bias is requantized into the
    int32 accumulator scale, added EXACTLY in integer arithmetic, and the
    result is dequantized with one f32 multiply — the only rounded float
    op, so no FMA contraction can change the result between executors.
    """
    s_out = np.float32(np.float32(sx) * np.float32(sw))
    acc = xq.astype(np.int32) @ wq.astype(np.int32)
    if bias is not None:
        bq = np.rint(bias.astype(np.float32) / s_out).astype(np.int64)
        bq = np.clip(bq, -2**31, 2**31 - 1).astype(np.int32)
        acc = acc + bq
    return acc.astype(np.float32) * s_out


def int8_linear_xla(xq: jax.Array, sx, wq: jax.Array, sw,
                    bias: Optional[jax.Array] = None) -> jax.Array:
    """Device path; semantics bit-identical to :func:`int8_linear_numpy`."""
    s_out = (jnp.float32(sx) * jnp.float32(sw)).astype(jnp.float32)
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    if bias is not None:
        bq = jnp.rint(bias.astype(jnp.float32) / s_out)
        bq = jnp.clip(bq, -2.0**31, 2.0**31 - 1).astype(jnp.int32)
        acc = acc + bq
    return acc.astype(jnp.float32) * s_out


# ---------------------------------------------------------------------------
# Pallas int8 GEMM (tiled, int32 accumulation in VMEM)
# ---------------------------------------------------------------------------

def _int8_gemm_kernel(x_ref, w_ref, o_ref, acc_ref, *, k_steps: int):
    """Grid (M/bm, N/bn, K/bk): accumulate int32 partials over the K axis.

    K is the innermost (fastest-varying) grid dim, so the accumulator
    scratch carries across K steps for one (i, j) output tile.
    """
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def int8_gemm_pallas(xq: jax.Array, wq: jax.Array, bm: int = 256,
                     bn: int = 256, bk: int = 256,
                     interpret: bool = False) -> jax.Array:
    """(M, K) int8 @ (K, N) int8 -> (M, N) int32 on the MXU.

    Tiles are sized for int8 sublane packing (32, 128); inputs are padded
    to tile multiples (zero padding is exact for integer accumulate).
    """
    m, k = xq.shape
    k2, n = wq.shape
    assert k == k2
    mp, kp, np_ = round_up(m, bm), round_up(k, bk), round_up(n, bn)
    if (mp, kp) != (m, k):
        xq = jnp.pad(xq, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        wq = jnp.pad(wq, ((0, kp - k), (0, np_ - n)))
    k_steps = kp // bk

    out = pl.pallas_call(
        functools.partial(_int8_gemm_kernel, k_steps=k_steps),
        grid=(mp // bm, np_ // bn, k_steps),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + 4 * mp * np_,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(xq, wq)
    return out[:m, :n]


def int8_linear_pallas(xq: jax.Array, sx, wq: jax.Array, sw,
                       bias: Optional[jax.Array] = None,
                       interpret: bool = False) -> jax.Array:
    """Pallas-backed int8 linear with identical semantics to the oracle."""
    shape = xq.shape
    s_out = (jnp.float32(sx) * jnp.float32(sw)).astype(jnp.float32)
    acc = int8_gemm_pallas(xq.reshape(-1, shape[-1]), wq,
                           interpret=interpret)
    acc = acc.reshape(*shape[:-1], wq.shape[1])
    if bias is not None:
        bq = jnp.rint(bias.astype(jnp.float32) / s_out)
        bq = jnp.clip(bq, -2.0**31, 2.0**31 - 1).astype(jnp.int32)
        acc = acc + bq
    return acc.astype(jnp.float32) * s_out


def int8_linear(xq, sx, wq, sw, bias=None, impl: str = "auto"):
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return int8_linear_pallas(xq, sx, wq, sw, bias)
    return int8_linear_xla(xq, sx, wq, sw, bias)
