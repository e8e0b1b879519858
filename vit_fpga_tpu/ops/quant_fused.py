"""Fused row-wise int8 linear — the FAST quantized path.

The bit-exact per-tensor path (ops/quant.py) runs dynamic activation
quantization as separate f32 passes around every GEMM, which costs more
than the int8 GEMM saves.  This kernel fuses the whole quantized linear
into one VMEM pass per token tile:

    bf16 x tile -> per-ROW absmax -> int8 quantize -> int8 x int8 MXU GEMM
    (int32 accumulate, 2x bf16 rate on v5e) -> dequant with
    row_scale x per-column weight scale -> +bias -> activation -> bf16

Per-row (per-token) activation scales are computed inside the tile — no
global reduction, no extra HBM pass — and are also more accurate than the
per-tensor scales of the parity path.  Weights are quantized per OUTPUT
column (axis 0 of the (K, N) matrix), the standard serving recipe.

Contract: tolerance parity vs the f32 reference (int8 quantization noise);
the bit-exact fixed-point contract stays with ops/quant.py.
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


def quantize_weight_colwise(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(K, N) f32 -> (int8 (K, N), f32 scales (N,)), symmetric."""
    w = np.asarray(w, np.float32)
    absmax = np.maximum(np.abs(w).max(axis=0), 1e-12)
    scale = (absmax / QMAX).astype(np.float32)
    q = np.clip(np.rint(w / scale), -QMAX, QMAX).astype(np.int8)
    return q, scale


def _fused_kernel(x_ref, ls_ref, lb_ref, wq_ref, ws_ref, b_ref, o_ref, *,
                  act: str, ln_eps: float):
    x = x_ref[:].astype(jnp.float32)                      # (bt, K)
    if ln_eps > 0.0:  # LayerNorm fused ahead of quantization
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + ln_eps) * ls_ref[0] + lb_ref[0]
    absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                         1e-12)
    sx = absmax / QMAX                                    # (bt, 1)
    xq = jnp.clip(jnp.rint(x / sx), -QMAX, QMAX).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                 # (bt, N) exact
    out = acc.astype(jnp.float32) * (sx * ws_ref[0])      # row x col scales
    out = out + b_ref[0]
    if act == "gelu_tanh":
        out = jax.nn.gelu(out, approximate=True)
    elif act == "quick_gelu":
        out = out * jax.nn.sigmoid(1.702 * out)
    elif act == "relu":
        out = jnp.maximum(out, 0.0)
    elif act != "none":
        raise ValueError(act)
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "ln_eps", "block_t",
                                             "out_dtype", "interpret"))
def int8_linear_fused(x, wq, ws, bias, act: str = "none",
                      ln_scale=None, ln_bias=None, ln_eps: float = 0.0,
                      block_t: int = 512, out_dtype=jnp.bfloat16,
                      interpret: Optional[bool] = None):
    """x: (T, K) float; wq: (K, N) int8; ws: (N,) f32; bias: (N,) f32.

    With ``ln_eps > 0`` (and ln_scale/ln_bias), LayerNorm runs inside the
    kernel ahead of quantization — the int8 block never round-trips the
    normalized activations through HBM.

    ``interpret=None`` (default) resolves to interpret mode off-TPU so
    the int8 engine runs on any backend (the serving surface and the
    CPU test mesh use the same entry as production).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, k = x.shape
    n = wq.shape[1]
    tp = round_up(t, block_t)
    if tp != t:
        x = jnp.pad(x, ((0, tp - t), (0, 0)))
    if ln_scale is None:
        ln_scale = jnp.ones((k,), jnp.float32)
        ln_bias = jnp.zeros((k,), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_fused_kernel, act=act, ln_eps=ln_eps),
        grid=(tp // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * k * n,
            bytes_accessed=tp * k * 2 + k * n + tp * n * 2,
            transcendentals=tp * n if act != "none" else 0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, ln_scale.reshape(1, -1).astype(jnp.float32),
      ln_bias.reshape(1, -1).astype(jnp.float32),
      wq, ws.reshape(1, -1).astype(jnp.float32),
      bias.reshape(1, -1).astype(jnp.float32))
    return out[:t]


def int8_linear_rowwise_ref(x, wq, ws, bias, act: str = "none"):
    """Reference semantics (jnp, any backend)."""
    x = x.astype(jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                         1e-12)
    sx = absmax / QMAX
    xq = jnp.clip(jnp.rint(x / sx), -QMAX, QMAX).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (sx * ws) + bias
    if act == "gelu_tanh":
        out = jax.nn.gelu(out, approximate=True)
    elif act == "quick_gelu":
        out = out * jax.nn.sigmoid(1.702 * out)
    elif act == "relu":
        out = jnp.maximum(out, 0.0)
    return out
