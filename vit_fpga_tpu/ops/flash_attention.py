"""Blockwise flash attention (online softmax) for long sequences.

The fused whole-sequence kernels in ops/attention.py are optimal for ViT
lengths (the score matrix fits VMEM).  Past ~1k tokens the (N, N) scores
no longer fit, and the classic FlashAttention recipe applies: tile Q and
K/V, keep running max/denominator statistics, and rescale the output
accumulator as new K blocks arrive — O(N) memory, scores never
materialized.

Grid is (B*H, Nq/bq, Nk/bk) with the K axis innermost so the f32
accumulator scratch carries across K steps for one Q tile.  Statistics
are f32; inputs stay in the model dtype with f32 MXU accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import LANE, round_up

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  scale: float, n_valid: int, bk: int, k_steps: int):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                  # (bq, dh)
    k = k_ref[0]                                  # (bk, dh)
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    # mask padded keys in the final K block
    first_key = kk * bk
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + first_key
    s = jnp.where(col < n_valid, s, _NEG_INF)

    m_prev = m_ref[:]                              # (bq, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                         # (bq, bk) f32
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(kk == k_steps - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq", "bk", "n_valid",
                                             "interpret"))
def flash_attention(q, k, v, n_valid: int | None = None, bq: int = 512,
                    bk: int = 512, interpret: bool = False):
    """(B, H, N, Dh) x3 -> (B, H, N, Dh), O(N) memory."""
    b, h, n, dh = q.shape
    if n_valid is None:
        n_valid = n
    scale = 1.0 / (dh ** 0.5)
    bq = min(bq, round_up(n, LANE))
    bk = min(bk, round_up(n, LANE))
    n_pad = round_up(n, max(bq, bk))
    if n_pad != n:
        pad = [(0, 0), (0, 0), (0, n_pad - n), (0, 0)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
    bh = b * h
    q, k, v = (t.reshape(bh, n_pad, dh) for t in (q, k, v))
    k_steps = n_pad // bk

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale,
                          n_valid=min(n_valid, n), bk=bk,
                          k_steps=k_steps),
        grid=(bh, n_pad // bq, k_steps),
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dh), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dh), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dh), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_pad * n_pad * dh,
            bytes_accessed=4 * bh * n_pad * dh * q.dtype.itemsize,
            transcendentals=bh * n_pad * n_pad),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v)
    return out.reshape(b, h, n_pad, dh)[:, :, :n, :]
