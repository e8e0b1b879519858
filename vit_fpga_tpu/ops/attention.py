"""Fused multi-head attention kernels.

This is the TPU-native replacement for the QKV + MHA + softmax block the
reference's missing ``network_v1`` bitstream was advertised to implement
(SURVEY.md §2.2 item 4; BASELINE north_star "QKV projection + multi-head
attention with softmax ... become fused Pallas kernels sized to the MXU").

Design note (TPU-first, not a FlashAttention translation): ViT sequence
lengths are tiny — 197 tokens @224/16, 577 @384/16, 257 for CLIP-L/14@336 —
so an entire head's Q, K, V and the full (N, N) score matrix fit VMEM with
room to spare.  Blockwise online-softmax exists to avoid materializing
N^2 scores in HBM; at N <= ~1k the right kernel is ONE fused
QK^T -> mask -> softmax -> PV pass per (batch, head) grid cell, all in VMEM,
with both matmuls on the MXU and f32 softmax statistics.  A blockwise
variant only becomes worthwhile at multi-k sequence lengths.

Two implementations with identical semantics:
  * :func:`mha_xla`    — jnp einsum reference (runs anywhere; the oracle)
  * :func:`mha_pallas` — the fused Pallas kernel (TPU hot path)

Both take ``q, k, v`` of shape (B, H, N, Dh) plus the true key count
``n_valid`` (static) for padding masks, and return (B, H, N, Dh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import LANE, round_up

_NEG_INF = -1e30


def mha_xla(q, k, v, n_valid: int | None = None):
    """Reference MHA: softmax(QK^T / sqrt(Dh)) V with optional key mask."""
    dh = q.shape[-1]
    scale = 1.0 / (dh ** 0.5)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if n_valid is not None and n_valid < k.shape[2]:
        mask = jnp.arange(k.shape[2]) < n_valid
        scores = jnp.where(mask[None, None, None, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int,
                n_pad: int):
    """One (batch, head) cell: fully fused attention in VMEM.

    Refs are (1, 1, N_pad, Dh) blocks. Score matrix lives only in VMEM/
    registers; softmax statistics in f32 regardless of input dtype.
    """
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale        # (N_pad, N_pad)
    if n_valid < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < n_valid, scores, _NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0, 0] = jnp.dot(p, v,
                          preferred_element_type=jnp.float32).astype(
                              o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_valid", "interpret"))
def mha_pallas(q, k, v, n_valid: int | None = None,
               interpret: bool = False):
    """Fused attention over (B, H, N, Dh); pads N and Dh to hardware tiles."""
    b, h, n, dh = q.shape
    if n_valid is None:
        n_valid = n
    scale = 1.0 / (dh ** 0.5)
    n_pad = round_up(n, LANE)
    dh_pad = round_up(dh, LANE)
    if (n_pad, dh_pad) != (n, dh):
        pad = [(0, 0), (0, 0), (0, n_pad - n), (0, dh_pad - dh)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))

    block = pl.BlockSpec((1, 1, n_pad, dh_pad),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale,
                          n_valid=min(n_valid, n), n_pad=n_pad),
        grid=(b, h),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, dh_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * n_pad * n_pad * dh_pad,
            bytes_accessed=4 * b * h * n_pad * dh_pad * q.dtype.itemsize,
            transcendentals=b * h * n_pad * n_pad,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :n, :dh]


def mha(q, k, v, n_valid: int | None = None, impl: str = "auto"):
    """Dispatch between implementations.

    Measured on v5e (ViT-B/16 batch 64): attention score+value math is
    ~0.3% of ViT FLOPs, and at N<=577 XLA's fused einsum+softmax beats the
    per-(b,h)-cell Pallas kernel (grid-cell overhead dominates), so "auto"
    stays on XLA for short sequences and switches to the fused Pallas
    kernel only when the score matrix is big enough to pay off.
    """
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        impl = "pallas" if (on_tpu and q.shape[2] >= 1024) else "xla"
    if impl == "pallas":
        return mha_pallas(q, k, v, n_valid=n_valid)
    return mha_xla(q, k, v, n_valid=n_valid)
