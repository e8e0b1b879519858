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
                n_pad: int, n_heads: int):
    """One batch-image cell: all heads, fully fused in VMEM.

    Refs are (1, H, N_pad, Dh) blocks.  The (N_pad, N_pad) score matrix
    lives only in VMEM — never written to HBM, which is the entire win
    over the unfused XLA path (measured ~7.8 ms/step of pure HBM softmax
    traffic on ViT-B/16 batch 64).  Softmax statistics in f32; matmul
    inputs stay in the model dtype (bf16 on the fast path) with f32 MXU
    accumulation.  Heads are a static unrolled loop so Mosaic pipelines
    the per-head matmuls back-to-back.
    """
    for h in range(n_heads):
        q = q_ref[0, h]
        k = k_ref[0, h]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (N_pad, N_pad)
        if n_valid < n_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(col < n_valid, scores, _NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
        o_ref[0, h] = jnp.dot(
            p, v_ref[0, h],
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_valid", "interpret"))
def mha_pallas(q, k, v, n_valid: int | None = None,
               interpret: bool = False):
    """Fused attention over (B, H, N, Dh); pads N to the lane tile.

    Dh is NOT padded — the MXU handles a 64-wide contraction natively and
    padding it to 128 would double the attention FLOPs.
    """
    b, h, n, dh = q.shape
    if n_valid is None:
        n_valid = n
    scale = 1.0 / (dh ** 0.5)
    n_pad = round_up(n, LANE)
    if n_pad != n:
        pad = [(0, 0), (0, 0), (0, n_pad - n), (0, 0)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))

    block = pl.BlockSpec((1, h, n_pad, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale,
                          n_valid=min(n_valid, n), n_pad=n_pad,
                          n_heads=h),
        grid=(b,),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * n_pad * n_pad * dh,
            bytes_accessed=4 * b * h * n_pad * dh * q.dtype.itemsize,
            transcendentals=b * h * n_pad * n_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :n, :]


def _mha_qkv_kernel(qkv_ref, o_ref, scores_ref, *, scale: float,
                    n_valid: int, n_pad: int, n_heads: int, dh: int):
    """Layout-free fused attention: takes the (1, N_pad, 3D) qkv block
    straight from the qkv projection GEMM and writes (1, N_pad, D) ready
    for the output projection — zero transposes anywhere.  Per-head q/k/v
    are 64-aligned lane slices of the fused tensor.

    Phase-split schedule (measured ~30% faster than interleaving on v5e):
    all QK^T matmuls land in the scores scratch first — a long run of
    independent MXU ops — then softmax (VPU) + PV (MXU) per head, letting
    Mosaic overlap the units instead of serializing MXU->VPU->MXU chains.
    When the scratch would blow the VMEM budget (long sequences), pass
    ``scores_ref=None`` block-streamed per head instead.
    """
    d = n_heads * dh
    qkv = qkv_ref[0]

    def qk(h):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, d + h * dh:d + (h + 1) * dh]
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    def softmax_pv(h, scores):
        scores = scores.astype(jnp.float32)
        if n_valid < n_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(col < n_valid, scores, _NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qkv.dtype)
        v = qkv[:, 2 * d + h * dh:2 * d + (h + 1) * dh]
        o_ref[0, :, h * dh:(h + 1) * dh] = jnp.dot(
            p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)

    if scores_ref is not None:
        # phase split; the scratch may be bf16 when VMEM is tight (the
        # masked values stay representable: -1e30 -> bf16 keeps order)
        for h in range(n_heads):
            scores_ref[h] = qk(h).astype(scores_ref.dtype)
        for h in range(n_heads):
            softmax_pv(h, scores_ref[h])
    else:
        for h in range(n_heads):
            softmax_pv(h, qk(h))


# scores scratch budget: (H, N_pad, N_pad) f32 must fit beside qkv/out.
_SCORES_SCRATCH_BYTES = 6 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("num_heads", "n_valid",
                                             "interpret"))
def mha_qkv_pallas(qkv, num_heads: int, n_valid: int | None = None,
                   interpret: bool = False):
    """Fused attention on the packed (B, N, 3D) qkv tensor -> (B, N, D)."""
    b, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    if n_valid is None:
        n_valid = n
    n_pad = round_up(n, LANE)
    if n_pad != n:
        qkv = jnp.pad(qkv, [(0, 0), (0, n_pad - n), (0, 0)])

    # phase-split needs the full f32 scores scratch beside qkv/out blocks;
    # bigger geometries stream per head (a bf16-scratch tier was measured
    # to still blow the scoped-VMEM limit at exactly the shapes it would
    # serve, so it does not exist).
    phase_split = (num_heads * n_pad * n_pad * 4 <= _SCORES_SCRATCH_BYTES)
    scratch = ([pltpu.VMEM((num_heads, n_pad, n_pad), jnp.float32)]
               if phase_split else [])

    def kernel(qkv_ref, o_ref, *maybe_scores):
        _mha_qkv_kernel(qkv_ref, o_ref,
                        maybe_scores[0] if maybe_scores else None,
                        scale=1.0 / (dh ** 0.5),
                        n_valid=min(n_valid, n), n_pad=n_pad,
                        n_heads=num_heads, dh=dh)

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n_pad, d3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), qkv.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * num_heads * n_pad * n_pad * dh,
            bytes_accessed=4 * b * n_pad * d * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n_pad * n_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(qkv)
    return out[:, :n, :]


def mha_qkv_xla(qkv, num_heads: int, n_valid: int | None = None):
    """Reference semantics for the packed-qkv entry point."""
    b, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    q = qkv[..., :d].reshape(b, n, num_heads, dh)
    k = qkv[..., d:2 * d].reshape(b, n, num_heads, dh)
    v = qkv[..., 2 * d:].reshape(b, n, num_heads, dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (dh ** -0.5)
    if n_valid is not None and n_valid < n:
        mask = jnp.arange(n) < n_valid
        scores = jnp.where(mask[None, None, None, :], scores, _NEG_INF)
    p = jax.nn.softmax(scores, axis=-1).astype(qkv.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                   preferred_element_type=jnp.float32).astype(qkv.dtype)
    return o.reshape(b, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _mha_qkv_diff(qkv, num_heads: int, n_valid):
    """Differentiable packed-qkv attention: Pallas forward, XLA-recompute
    backward (rematerialization)."""
    return mha_qkv_pallas(qkv, num_heads, n_valid=n_valid)


def _mha_qkv_fwd(qkv, num_heads, n_valid):
    return mha_qkv_pallas(qkv, num_heads, n_valid=n_valid), (qkv,)


def _mha_qkv_bwd(num_heads, n_valid, res, g):
    (qkv,) = res
    _, vjp = jax.vjp(
        lambda a: mha_qkv_xla(a, num_heads, n_valid=n_valid), qkv)
    return vjp(g)


_mha_qkv_diff.defvjp(_mha_qkv_fwd, _mha_qkv_bwd)


def _mha_qkv_flash_impl(qkv, num_heads: int, n_valid):
    """Packed-qkv -> blockwise flash attention -> packed output.  Pays two
    head-split transposes in HBM, which O(N) memory amortizes at long N."""
    from .flash_attention import flash_attention
    b, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    q = qkv[..., :d].reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)
    k = qkv[..., d:2 * d].reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)
    v = qkv[..., 2 * d:].reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)
    o = flash_attention(q, k, v, n_valid=n_valid,
                        bq=min(512, round_up(n, LANE)), bk=LANE)
    return o.transpose(0, 2, 1, 3).reshape(b, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _mha_qkv_flash_diff(qkv, num_heads: int, n_valid):
    """Differentiable flash path: Pallas forward, XLA-recompute backward."""
    return _mha_qkv_flash_impl(qkv, num_heads, n_valid)


def _mha_qkv_flash_fwd(qkv, num_heads, n_valid):
    return _mha_qkv_flash_impl(qkv, num_heads, n_valid), (qkv,)


_mha_qkv_flash_diff.defvjp(_mha_qkv_flash_fwd, _mha_qkv_bwd)


# Above this sequence length the whole-sequence kernel's (N, N) scores
# stress VMEM and the O(N)-memory blockwise kernel wins.
FLASH_SEQ_THRESHOLD = 1024


def mha_qkv(qkv, num_heads: int, n_valid: int | None = None,
            impl: str = "auto"):
    """Packed-qkv attention dispatch (the model hot path).  ``auto``
    routes long sequences to the O(N) blockwise flash kernel; an
    EXPLICIT impl is honored verbatim (A/B comparisons must measure the
    kernel they name)."""
    if impl == "auto":
        if jax.default_backend() != "tpu":
            impl = "xla"
        elif qkv.shape[1] >= FLASH_SEQ_THRESHOLD:
            impl = "flash"   # long sequences: O(N) blockwise kernel
        else:
            impl = "pallas"
    if impl == "flash":
        return _mha_qkv_flash_diff(qkv, num_heads, n_valid)
    if impl == "pallas":
        return _mha_qkv_diff(qkv, num_heads, n_valid)
    return mha_qkv_xla(qkv, num_heads, n_valid=n_valid)


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
        impl = "flash" if (on_tpu and q.shape[2] >= 1024) else "xla"
    if impl == "flash":
        from .flash_attention import flash_attention
        return flash_attention(q, k, v, n_valid=n_valid)
    if impl == "pallas":
        return mha_pallas(q, k, v, n_valid=n_valid)
    return mha_xla(q, k, v, n_valid=n_valid)
