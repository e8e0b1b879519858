"""Whole-attention-half mega-kernel: LN -> QKV GEMM -> MHA -> out-proj ->
residual, fused per image.

Why: on ViT-B/16 batch 64 the unfused attention half costs ~9.8 ms/step
(qkv GEMM 2.4, attention 5.5, out-proj 0.9, LN 1.1) while its MXU-bound
floor is ~5 ms.  Fusing the whole half into one Pallas kernel keeps the
qkv tensor, score matrices, and attention output entirely in VMEM, and
gives Mosaic one big instruction stream to overlap MXU (projections,
QK^T, PV) with VPU (LayerNorm, softmax) work across heads.

v2 design (round 2; measured on v5e, experiments/perf_attn_v2.py):

  * Token ROWS (the GEMM M dim) are padded only to the sublane multiple
    (16 for bf16, 8 for f32) instead of the 128 lane width: seq 197 runs
    on 208 rows, not 256 — ~19% of projection FLOPs saved.  Only the
    scores' LANE dim needs 128 alignment, so the kernel keeps a separate
    128-padded K/V panel (``qkv_s`` scratch, tail zeroed) that the score
    and PV contractions read; a zeroed tail + the column mask keep the
    math exact.  Measured: 0.705 -> 0.490 ms per layer at ViT-B/16 b64,
    bit-exact vs v1.
  * Softmax stays PHASE-SPLIT (all QK^T of a head group, then all
    softmax+PV): an interleaved "rolling" schedule measured 3x slower —
    Mosaic schedules the straight-line phases better than a hand pipeline.
  * Head groups: the scores scratch holds ``n_sc <= H`` head slots chosen
    to fit the VMEM budget, so CLIP ViT-L/14 (16 heads x d=1024, seq 257)
    fits the fused kernel too instead of falling back to unfused XLA.

Weights ride constant-index BlockSpecs, so Mosaic's revolving buffers
fetch them once for the whole batch sweep.

Differentiable via custom VJP (Pallas forward, XLA-recompute backward).
Reference parity hook: this kernel is the ViT-scope "network_v1" device
program the reference dispatched but never shipped (SURVEY.md §2.2 item 4;
/root/reference/src/netFPGA.cpp:250,388).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import LANE, SUBLANE_BF16, SUBLANE_F32, round_up

_NEG_INF = -1e30


def _sublane(dtype) -> int:
    return SUBLANE_BF16 if dtype == jnp.bfloat16 else SUBLANE_F32


def score_slots(n_heads: int, d: int, n_pad: int, kv_pad: int,
                itemsize: int, budget: int = 13 * 1024 * 1024) -> int:
    """Largest head-group size whose total VMEM footprint fits ``budget``.

    Footprint: resident weights (wqkv + wo), qkv K/V panel, attention-out
    scratch, in/out token tiles (double-buffered by Mosaic), and
    ``n_sc`` f32 score slots.  Returns 0 if even 1 slot does not fit.
    """
    weights = (3 * d * d + d * d) * itemsize
    panel = kv_pad * 3 * d * itemsize
    ao = n_pad * d * itemsize
    tiles = 4 * n_pad * d * itemsize   # x in + out, double-buffered
    fixed = weights + panel + ao + tiles
    slot = n_pad * kv_pad * 4
    if fixed + slot > budget:
        return 0
    return min(n_heads, (budget - fixed) // slot)


def _attn_block_kernel(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wo_ref,
                       bo_ref, o_ref, qkv_ref, scores_ref, ao_ref, *,
                       eps: float, scale: float, n_valid: int, n_pad: int,
                       kv_pad: int, n_heads: int, dh: int, n_sc: int):
    x = x_ref[0]                                      # (n_pad, d) model dtype
    d = n_heads * dh

    # LayerNorm (f32 statistics)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ls_ref[0] +
          lb_ref[0]).astype(x.dtype)

    # QKV projection (one big MXU GEMM on n_pad rows, K = d), written into
    # the 128-aligned K/V panel; zeroed tail keeps PV exact (masked scores
    # make P's tail columns exactly 0, and 0 * 0 = 0 — never 0 * garbage).
    qkv = (jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
           + bqkv_ref[0]).astype(x.dtype)
    if kv_pad != n_pad:
        qkv_ref[:n_pad] = qkv
        qkv_ref[n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d), x.dtype)
    else:
        qkv_ref[:] = qkv

    # Attention, phase-split in head groups of n_sc: all QK^T of the group
    # first (MXU), then softmax+PV per head (VPU feeds MXU).
    for g in range(0, n_heads, n_sc):
        heads = range(g, min(g + n_sc, n_heads))
        for h in heads:
            q = qkv_ref[:n_pad, h * dh:(h + 1) * dh]
            k = qkv_ref[:, d + h * dh:d + (h + 1) * dh]
            scores_ref[h - g] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        for h in heads:
            s = scores_ref[h - g]
            if n_valid < kv_pad:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n_valid, s, _NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
            v = qkv_ref[:, 2 * d + h * dh:2 * d + (h + 1) * dh]
            ao_ref[:, h * dh:(h + 1) * dh] = jnp.dot(
                p, v, preferred_element_type=jnp.float32).astype(x.dtype)

    # Output projection + residual
    y = jnp.dot(ao_ref[:], wo_ref[:],
                preferred_element_type=jnp.float32) + bo_ref[0]
    o_ref[0] = x + y.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "n_valid",
                                             "interpret"))
def attn_block_pallas(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                      num_heads: int, eps: float = 1e-6,
                      n_valid: int | None = None,
                      interpret: bool = False):
    """x: (B, N, D) -> x + OutProj(MHA(QKV(LN(x)))). Weights any dtype
    (cast to x.dtype); biases f32."""
    b, n, d = x.shape
    dh = d // num_heads
    if n_valid is None:
        n_valid = n
    n_pad = round_up(n, _sublane(x.dtype))
    kv_pad = round_up(n, LANE)
    if n_pad != n:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])
    n_sc = score_slots(num_heads, d, n_pad, kv_pad, x.dtype.itemsize)
    if n_sc < 1:
        raise ValueError(
            f"attn_block does not fit VMEM at d={d}, seq={n}; "
            "use flash_attention / the XLA path")

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_attn_block_kernel, eps=eps,
                          scale=1.0 / (dh ** 0.5),
                          n_valid=min(n_valid, n), n_pad=n_pad,
                          kv_pad=kv_pad, n_heads=num_heads, dh=dh,
                          n_sc=n_sc),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, d)), const((1, d)),
            const((d, 3 * d)), const((1, 3 * d)),
            const((d, d)), const((1, d)),
        ],
        out_specs=pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((kv_pad, 3 * d), x.dtype),
            pltpu.VMEM((n_sc, n_pad, kv_pad), jnp.float32),
            pltpu.VMEM((n_pad, d), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * d * (3 * d + d)
            + 4 * b * num_heads * n_pad * kv_pad * dh,
            bytes_accessed=2 * b * n_pad * d * x.dtype.itemsize
            + (4 * d * d + 3 * d * d) * 2,
            transcendentals=b * num_heads * n_pad * kv_pad),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, ln_scale.reshape(1, -1).astype(jnp.float32),
      ln_bias.reshape(1, -1).astype(jnp.float32),
      wqkv.astype(x.dtype), bqkv.reshape(1, -1).astype(jnp.float32),
      wo.astype(x.dtype), bo.reshape(1, -1).astype(jnp.float32))
    return out[:, :n, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def attn_block(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, num_heads: int,
               eps: float):
    """Differentiable fused attention half: Pallas forward, XLA-recompute
    backward (rematerialization; see ops/fused_mlp.py)."""
    return attn_block_pallas(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                             num_heads, eps=eps)


def _attn_block_fwd(x, ls, lb, wqkv, bqkv, wo, bo, num_heads, eps):
    out = attn_block_pallas(x, ls, lb, wqkv, bqkv, wo, bo, num_heads,
                            eps=eps)
    return out, (x, ls, lb, wqkv, bqkv, wo, bo)


def _attn_block_bwd(num_heads, eps, res, g):
    _, vjp = jax.vjp(
        lambda *a: attn_block_xla(*a, num_heads=num_heads, eps=eps), *res)
    return vjp(g)


attn_block.defvjp(_attn_block_fwd, _attn_block_bwd)


def attn_block_xla(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                   num_heads: int, eps: float = 1e-6,
                   n_valid: int | None = None):
    """Reference implementation with identical semantics."""
    from .attention import mha_qkv_xla
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ln_scale +
          ln_bias).astype(x.dtype)
    qkv = (jnp.dot(xn, wqkv.astype(x.dtype),
                   preferred_element_type=jnp.float32)
           + bqkv).astype(x.dtype)
    o = mha_qkv_xla(qkv, num_heads, n_valid=n_valid)
    y = jnp.dot(o, wo.astype(x.dtype),
                preferred_element_type=jnp.float32) + bo
    return x + y.astype(x.dtype)
