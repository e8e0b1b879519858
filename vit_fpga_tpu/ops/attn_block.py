"""Whole-attention-half mega-kernel: LN -> QKV GEMM -> MHA -> out-proj ->
residual, fused per image.

Why: on ViT-B/16 batch 64 the unfused attention half costs ~9.8 ms/step
(qkv GEMM 2.4, attention 5.5, out-proj 0.9, LN 1.1) while its MXU-bound
floor is ~5 ms.  Fusing the whole half into one Pallas kernel keeps the
qkv tensor, score matrices, and attention output entirely in VMEM, and
gives Mosaic one big instruction stream to overlap MXU (projections,
QK^T, PV) with VPU (LayerNorm, softmax) work across heads.

Weights ride constant-index BlockSpecs, so Mosaic's revolving buffers
fetch them once for the whole batch sweep.  VMEM at ViT-B geometry:
wqkv 3.4 MB + wo 1.1 MB + x/qkv/out tiles ~2 MB + scores scratch 3 MB.

Inference-only (no custom VJP); the training path uses the XLA graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import LANE, round_up

_NEG_INF = -1e30


def _attn_block_kernel(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wo_ref,
                       bo_ref, o_ref, qkv_ref, scores_ref, ao_ref, *,
                       eps: float, scale: float, n_valid: int, n_pad: int,
                       n_heads: int, dh: int):
    x = x_ref[0]                                      # (n_pad, d) model dtype
    d = n_heads * dh

    # LayerNorm (f32 statistics)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ls_ref[0] +
          lb_ref[0]).astype(x.dtype)

    # QKV projection (one big MXU GEMM, K = d)
    qkv_ref[:] = (jnp.dot(xn, wqkv_ref[:],
                          preferred_element_type=jnp.float32)
                  + bqkv_ref[0]).astype(x.dtype)

    # Attention: phase-split (all QK^T, then softmax+PV per head)
    qkv = qkv_ref[:]
    for h in range(n_heads):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, d + h * dh:d + (h + 1) * dh]
        scores_ref[h] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    for h in range(n_heads):
        s = scores_ref[h]
        if n_valid < n_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        v = qkv[:, 2 * d + h * dh:2 * d + (h + 1) * dh]
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
    n_pad = round_up(n, LANE)
    if n_pad != n:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_attn_block_kernel, eps=eps,
                          scale=1.0 / (dh ** 0.5),
                          n_valid=min(n_valid, n), n_pad=n_pad,
                          n_heads=num_heads, dh=dh),
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
            pltpu.VMEM((n_pad, 3 * d), x.dtype),
            pltpu.VMEM((num_heads, n_pad, n_pad), jnp.float32),
            pltpu.VMEM((n_pad, d), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * d * (3 * d + d)
            + 4 * b * num_heads * n_pad * n_pad * dh,
            bytes_accessed=2 * b * n_pad * d * x.dtype.itemsize
            + (4 * d * d + 3 * d * d) * 2,
            transcendentals=b * num_heads * n_pad * n_pad),
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
