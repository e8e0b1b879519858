"""Fused preprocess + patchify + embedding GEMM.

BASELINE north_star asks for "image-side preprocessing (resize, normalize,
patchify) fused into the first kernel so a raw image tensor goes in and
class logits come out in one XLA program".  The TPU-first observation: the
normalize step (u/255 - mean)/std is a per-channel AFFINE map, so it folds
exactly into the patch-embedding GEMM's weights and bias —

    kernel'[i, d] = kernel[i, d] / (255 * std_c(i))
    bias'[d]      = bias[d] - sum_i (mean_c(i) / std_c(i)) * kernel[i, d]

after which raw uint8 pixels -> embedded tokens is ONE GEMM with zero
preprocessing arithmetic.  :func:`fold_preprocess` computes the folded
weights; both the XLA path and the Pallas kernel below consume them.

The Pallas kernel (:func:`patch_embed_pallas`) processes one patch-row per
grid cell: it reads a (P, W, 3) strip, reshapes each pixel row to
(W/P, P*3) — contiguous, no relayout — and accumulates P small GEMMs
against the per-pixel-row slices of the kernel.  At ViT sizes the embed
GEMM is <1% of model FLOPs, so the XLA path (which fuses the patchify
reshape into the GEMM) is the default; the kernel exists for fusing
further stages in later rounds and is parity-tested against the oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_preprocess(kernel: np.ndarray, bias: np.ndarray,
                    mean: Tuple[float, ...], std: Tuple[float, ...],
                    patch: int) -> Tuple[np.ndarray, np.ndarray]:
    """Fold (u/255 - mean)/std into (kernel, bias).

    ``kernel`` is (P*P*3, D) with pixel order (py, px, c) — the layout of
    models/vit.py.  Returns (kernel', bias') operating directly on raw
    uint8 pixel values.
    """
    kernel = np.asarray(kernel, np.float64)
    bias = np.asarray(bias, np.float64)
    p3 = kernel.shape[0]
    assert p3 == patch * patch * 3
    c_of = np.tile(np.arange(3), patch * patch)
    stdv = np.asarray(std, np.float64)[c_of]          # (P*P*3,)
    meanv = np.asarray(mean, np.float64)[c_of]
    kernel_f = kernel / (255.0 * stdv)[:, None]
    bias_f = bias - (meanv / stdv) @ kernel
    return kernel_f.astype(np.float32), bias_f.astype(np.float32)


def patch_embed_xla(images_u8: jax.Array, kernel_f: jax.Array,
                    bias_f: jax.Array, patch: int,
                    out_dtype=jnp.bfloat16) -> jax.Array:
    """Raw uint8 (B, H, W, 3) -> tokens (B, N, D) with folded weights."""
    from ..models.vit import patchify
    x = patchify(images_u8.astype(jnp.float32), patch)
    return (x @ kernel_f + bias_f).astype(out_dtype)


# ---------------------------------------------------------------------------
# Fused token-assembly embed (round 2): one kernel turns the patch matrix
# into the PADDED token tensor the padded-residency encoder consumes —
# GEMM + bias + positional embedding + CLS row + tail zeros in one pass,
# replacing XLA's embed-GEMM -> concat(cls) -> +pos -> pad chain (each a
# full HBM round-trip over the ~20 MB token tensor at ViT-B b64).
#
# The CLS row needs no in-kernel concat: the caller pads the patch matrix
# with a leading zero row (fused into patchify's transpose copy by XLA)
# and folds cls_token+pos[0] into row 0 of a (n_pad, D) "posb" table —
# row 0 of the GEMM output is 0, so adding the table plants the CLS row;
# the GEMM bias is folded into the table's patch rows; tail rows are 0.
# ---------------------------------------------------------------------------


def embed_tokens_fits(n_pad: int, p3: int, d: int, itemsize: int,
                      budget: int = 13 * 1024 * 1024) -> bool:
    """VMEM fit-gate for the fused token-assembly embed (mirrors
    attn_block's planner, ADVICE r2): per grid step the kernel holds the
    double-buffered (n_pad, P²3) patch block and (n_pad, D) out block,
    the (P²3, D) weight, and the f32 (n_pad, D) posb table.  Oversize
    geometries (e.g. ViT-H/14 at 448px) fall back to the XLA embed
    chain instead of failing at compile time."""
    need = (2 * n_pad * p3 * itemsize      # in, double-buffered
            + 2 * n_pad * d * itemsize     # out, double-buffered
            + p3 * d * itemsize            # kernel
            + n_pad * d * 4)               # posb (f32)
    return need <= budget


def _embed_tokens_kernel(p_ref, k_ref, pb_ref, o_ref):
    acc = jnp.dot(p_ref[0], k_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = (acc + pb_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def embed_tokens_pallas(patches_padded: jax.Array, kernel: jax.Array,
                        posb: jax.Array, interpret: bool = False):
    """(B, n_pad, P*P*3) zero-row-0 patches -> (B, n_pad, D) tokens.

    ``posb`` is the (n_pad, D) f32 fold of bias/cls/pos described above.
    Output dtype follows ``kernel``'s dtype (the compute dtype).
    """
    b, n_pad, p3 = patches_padded.shape
    d = kernel.shape[-1]
    out = pl.pallas_call(
        _embed_tokens_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad, p3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p3, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), kernel.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * p3 * d,
            bytes_accessed=(b * n_pad * (p3 + d)
                            * patches_padded.dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(patches_padded, kernel, posb.astype(jnp.float32))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def embed_tokens(patches_padded, kernel, posb):
    """Differentiable fused embed: Pallas forward, XLA backward."""
    return embed_tokens_pallas(patches_padded, kernel, posb)


def _embed_tokens_ref(patches_padded, kernel, posb):
    acc = jnp.einsum("bnp,pd->bnd", patches_padded, kernel,
                     preferred_element_type=jnp.float32)
    return (acc + posb.astype(jnp.float32)).astype(kernel.dtype)


def _embed_tokens_fwd(patches_padded, kernel, posb):
    return embed_tokens_pallas(patches_padded, kernel, posb), (
        patches_padded, kernel, posb)


def _embed_tokens_bwd(res, g):
    _, vjp = jax.vjp(_embed_tokens_ref, *res)
    return vjp(g)


embed_tokens.defvjp(_embed_tokens_fwd, _embed_tokens_bwd)


def _pe_kernel(img_ref, k_ref, b_ref, o_ref, *, patch: int, gw: int,
               d_model: int):
    """One (image, patch-row) cell.

    img_ref: (1, P, W, 3) uint8; k_ref: (P, P*3, D) folded kernel;
    b_ref: (1, D); o_ref: (1, GW, D).
    """
    acc = jnp.zeros((gw, d_model), jnp.float32)
    for py in range(patch):
        # (W, 3) -> (GW, P*3): contiguous reshape, no relayout
        row = img_ref[0, py].astype(jnp.int32).astype(jnp.float32)
        row = row.reshape(gw, patch * 3)
        acc = acc + jnp.dot(row, k_ref[py],
                            preferred_element_type=jnp.float32)
    o_ref[0] = (acc + b_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("patch", "out_dtype", "interpret"))
def patch_embed_pallas(images_u8: jax.Array, kernel_f: jax.Array,
                       bias_f: jax.Array, patch: int,
                       out_dtype=jnp.bfloat16,
                       interpret: bool = False) -> jax.Array:
    """Fused uint8 -> tokens Pallas kernel (folded weights)."""
    b, h, w, c = images_u8.shape
    assert c == 3 and h % patch == 0 and w % patch == 0
    gh, gw = h // patch, w // patch
    d_model = kernel_f.shape[-1]
    k3 = kernel_f.reshape(patch, patch * 3, d_model)

    out = pl.pallas_call(
        functools.partial(_pe_kernel, patch=patch, gw=gw, d_model=d_model),
        grid=(b, gh),
        in_specs=[
            pl.BlockSpec((1, patch, w, 3), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((patch, patch * 3, d_model),
                         lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_model), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, gw, d_model), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, gh * gw, d_model), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * gh * gw * patch * patch * 3 * d_model,
            bytes_accessed=b * h * w * 3 + 4 * k3.size,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(images_u8, k3, bias_f.reshape(1, -1))
    return out


# ---------------------------------------------------------------------------
# CLS-LAST fused embed (round 3): consumes the raw patchify output with
# NO padding pass.  XLA's pad of the (196, P²3) patch matrix costs
# ~15-20 µs at batch 1 (experiments/perf_lat_split.py — the pad
# materializes a fresh padded tensor whether or not the prefix shift is
# present, while patchify itself is ~3 µs).  Attention is permutation-
# equivariant, so token ORDER is a free choice: putting the CLS/prefix
# rows AFTER the patches ("cls-last") keeps the patch GEMM's output
# rows at offset 0 (aligned), and the prefix + tail-zero rows come from
# the posb table alone.  Valid tokens stay contiguous (0..n-1), so the
# encoder's n_valid mask is unchanged; only the pooling row moves to
# the end (models/vit.forward_latency).
# ---------------------------------------------------------------------------


def embed_cls_last_fits(n_patches: int, n_pad: int, p3: int, d: int,
                        itemsize: int,
                        budget: int = 13 * 1024 * 1024) -> bool:
    """VMEM fit-gate for the cls-last embed (mirrors embed_tokens_fits;
    the in block is the UNPADDED patch matrix)."""
    need = (2 * n_patches * p3 * itemsize   # in, double-buffered
            + 2 * n_pad * d * itemsize      # out, double-buffered
            + p3 * d * itemsize             # kernel
            + n_pad * d * 4)                # posb (f32)
    return need <= budget


def _embed_cls_last_kernel(p_ref, k_ref, pb_ref, o_ref, *,
                           n_patches: int):
    acc = jnp.dot(p_ref[0], k_ref[:], preferred_element_type=jnp.float32)
    o_ref[0, :n_patches] = (acc + pb_ref[:n_patches]).astype(o_ref.dtype)
    o_ref[0, n_patches:] = pb_ref[n_patches:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def embed_tokens_cls_last(patches: jax.Array, kernel: jax.Array,
                          posb: jax.Array, interpret: bool = False):
    """(B, n_patches, P*P*3) UNPADDED patches -> (B, n_pad, D) tokens,
    prefix rows at the END.  ``posb`` is (n_pad, D) f32:
    rows [0, n_patches) = pos+bias for the patch rows, rows
    [n_patches, n) = cls+pos for the prefix rows, tail rows zero."""
    b, npch, p3 = patches.shape
    n_pad, d = posb.shape
    out = pl.pallas_call(
        functools.partial(_embed_cls_last_kernel, n_patches=npch),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, npch, p3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p3, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), kernel.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(patches, kernel, posb.astype(jnp.float32))
    return out


def _embed_int8_cls_last_kernel(p_ref, k_ref, s_ref, pb_ref, o_ref, *,
                                n_patches: int):
    from .quant_block import _row_quant
    xq, sx = _row_quant(p_ref[0].astype(jnp.float32))
    acc = jax.lax.dot_general(xq, k_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    emb = acc.astype(jnp.float32) * (sx * s_ref[0])
    o_ref[0, :n_patches] = (emb + pb_ref[:n_patches]).astype(o_ref.dtype)
    o_ref[0, n_patches:] = pb_ref[n_patches:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def embed_tokens_int8_cls_last(patches: jax.Array, wq: jax.Array,
                               ws: jax.Array, posb: jax.Array,
                               interpret: bool = False):
    """Int8 cls-last embed: in-kernel row quantization of the patch
    rows, int8 GEMM, rank-1 dequant, posb add.  Output bf16."""
    b, npch, p3 = patches.shape
    n_pad, d = posb.shape
    out = pl.pallas_call(
        functools.partial(_embed_int8_cls_last_kernel, n_patches=npch),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, npch, p3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p3, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(patches, wq, ws.reshape(1, d).astype(jnp.float32),
      posb.astype(jnp.float32))
    return out
