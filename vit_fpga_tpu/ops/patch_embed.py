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
# Transpose-free fused embed (round 3): the patchify transpose is the
# embed stage's real cost, not the GEMM.  perf_lat_split.py measured the
# XLA astype+patchify+pad chain at ~18 us at batch 1 (the GEMM is ~1 us
# of MXU time); experiments/perf_patchify.py then raced four ways to
# build the token tensor from a raw (B, H, W, 3) image:
#
#   patchify -> Pallas embed kernel   13-20 us   (round-2 path)
#   lax.conv stride P                 ~78 us     (XLA conv lowering)
#   multi-contracting dot_general      8-11 us   <- winner
#   Pallas strip kernel               13-19 us   (ties the round-2 path)
#
# The winner reshapes (B, H, W, 3) -> (B, gh, P, gw, P*3) — every split
# is contiguous, NO transpose — and contracts dims (P, P*3) of the image
# against a (P, P*3, D) view of the kernel:
#
#   tokens[b, gy, gx, d] = sum_{py, qx} x5[b, gy, py, gx, qx] K3[py, qx, d]
#
# which is exactly the patch-embedding GEMM with the (py) contraction
# hoisted into a second contracting dimension, so XLA's MXU lowering
# absorbs the patch gather and the relayout pass disappears.  At batch
# 64 the same trick beats the round-2 fused embed kernel 260 us vs
# 315 us (the kernel still paid for patchify upstream).  Pure XLA: no
# VMEM fit-gate, works on CPU, differentiable natively — it supersedes
# the round-2 embed_tokens Pallas kernel and the cls-last variants.
#
# Token ORDER remains a free choice (attention is permutation-
# equivariant).  The throughput path keeps prefix-FIRST (CLS at row 0);
# the latency path uses prefix-LAST so the GEMM body lands at row
# offset 0 and the pooling row moves to index n_patches
# (models/vit.forward_latency).
# ---------------------------------------------------------------------------


def embed_tokens_dotg(images: jax.Array, kernel: jax.Array,
                      posb: jax.Array, patch: int, n_prefix: int,
                      prefix_last: bool = False,
                      out_dtype=None) -> jax.Array:
    """(B, H, W, 3) images -> (B, n_pad, D) tokens, no transpose.

    ``kernel`` is the (P*P*3, D) patch-embed weight in compute dtype,
    pixel order (py, px, c).  ``posb`` is the (n_pad, D) f32 fold of
    bias + pos-embed (+ prefix token rows, + zero tail rows); its row
    order must match ``prefix_last``:

      prefix_last=False: [prefix rows | patch rows | tail]
      prefix_last=True:  [patch rows | prefix rows | tail]

    The patch-row slice of ``posb`` carries pos+bias; prefix rows carry
    cls+pos; tail rows are zero.  n_pad == posb.shape[0] may equal the
    unpadded N (no tail) — e.g. CLIP pads after its pre-LN instead.
    """
    b, h, w, _ = images.shape
    gh, gw = h // patch, w // patch
    npch = gh * gw
    n_pad, d = posb.shape
    dt = out_dtype or kernel.dtype
    x5 = images.reshape(b, gh, patch, gw, patch * 3)
    k3 = kernel.reshape(patch, patch * 3, d)
    y = jax.lax.dot_general(x5, k3, (((2, 4), (0, 1)), ((), ())),
                            preferred_element_type=jnp.float32)
    posb = posb.astype(jnp.float32)
    lo = 0 if prefix_last else n_prefix      # posb row where patches start
    # posb add RANK-MATCHED to the dot output, before the reshape: XLA
    # fuses it into the GEMM epilogue.  Reshape-then-add materializes
    # the 61 MB f32 dot result to HBM and reads it back (~140 us at
    # ViT-B b64 — measured, experiments/perf_embed_r3.py D vs D2);
    # identical f32 math, bit-exact output.
    pb4 = posb[lo:lo + npch].reshape(1, gh, gw, d)
    body = (y + pb4).astype(dt).reshape(b, npch, d)

    def bcast(rows):                          # constant rows, broadcast on B
        return jnp.broadcast_to(rows.astype(dt)[None],
                                (b,) + rows.shape)
    parts = [body] if prefix_last else [bcast(posb[:n_prefix]), body]
    if lo + npch < n_pad:                     # prefix-last rest / tail rows
        parts.append(bcast(posb[lo + npch:]))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


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
