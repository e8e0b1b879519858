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
