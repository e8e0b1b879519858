"""Shared helpers for Pallas TPU kernels."""

from __future__ import annotations

import os

import jax.numpy as jnp

# MXU / VPU native tile geometry (lane dim is always 128).
LANE = 128
SUBLANE_F32 = 8
SUBLANE_BF16 = 16
SUBLANE_I8 = 32

# TPU v5e single-chip peaks, used for roofline math in benches.
V5E_BF16_FLOPS = 197e12
V5E_INT8_OPS = 394e12
V5E_HBM_BYTES_PER_S = 819e9


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Token-row pad granularity for the padded-residency layout.  bf16's
# native tile is (16, 128) but Mosaic's hard requirement is only
# divisibility by 8 (masked half-tiles), so padding ViT-B's 197 tokens
# to 200 instead of 208 cuts 4% of the rows off every qkv/MLP/PV GEMM.
# Measured bit-exact and faster on hw, 4/4 A/B rounds
# (experiments/perf_pad200.py: 13.83 -> 13.48 ms/step at b64): see
# docs/perf.md "Token-row pad granularity".
#
# Escape hatch: masked bf16 half-tiles are a Mosaic behavior, not a
# documented guarantee.  If a toolchain bump rejects pad-8 shapes, set
# VIT_PAD_SUBLANE_BF16=16 to degrade to the old (correct, ~4% slower)
# native-tile layout instead of failing every bf16 Pallas compile.
_PAD_SUBLANE_BF16 = int(os.environ.get("VIT_PAD_SUBLANE_BF16", "8"))
if _PAD_SUBLANE_BF16 not in (8, 16):
    raise ValueError("VIT_PAD_SUBLANE_BF16 must be 8 or 16")


def pad_sublane(dtype) -> int:
    """Sublane multiple used to pad token rows for this compute dtype.

    Every padded-residency site (models and kernels) MUST agree on this
    value so tensors flow between kernels without re-padding.
    """
    if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16):
        return _PAD_SUBLANE_BF16
    return SUBLANE_F32


def pad_sublane_itemsize(itemsize: int) -> int:
    """pad_sublane keyed by itemsize (2 = bf16, 4 = f32)."""
    return _PAD_SUBLANE_BF16 if itemsize == 2 else SUBLANE_F32


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pad_to(x, shape):
    """Zero-pad trailing dims of ``x`` up to ``shape``."""
    pads = [(0, t - s) for s, t in zip(x.shape, shape)]
    if all(p == (0, 0) for p in pads):
        return x
    return jnp.pad(x, pads)
