"""Shared helpers for Pallas TPU kernels."""

from __future__ import annotations

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


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pad_to(x, shape):
    """Zero-pad trailing dims of ``x`` up to ``shape``."""
    pads = [(0, t - s) for s, t in zip(x.shape, shape)]
    if all(p == (0, 0) for p in pads):
        return x
    return jnp.pad(x, pads)
