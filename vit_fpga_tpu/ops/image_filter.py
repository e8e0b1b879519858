"""Streaming image-processing kernel — the ``image_process`` equivalent.

The reference drives an opaque FPGA bitstream kernel named ``image_process``
over 1920x1080 single-channel uint8 frames (src/netFPGA.cpp:297-327,
include/netFPGA.h:14-15); the device code is not in the repo, so the filter
semantics are defined HERE, once, and shared by three implementations:

  * :func:`filter_image_numpy`  — the host/CPU oracle (zero deps beyond numpy)
  * :func:`filter_image_xla`    — plain XLA convolution (portable fallback)
  * :func:`filter_image_pallas` — the TPU Pallas kernel (the hot path)

Semantics: 3x3 convolution, zero padding at the borders, float32 accumulate,
round-half-to-even, clip to [0, 255], back to uint8.

The Pallas kernel keeps the whole padded frame resident in VMEM (a 1080p
uint8 frame is ~2 MB, comfortably inside the ~16 MB VMEM budget) and sweeps
row tiles with fully static control flow so Mosaic can software-pipeline the
shifted reads; the nine taps become shifted VPU multiply-accumulates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import LANE, round_up

# 3x3 filter taps, name -> kernel. float32, row-major [dy][dx].
FILTERS = {
    "sharpen": np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]],
                        dtype=np.float32),
    "blur": np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]],
                     dtype=np.float32) / 16.0,
    "edge": np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=np.float32),
    "identity": np.array([[0, 0, 0], [0, 1, 0], [0, 0, 0]], dtype=np.float32),
}

_ROW_TILE = 128  # rows processed per sweep step inside the kernel


def filter_image_numpy(img: np.ndarray, name: str) -> np.ndarray:
    """Oracle implementation. ``img`` is (H, W) uint8; returns (H, W) uint8."""
    k = FILTERS[name]
    h, w = img.shape
    p = np.zeros((h + 2, w + 2), dtype=np.float32)
    p[1:-1, 1:-1] = img.astype(np.float32)
    acc = np.zeros((h, w), dtype=np.float32)
    for dy in range(3):
        for dx in range(3):
            if k[dy, dx] != 0.0:
                acc += k[dy, dx] * p[dy:dy + h, dx:dx + w]
    return np.clip(np.rint(acc), 0, 255).astype(np.uint8)


@functools.partial(jax.jit, static_argnames=("name",))
def filter_image_xla(img: jax.Array, name: str) -> jax.Array:
    """XLA fallback with identical semantics."""
    k = jnp.asarray(FILTERS[name])
    x = img.astype(jnp.float32)[None, None]           # NCHW
    kern = k[None, None]                              # OIHW
    out = jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=((1, 1), (1, 1)))
    return jnp.clip(jnp.round(out[0, 0]), 0, 255).astype(jnp.uint8)


def _filter_kernel(in_ref, out_ref, *, taps, n_tiles, w_out):
    """Sweep row tiles of the padded frame; 9 shifted VPU MACs per tile.

    ``in_ref``: (Hp, Wp) uint8 padded frame in VMEM, image origin at (1, 1).
    ``out_ref``: (n_tiles * _ROW_TILE, w_out) uint8.
    All offsets are Python-static so the loop fully unrolls.
    """
    for i in range(n_tiles):
        r0 = i * _ROW_TILE
        # Mosaic has no direct uint8->f32 cast; hop through int32.
        block = in_ref[r0:r0 + _ROW_TILE + 2, :].astype(jnp.int32).astype(
            jnp.float32)
        acc = jnp.zeros((_ROW_TILE, w_out), dtype=jnp.float32)
        for dy in range(3):
            for dx in range(3):
                t = float(taps[dy][dx])
                if t != 0.0:
                    acc = acc + t * block[dy:dy + _ROW_TILE, dx:dx + w_out]
        out_ref[r0:r0 + _ROW_TILE, :] = jnp.clip(
            jnp.round(acc), 0, 255).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("name",))
def filter_image_pallas(img: jax.Array, name: str) -> jax.Array:
    """Pallas TPU path. ``img`` is (H, W) uint8; returns (H, W) uint8."""
    h, w = img.shape
    # Padded geometry: image origin at (1,1) so tap (dy,dx) reads are all
    # in-bounds; lane dim rounded to 128, rows rounded to the tile sweep.
    w_out = round_up(w, LANE)
    wp = w_out + LANE
    n_tiles = round_up(h, _ROW_TILE) // _ROW_TILE
    hp = n_tiles * _ROW_TILE + _ROW_TILE  # slack covers the +2 halo reads
    padded = jnp.zeros((hp, wp), dtype=jnp.uint8)
    padded = jax.lax.dynamic_update_slice(padded, img, (1, 1))

    taps = tuple(tuple(float(v) for v in row) for row in FILTERS[name])
    out = pl.pallas_call(
        functools.partial(_filter_kernel, taps=taps, n_tiles=n_tiles,
                          w_out=w_out),
        out_shape=jax.ShapeDtypeStruct((n_tiles * _ROW_TILE, w_out),
                                       jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(padded)
    return out[:h, :w].astype(jnp.uint8)


def filter_image_device(img: jax.Array, name: str,
                        use_pallas: bool = True) -> jax.Array:
    """Dispatch: Pallas on TPU when the frame fits VMEM, XLA otherwise."""
    h, w = img.shape
    fits_vmem = (h + 2) * round_up(w + 2, LANE) * 2 < 12 * 1024 * 1024
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if use_pallas and on_tpu and fits_vmem:
        return filter_image_pallas(img, name)
    return filter_image_xla(img, name)
