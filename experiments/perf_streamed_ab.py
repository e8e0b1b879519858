"""Round 5: streamed_gemm earn-or-retire A/B (VERDICT r4 #6).

ops/streamed_gemm.py (manual two-slot DMA double buffer) has no
production call site; the claim that Mosaic's revolving block buffers
subsume it was never measured.  A/B at the two geometries where explicit
weight streaming could plausibly win:

  A  ViT-H@224 b32 MLP (26.2 MB weights — past MLP_BIG_WEIGHT_LIMIT, so
     production falls back to XLA): XLA two-GEMM MLP vs a streamed-GEMM
     composition (LN/act in XLA around two streamed_gemm calls) vs the
     chunked fused kernel.
  B  ViT-L/16@384 batch-1 MLP (the b1 stack's per-layer weight stream):
     XLA vs streamed composition at 584 rows.

First run found the original single-cell kernel cannot even FIT these
production shapes (x + out + f32 acc + 2 slots all VMEM-resident ->
compile OOM); the round-5 tiled version adds a (rows, cols) grid so the
A/B is fair.

Run: python experiments/perf_streamed_ab.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vit_fpga_tpu.ops.fused_mlp import fused_mlp_chunked_pallas, fused_mlp_xla
from vit_fpga_tpu.ops.streamed_gemm import streamed_gemm
from vit_fpga_tpu.utils.timing import time_device_loop

print("device:", jax.devices(), flush=True)


def gelu_fma(h):
    h2 = h * h
    u = h * (0.7978845608028654 + 0.035677408136300125 * h2)
    hh = 0.5 * h
    return hh + hh * jnp.tanh(u)


def make_cases(t, d, m, tag, tiles, n_lo=4, n_hi=12):
    """``tiles`` = ((bk1, bt1, bn1), (bk2, bt2, bn2)) VMEM-fitting grid
    tiles for the two streamed GEMMs (x row tile + f32 acc + out tile +
    2 DMA slots must fit ~16 MB)."""
    key = jax.random.key(0)
    ks = jax.random.split(key, 5)
    x = jax.device_put(jax.random.normal(
        ks[0], (t, d), jnp.float32).astype(jnp.bfloat16))
    ls = jnp.ones((d,), jnp.float32)
    lb = jnp.zeros((d,), jnp.float32)
    w1 = jax.device_put(jax.random.normal(
        ks[1], (d, m), jnp.float32).astype(jnp.bfloat16) * 0.02)
    b1 = jnp.zeros((m,), jnp.float32)
    w2 = jax.device_put(jax.random.normal(
        ks[2], (m, d), jnp.float32).astype(jnp.bfloat16) * 0.02)
    b2 = jnp.zeros((d,), jnp.float32)
    (bk1, bt1, bn1), (bk2, bt2, bn2) = tiles

    def mlp_xla(w1, w2, x):
        return jnp.sum(fused_mlp_xla(x, ls, lb, w1, b1, w2, b2,
                                     act="gelu_tanh").astype(jnp.float32))

    def mlp_streamed(w1, w2, x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * ls
              + lb).astype(x.dtype)
        h = streamed_gemm(xn, w1, bk=bk1, bt=bt1,
                          bn=bn1).astype(jnp.float32) + b1
        h = gelu_fma(h).astype(x.dtype)
        y = streamed_gemm(h, w2, bk=bk2, bt=bt2,
                          bn=bn2).astype(jnp.float32) + b2
        return jnp.sum(x.astype(jnp.float32) + y)

    def mlp_chunked(w1, w2, x):
        return jnp.sum(fused_mlp_chunked_pallas(
            x, ls, lb, w1, b1, w2, b2, act="gelu_tanh",
            n_chunks=4).astype(jnp.float32))

    cases = [("xla", mlp_xla), ("streamed", mlp_streamed),
             ("chunked4", mlp_chunked)]
    for r in range(3):
        row = []
        for name, fn in cases:
            try:
                tt = time_device_loop(fn, (w1, w2, x), n_lo=n_lo,
                                      n_hi=n_hi)
                row.append(f"{name} {tt * 1e6:9.1f} us")
            except Exception as e:  # noqa: BLE001
                row.append(f"{name} FAIL {type(e).__name__}")
        print(f"{tag} round {r}: " + "  |  ".join(row), flush=True)


# A: ViT-H b32 MLP geometry (n=257 -> n_pad 264; rows = 32*264).
# GEMM1 (8448,1280)@(1280,5120); GEMM2 (8448,5120)@(5120,1280).
make_cases(32 * 264, 1280, 5120, "A vit-h b32 mlp",
           tiles=((256, 1056, 640), (512, 528, 640)))
# B: ViT-L/16@384 batch-1 MLP (n=577 -> n_pad 584) — tiny signal, so
# longer chains for a stable slope.
make_cases(584, 1024, 4096, "B vit-l384 b1 mlp",
           tiles=((512, 584, 1024), (512, 584, 1024)),
           n_lo=16, n_hi=64)
