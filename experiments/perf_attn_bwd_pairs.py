"""Round 5: head-PAIR-packed attention backward A/B (ViT-B b64 geometry).

The r5 backward decomposition (perf_train_r5.py) split the 40.5 ms
backward into attn-bwd ~21.0 ms and mlp-bwd ~20.2 ms (block_t 256 best;
512/640 lose — the backward's VMEM-resident f32 grad accumulators punish
bigger row tiles).  The attention backward still ran the round-2 per-head
score-space GEMMs at dh=64 — half the MXU lanes.  This A/Bs the round-5
pair packing (ops/attn_block._attn_bwd_kernel pairs=True): all six
score-space GEMMs (QK^T, PV, dv, dP, dq, dk) packed block-diagonally,
exactly the forward's measured-win layout (perf_attn_pair.py).

Run: python experiments/perf_attn_bwd_pairs.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vit_fpga_tpu.ops.attn_block import attn_block_bwd_pallas
from vit_fpga_tpu.utils.timing import time_device_loop

B, D, H, L = 64, 768, 12, 12
N = 197
x3 = jax.device_put(jax.random.normal(
    jax.random.key(1), (B, N, D), jnp.float32).astype(jnp.bfloat16))
g3 = jax.device_put(jax.random.normal(
    jax.random.key(2), (B, N, D), jnp.float32).astype(jnp.bfloat16) * 0.1)
ls = jnp.ones((D,), jnp.float32)
lb = jnp.zeros((D,), jnp.float32)
wqkv = jax.device_put(jax.random.normal(
    jax.random.key(3), (D, 3 * D), jnp.float32).astype(jnp.bfloat16) * 0.02)
bqkv = jnp.zeros((3 * D,), jnp.float32)
wo = jax.device_put(jax.random.normal(
    jax.random.key(4), (D, D), jnp.float32).astype(jnp.bfloat16) * 0.02)
print("device:", jax.devices(), flush=True)


def mk(pairs):
    def f(wqkv, wo, g):
        for _ in range(L):
            outs = attn_block_bwd_pallas(x3, ls, lb, wqkv, bqkv, wo, g, H,
                                         n_valid=N, pairs=pairs)
            g = outs[0]
        return jnp.sum(outs[3].astype(jnp.float32)) + jnp.sum(
            g.astype(jnp.float32))
    return f


for r in range(4):
    row = []
    for pairs in (False, True):
        t = time_device_loop(mk(pairs), (wqkv, wo, g3), n_lo=2, n_hi=6)
        row.append(f"pairs={int(pairs)} {t * 1e3:7.2f} ms")
    print(f"round {r}: " + "  |  ".join(row), flush=True)
