"""Round 5: backward-kernel decomposition + quick levers (VERDICT r5 #1).

perf_train_r4.py attributed the 55.5 ms train step: fwd 13.6-14.2 ms,
optimizer+apply ~0.8 ms (A-C), backward ~40.5 ms (C-D) — 2.9x the
forward against the ideal 2x.  This isolates the two backward kernels at
production geometry (ViT-B/16 @224 b64, 12 layers) and sweeps the cheap
levers:

  attn-bwd   attn_block_bwd_pallas x12 (per-image grid, round-2 design)
  mlp-bwd    fused_mlp_bwd_pallas x12, block_t sweep 256/512/640
  donate     full step donate=True vs False (B vs A from r4)

Run: python experiments/perf_train_r5.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import optax

from vit_fpga_tpu.models import vit
from vit_fpga_tpu.ops.attn_block import attn_block_bwd_pallas
from vit_fpga_tpu.ops.fused_mlp import fused_mlp_bwd_pallas
from vit_fpga_tpu.train.trainer import make_vit_train_step
from vit_fpga_tpu.utils.timing import time_device_loop

B, IMG, D, M, H, L = 64, 224, 768, 3072, 12, 12
N = 197
cfg = vit.config("vit_b16", image_size=IMG, dtype="bfloat16")
key = jax.random.key(0)
x3 = jax.device_put(jax.random.normal(
    jax.random.key(1), (B, N, D), jnp.float32).astype(jnp.bfloat16))
g3 = jax.device_put(jax.random.normal(
    jax.random.key(2), (B, N, D), jnp.float32).astype(jnp.bfloat16) * 0.1)
x2 = x3.reshape(B * N, D)
g2 = g3.reshape(B * N, D)
ls = jnp.ones((D,), jnp.float32)
lb = jnp.zeros((D,), jnp.float32)
wqkv = jax.device_put(jax.random.normal(
    jax.random.key(3), (D, 3 * D), jnp.float32).astype(jnp.bfloat16) * 0.02)
bqkv = jnp.zeros((3 * D,), jnp.float32)
wo = jax.device_put(jax.random.normal(
    jax.random.key(4), (D, D), jnp.float32).astype(jnp.bfloat16) * 0.02)
w1 = jax.device_put(jax.random.normal(
    jax.random.key(5), (D, M), jnp.float32).astype(jnp.bfloat16) * 0.02)
b1 = jnp.zeros((M,), jnp.float32)
w2 = jax.device_put(jax.random.normal(
    jax.random.key(6), (M, D), jnp.float32).astype(jnp.bfloat16) * 0.02)
print("device:", jax.devices(), flush=True)


def attn_bwd_12(wqkv, wo, g):
    """12 chained attention-half backwards (dx feeds the next g)."""
    for _ in range(L):
        outs = attn_block_bwd_pallas(x3, ls, lb, wqkv, bqkv, wo, g, H,
                                     n_valid=N)
        g = outs[0]
    return jnp.sum(outs[3].astype(jnp.float32)) + jnp.sum(
        g.astype(jnp.float32))


def mk_mlp_bwd_12(bt):
    def f(w1, w2, g):
        gg = g
        for _ in range(L):
            outs = fused_mlp_bwd_pallas(x2, ls, lb, w1, b1, w2, gg,
                                        block_t=bt)
            gg = outs[0]
        return jnp.sum(outs[3].astype(jnp.float32)) + jnp.sum(
            gg.astype(jnp.float32))
    return f


for r in range(3):
    row = []
    t = time_device_loop(attn_bwd_12, (wqkv, wo, g3), n_lo=2, n_hi=6)
    row.append(f"attn-bwd x12 {t * 1e3:7.2f} ms")
    for bt in (256, 512, 640):
        try:
            t = time_device_loop(mk_mlp_bwd_12(bt), (w1, w2, g2),
                                 n_lo=2, n_hi=6)
            row.append(f"mlp-bwd bt={bt} {t * 1e3:7.2f} ms")
        except Exception as e:  # noqa: BLE001
            row.append(f"mlp-bwd bt={bt} FAIL {type(e).__name__}")
    print(f"round {r}: " + "  |  ".join(row), flush=True)

# Donation A/B intentionally OMITTED: the device-loop timer traces the
# step inside an outer jit, where donate_argnums on the inner jit is
# ignored (donation is a top-level dispatch property), so any "B donate"
# number here would compare the same program against itself.  The r4
# decomposition already bounds what donation could save: optimizer +
# param apply is A - C ~= 0.8 ms total, and ViT-B's 344 MB f32 params
# leave no HBM allocation pressure at b64.  make_vit_train_step keeps
# donate=True as its default for real training loops (memory, not time).
_ = (optax, make_vit_train_step, key, functools)   # imports stay honest
