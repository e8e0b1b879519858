"""Re-sweep kernel tile plans at the new n_pad=200 geometry (ViT-B b64).

The pad-200 change (ops/common.pad_sublane) moved token rows from
64*208=13312 to 64*200=12800 per step.  Round-3's block_t=512 optimum
and the attn_plan imgs/n_sc tiers were tuned at 208 rows; re-sweep both
at 200 to check nothing shifted.

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python experiments/perf_resweep_pad200.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vit_fpga_tpu.ops.fused_mlp import fused_mlp_stats_pallas
from vit_fpga_tpu.utils.timing import time_device_loop_single

N_PAD, D, M, L, B = 200, 768, 3072, 12, 64
T = B * N_PAD
VMEM48 = 48 * 1024 * 1024


def mlp_sweep():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.normal(size=(T, D)) * 0.3, jnp.bfloat16)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(jnp.var(xf, axis=-1, keepdims=True) + 1e-6)
    stats = jnp.concatenate(
        [mu, rstd, jnp.zeros((T, 126), jnp.float32)], axis=-1)
    s = jnp.asarray(r.normal(size=(D,)) * 0.1 + 1, jnp.float32)
    b = jnp.asarray(r.normal(size=(D,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(r.normal(size=(D, M)) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(r.normal(size=(M,)) * 0.02, jnp.float32)
    w2 = jnp.asarray(r.normal(size=(M, D)) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(r.normal(size=(D,)) * 0.02, jnp.float32)
    args = (x, stats, s, b, w1, b1, w2, b2)

    def make(bt, vm):
        def fn(x, stats, s, b, w1, b1, w2, b2):
            st = stats
            for _ in range(L):
                x, st = fused_mlp_stats_pallas(
                    x, st, s, b, w1, b1, w2, b2, act="gelu_tanh",
                    block_t=bt, vmem_limit=vm, emit_stats=True)
            return x
        return jax.jit(fn)

    # 12800 rows: 512 -> 25 steps, 400 -> 32, 640 -> 20, 800 -> 16
    cases = [(512, 0), (400, 0), (640, 0), (800, 0), (640, VMEM48),
             (800, VMEM48), (1024, VMEM48)]
    fns = {}
    for bt, vm in cases:
        try:
            f = make(bt, vm)
            f(*args)[0].block_until_ready()
            fns[(bt, vm)] = f
        except Exception as e:  # noqa: BLE001
            print(f"MLP bt={bt} v={vm >> 20}M: COMPILE FAIL "
                  f"({str(e)[:80]})", flush=True)
    for rnd in range(3):
        line = f"MLP round {rnd}:"
        for (bt, vm), f in fns.items():
            t = time_device_loop_single(f, args, n=8)
            line += f"  bt{bt}/v{vm >> 20}M {t * 1e3:6.3f}"
        print(line + "  ms/12L", flush=True)


def attn_sweep():
    from vit_fpga_tpu.ops.attn_block import attn_block_pallas, attn_plan
    kv_pad, heads = 256, 12
    print("plan at n_pad=200:",
          attn_plan(heads, D, N_PAD, kv_pad, 2, batch=B), flush=True)
    r = np.random.RandomState(1)
    x = jnp.asarray(r.normal(size=(B, N_PAD, D)) * 0.3, jnp.bfloat16)
    s = jnp.asarray(r.normal(size=(D,)) * 0.1 + 1, jnp.float32)
    b = jnp.asarray(r.normal(size=(D,)) * 0.1, jnp.float32)
    wqkv = jnp.asarray(r.normal(size=(D, 3 * D)) * 0.02, jnp.bfloat16)
    bqkv = jnp.asarray(r.normal(size=(3 * D,)) * 0.02, jnp.float32)
    wo = jnp.asarray(r.normal(size=(D, D)) * 0.02, jnp.bfloat16)
    bo = jnp.asarray(r.normal(size=(D,)) * 0.02, jnp.float32)
    args = (x, s, b, wqkv, bqkv, wo, bo)

    def make():
        def fn(x, s, b, wqkv, bqkv, wo, bo):
            for _ in range(L):
                x = attn_block_pallas(x, s, b, wqkv, bqkv, wo, bo,
                                      num_heads=heads, n_valid=197)
            return x
        return jax.jit(fn)

    f = make()
    f(*args).block_until_ready()
    for rnd in range(3):
        t = time_device_loop_single(f, args, n=8)
        print(f"ATTN round {rnd}: {t * 1e3:6.3f} ms/12L", flush=True)


if __name__ == "__main__":
    mlp_sweep()
    attn_sweep()
