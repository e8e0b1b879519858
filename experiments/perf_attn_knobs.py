"""Sweep attention-plan knobs (imgs/cell, score slots, vmem) at the
round-3 ViT-B geometry (n_pad=200, kv_pad=256, b=64, heads=12).

The multi tier (imgs=4, n_sc=6, 48MB) was tuned at n_pad=208; this
forces alternative plans through attn_block_stats_pallas to check
whether the pad-200 move shifted the optimum.

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python experiments/perf_attn_knobs.py
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

from vit_fpga_tpu.ops import attn_block as ab
from vit_fpga_tpu.utils.timing import time_device_loop_single

N_PAD, D, HEADS, L, B = 200, 768, 12, 12, 64
MB = 1024 * 1024


def main():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.normal(size=(B, N_PAD, D)) * 0.3, jnp.bfloat16)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(jnp.var(xf, axis=-1, keepdims=True) + 1e-6)
    stats = jnp.concatenate(
        [mu, rstd, jnp.zeros((B, N_PAD, ab.STATS_LANES - 2), jnp.float32)],
        axis=-1)
    s = jnp.asarray(r.normal(size=(D,)) * 0.1 + 1, jnp.float32)
    b = jnp.asarray(r.normal(size=(D,)) * 0.1, jnp.float32)
    wqkv = jnp.asarray(r.normal(size=(D, 3 * D)) * 0.02, jnp.bfloat16)
    bqkv = jnp.asarray(r.normal(size=(3 * D,)) * 0.02, jnp.float32)
    wo = jnp.asarray(r.normal(size=(D, D)) * 0.02, jnp.bfloat16)
    bo = jnp.asarray(r.normal(size=(D,)) * 0.02, jnp.float32)
    args = (x, stats, s, b, wqkv, bqkv, wo, bo)

    orig_plan = ab.attn_plan

    def make(plan):
        def forced(*a, **k):
            return plan
        def fn(x, stats, s, b, wqkv, bqkv, wo, bo):
            st = stats
            for _ in range(L):
                x, st = ab.attn_block_stats_pallas(
                    x, st, s, b, wqkv, bqkv, wo, bo, num_heads=HEADS,
                    n_valid=197, emit_stats=True)
            return x
        ab.attn_plan = forced
        try:
            f = jax.jit(fn)
            f(*args).block_until_ready()   # trace+compile under the patch
        finally:
            ab.attn_plan = orig_plan
        return f

    cases = [
        ("base  i4/s6/48M", ab.AttnPlan(4, 6, False, 48 * MB)),
        ("      i4/s4/48M", ab.AttnPlan(4, 4, False, 48 * MB)),
        ("      i4/s12/48M", ab.AttnPlan(4, 12, False, 48 * MB)),
        ("      i4/s12/64M", ab.AttnPlan(4, 12, False, 64 * MB)),
        ("      i8/s6/64M", ab.AttnPlan(8, 6, False, 64 * MB)),
        ("      i8/s4/48M", ab.AttnPlan(8, 4, False, 48 * MB)),
        ("      i2/s6/48M", ab.AttnPlan(2, 6, False, 48 * MB)),
        ("      i4/s2/48M", ab.AttnPlan(4, 2, False, 48 * MB)),
    ]
    fns = []
    for name, plan in cases:
        try:
            fns.append((name, make(plan)))
            print(f"compiled {name}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: COMPILE FAIL ({str(e)[:100]})", flush=True)
    for rnd in range(3):
        print(f"-- round {rnd}", flush=True)
        for name, f in fns:
            t = time_device_loop_single(f, args, n=8)
            print(f"{name}: {t * 1e3:6.3f} ms/12L", flush=True)


if __name__ == "__main__":
    main()
