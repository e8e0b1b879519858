"""Interleaved A/B of softmax variants (cancels tunnel drift)."""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from perf_softmax_opt import attn_v  # noqa: E402
from vit_fpga_tpu.utils.timing import time_device_loop_single  # noqa: E402

B, N, D, H = 64, 197, 768, 12
ks = jax.random.split(jax.random.key(0), 8)
x = jax.device_put(jax.random.normal(ks[0], (B, N, D), jnp.bfloat16))
ls = jnp.ones((D,), jnp.float32)
lb = jnp.zeros((D,), jnp.float32)
wq = jax.device_put(jax.random.normal(ks[1], (D, 3 * D), jnp.bfloat16) * 0.02)
bq = jnp.zeros((3 * D,), jnp.float32)
wo = jax.device_put(jax.random.normal(ks[2], (D, D), jnp.bfloat16) * 0.02)
bo = jnp.zeros((D,), jnp.float32)

fns = {v: (lambda ls, lb, wq, bq, wo, bo, x, _v=v: attn_v(
    x, ls, lb, wq, bq, wo, bo, H, _v)) for v in (0, 3, 4)}
args = (ls, lb, wq, bq, wo, bo, x)
for rnd in range(4):
    line = []
    for v, fn in fns.items():
        t = time_device_loop_single(fn, args, n=16, reps=3)
        line.append(f"v{v}={t * 1e3:7.3f}ms")
    print("  ".join(line), flush=True)
