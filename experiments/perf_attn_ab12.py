"""Interleaved A/B: production 4img/n_sc6 vs candidate 4img/n_sc12."""
import sys
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops import attn_block as ab
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H = 64, 197, 768, 12
ks = jax.random.split(jax.random.key(0), 8)
x = jax.device_put(jax.random.normal(ks[0], (B, N, D), jnp.bfloat16))
ls = jnp.ones((D,), jnp.float32)
lb = jnp.zeros((D,), jnp.float32)
wq = jax.device_put(jax.random.normal(ks[1], (D, 3 * D), jnp.bfloat16) * .02)
bq = jnp.zeros((3 * D,), jnp.float32)
wo = jax.device_put(jax.random.normal(ks[2], (D, D), jnp.bfloat16) * .02)
bo = jnp.zeros((D,), jnp.float32)
args = (ls, lb, wq, bq, wo, bo, x)

MB = 1024 * 1024
plans = {"A:4img n_sc6": ab.AttnPlan(4, 6, False, 48 * MB),
         "B:4img n_sc12": ab.AttnPlan(4, 12, False, 48 * MB)}
fns = {}
for name, plan in plans.items():
    with mock.patch.object(ab, "attn_plan", lambda *a, **k: plan):
        f = jax.jit(lambda ls, lb, wq, bq, wo, bo, x: ab.attn_block_pallas(
            x, ls, lb, wq, bq, wo, bo, H))
        f(*args)[0].block_until_ready()  # compile under the mock
        fns[name] = f

for rnd in range(4):
    for name, f in fns.items():
        t = time_device_loop_single(f, args, n=16, reps=3)
        print(f"round{rnd} {name:16s} {t * 1e3:7.3f} ms", flush=True)
