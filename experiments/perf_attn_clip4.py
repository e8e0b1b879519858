"""CLIP-L geometry: does a forced 4-image cell beat the 2-image tier?"""
import sys
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops import attn_block as ab
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H = 32, 257, 1024, 16   # batch slice of the 256 config
ks = jax.random.split(jax.random.key(0), 8)
x = jax.device_put(jax.random.normal(ks[0], (B, N, D), jnp.bfloat16))
ls = jnp.ones((D,), jnp.float32)
lb = jnp.zeros((D,), jnp.float32)
wq = jax.device_put(jax.random.normal(ks[1], (D, 3 * D), jnp.bfloat16) * .02)
bq = jnp.zeros((3 * D,), jnp.float32)
wo = jax.device_put(jax.random.normal(ks[2], (D, D), jnp.bfloat16) * .02)
bo = jnp.zeros((D,), jnp.float32)
args = (ls, lb, wq, bq, wo, bo, x)
ref = np.asarray(ab.attn_block_xla(x, ls, lb, wq, bq, wo, bo, H),
                 np.float32)

MB = 1024 * 1024
print("default plan:", ab.attn_plan(H, D, 272, 384, 2, batch=B))
plans = {
    "prod 2img n_sc4 48M": ab.AttnPlan(2, 4, False, 48 * MB),
    "4img n_sc4 60M": ab.AttnPlan(4, 4, False, 60 * MB),
    "4img n_sc8 80M": ab.AttnPlan(4, 8, False, 80 * MB),
    "2img n_sc8 60M": ab.AttnPlan(2, 8, False, 60 * MB),
    "2img n_sc16 80M": ab.AttnPlan(2, 16, False, 80 * MB),
}
fns = {}
for name, plan in plans.items():
    with mock.patch.object(ab, "attn_plan", lambda *a, **k: plan):
        f = jax.jit(lambda ls, lb, wq, bq, wo, bo, x:
                    ab.attn_block_pallas(x, ls, lb, wq, bq, wo, bo, H))
        try:
            got = np.asarray(f(*args), np.float32)
            md = np.abs(ref - got).max()
            print(f"{name:22s} maxdiff={md:.2e}", flush=True)
            fns[name] = f
        except Exception as e:
            msg = [l for l in str(e).splitlines() if "cope" in l or "vmem"
                   in l.lower()]
            print(f"{name:22s} FAILED {(msg[0] if msg else str(e)[:90])}",
                  flush=True)
for rnd in range(3):
    for name, f in fns.items():
        t = time_device_loop_single(f, args, n=16, reps=3)
        print(f"r{rnd} {name:22s} {t * 1e3:7.3f} ms", flush=True)
