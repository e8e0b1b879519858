"""Does raising images-per-cell past 4 help the attention mega-kernel?"""
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
ref = np.asarray(ab.attn_block_xla(x, ls, lb, wq, bq, wo, bo, H),
                 np.float32)
args = (ls, lb, wq, bq, wo, bo, x)

MB = 1024 * 1024
plans = {
    "prod 4img n_sc6 48M": ab.AttnPlan(4, 6, False, 48 * MB),
    "8img n_sc6 80M": ab.AttnPlan(8, 6, False, 80 * MB),
    "8img n_sc12 80M": ab.AttnPlan(8, 12, False, 80 * MB),
    "4img n_sc12 48M": ab.AttnPlan(4, 12, False, 48 * MB),
    "16img n_sc6 100M": ab.AttnPlan(16, 6, False, 100 * MB),
}
for name, plan in plans.items():
    with mock.patch.object(ab, "attn_plan", lambda *a, **k: plan):
        jax.clear_caches()
        fn = (lambda ls, lb, wq, bq, wo, bo, x: ab.attn_block_pallas(
            x, ls, lb, wq, bq, wo, bo, H))
        try:
            got = np.asarray(fn(*args), np.float32)
            md = np.abs(ref - got).max()
            t = time_device_loop_single(fn, args, n=16, reps=3)
            print(f"{name:24s} {t * 1e3:7.3f} ms  maxdiff={md:.2e}",
                  flush=True)
        except Exception as e:
            m = [ln for ln in str(e).splitlines() if "cope" in ln]
            print(f"{name:24s} FAILED {(m[0] if m else str(e)[:100])}",
                  flush=True)
