"""Validate the production attn_block v2 plan on hardware at both tiers."""
import sys
import jax, jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops import attn_block as ab
from vit_fpga_tpu.utils.timing import time_device_loop_single


def probe(tag, B, N, D, H):
    ks = jax.random.split(jax.random.key(0), 8)
    x = jax.device_put(jax.random.normal(ks[0], (B, N, D), jnp.bfloat16))
    ls = jnp.ones((D,), jnp.float32); lb = jnp.zeros((D,), jnp.float32)
    wq = jax.device_put(jax.random.normal(ks[1], (D, 3 * D), jnp.bfloat16) * 0.02)
    bq = jnp.zeros((3 * D,), jnp.float32)
    wo = jax.device_put(jax.random.normal(ks[2], (D, D), jnp.bfloat16) * 0.02)
    bo = jnp.zeros((D,), jnp.float32)
    ref = np.asarray(ab.attn_block_xla(x, ls, lb, wq, bq, wo, bo, H)
                     ).astype(np.float32)
    fn = lambda ls, lb, wq, bq, wo, bo, x: ab.attn_block_pallas(
        x, ls, lb, wq, bq, wo, bo, H)
    got = np.asarray(fn(ls, lb, wq, bq, wo, bo, x)).astype(np.float32)
    md = np.abs(ref - got).max()
    t = time_device_loop_single(fn, (ls, lb, wq, bq, wo, bo, x), n=16, reps=3)
    print(f"{tag:30s} {t*1e3:7.3f} ms  maxdiff={md:.2e}", flush=True)


probe("vitb  d768 h12 n197 (plan)", 64, 197, 768, 12)
probe("clipL d1024 h16 n257 (plan)", 64, 257, 1024, 16)
