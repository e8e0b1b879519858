"""Large-geometry fused attention with vmem_limit_bytes raised past the
16MB default scoped limit (v5e has more physical VMEM)."""
import sys, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu
from vit_fpga_tpu.ops import attn_block as ab
from vit_fpga_tpu.utils.timing import time_device_loop_single


def probe(tag, B, N, D, H, n_sc, reuse_q, vmem_mb):
    ks = jax.random.split(jax.random.key(0), 8)
    x = jax.device_put(jax.random.normal(ks[0], (B, N, D), jnp.bfloat16))
    ls = jnp.ones((D,), jnp.float32); lb = jnp.zeros((D,), jnp.float32)
    wq = jax.device_put(
        jax.random.normal(ks[1], (D, 3 * D), jnp.bfloat16) * 0.02)
    bq = jnp.zeros((3 * D,), jnp.float32)
    wo = jax.device_put(
        jax.random.normal(ks[2], (D, D), jnp.bfloat16) * 0.02)
    bo = jnp.zeros((D,), jnp.float32)
    orig_slots, orig_params = ab.score_slots, pltpu.CompilerParams
    ab.score_slots = lambda *a, **k: (n_sc, reuse_q)
    ab.pltpu.CompilerParams = lambda **kw: orig_params(
        vmem_limit_bytes=vmem_mb * 1024 * 1024, **kw)
    try:
        fn = lambda ls, lb, wq, bq, wo, bo, x: ab.attn_block_pallas(
            x, ls, lb, wq, bq, wo, bo, H)
        ref = np.asarray(ab.attn_block_xla(
            x, ls, lb, wq, bq, wo, bo, H)).astype(np.float32)
        got = np.asarray(fn(ls, lb, wq, bq, wo, bo, x)).astype(np.float32)
        md = np.abs(ref - got).max()
        t = time_device_loop_single(fn, (ls, lb, wq, bq, wo, bo, x),
                                    n=16, reps=3)
        print(f"{tag:44s} {t*1e3:7.3f} ms  maxdiff={md:.2e}", flush=True)
    except Exception as e:
        m = [ln for ln in str(e).splitlines()
             if "Scoped" in ln or "memory" in ln]
        print(f"{tag:44s} FAILED: {(m[0] if m else str(e)[:130])[:150]}",
              flush=True)
    finally:
        ab.score_slots, ab.pltpu.CompilerParams = orig_slots, orig_params
        jax.clear_caches()


probe("clipL n257 fast n_sc=16 vmem=100M", 64, 257, 1024, 16, 16, False, 100)
probe("clipL n257 fast n_sc=4  vmem=100M", 64, 257, 1024, 16, 4, False, 100)
probe("vitL  n577 b16 fast n_sc=16 vmem=100M", 16, 577, 1024, 16, 16, False,
      100)
probe("vitL  n577 b16 fast n_sc=4  vmem=100M", 16, 577, 1024, 16, 4, False,
      100)
probe("vitB  n197 fast n_sc=12 vmem=100M", 64, 197, 768, 12, 12, False, 100)
