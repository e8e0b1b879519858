"""CLIP ViT-L/14 attention-half probe with the production v2 kernel
(q-slot reuse, head-group schedule): which n_sc compiles + timing.

d=1024, H=16, seq 257 (patch 14 @224 + CLS), batch 64.
Also re-times ViT-B/16 geometry to confirm the slimmed kernel kept 0.49ms.
"""
import sys
import jax, jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops import attn_block as ab
from vit_fpga_tpu.utils.timing import time_device_loop_single


def probe(tag, B, N, D, H, n_sc_force=None):
    ks = jax.random.split(jax.random.key(0), 8)
    x = jax.device_put(jax.random.normal(ks[0], (B, N, D), jnp.bfloat16))
    ls = jnp.ones((D,), jnp.float32); lb = jnp.zeros((D,), jnp.float32)
    wq = jax.device_put(jax.random.normal(ks[1], (D, 3 * D), jnp.bfloat16) * 0.02)
    bq = jnp.zeros((3 * D,), jnp.float32)
    wo = jax.device_put(jax.random.normal(ks[2], (D, D), jnp.bfloat16) * 0.02)
    bo = jnp.zeros((D,), jnp.float32)
    ref = np.asarray(ab.attn_block_xla(x, ls, lb, wq, bq, wo, bo, H)
                     ).astype(np.float32)
    orig = ab.score_slots
    if n_sc_force is not None:
        ab.score_slots = lambda *a, **k: n_sc_force
    fn = lambda ls, lb, wq, bq, wo, bo, x: ab.attn_block_pallas(
        x, ls, lb, wq, bq, wo, bo, H)
    try:
        got = np.asarray(fn(ls, lb, wq, bq, wo, bo, x)).astype(np.float32)
        md = np.abs(ref - got).max()
        t = time_device_loop_single(fn, (ls, lb, wq, bq, wo, bo, x),
                                    n=16, reps=3)
        print(f"{tag:34s} {t*1e3:7.3f} ms  maxdiff={md:.2e}", flush=True)
    except Exception as e:
        msg = str(e)
        key = [ln for ln in msg.splitlines() if "Scoped" in ln or "vmem" in ln]
        print(f"{tag:34s} FAILED: {(key[0] if key else msg[:200])[:200]}",
              flush=True)
    finally:
        ab.score_slots = orig
        jax.clear_caches()


probe("vitb  d768 h12 n197 (auto)", 64, 197, 768, 12)
probe("clipL d1024 h16 n257 n_sc=1", 64, 257, 1024, 16, 1)
probe("clipL d1024 h16 n257 n_sc=2", 64, 257, 1024, 16, 2)
probe("clipL d1024 h16 n257 n_sc=4", 64, 257, 1024, 16, 4)
