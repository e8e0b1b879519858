"""CLIP ViT-L/14 attention-half geometry probe: which n_sc fits + timing.

d=1024, H=16, seq 257 (patch 14 @224 + CLS), batch 64.
Also probes a variant with the out-proj reading ao from the qkv panel's q
region to save the ao scratch (if needed).
"""
import sys, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops.common import LANE, round_up
from vit_fpga_tpu.ops import attn_block as ab
from vit_fpga_tpu.utils.timing import time_device_loop_single
import numpy as np

B, N, D, H = 64, 257, 1024, 16
DH = D // H


def build(n_sc):
    n_pad = round_up(N, 16)
    kv_pad = round_up(N, LANE)

    def fn(ls, lb, wqkv, bqkv, wo, bo, x):
        b, n, d = x.shape
        xp = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])
        const = lambda shape: pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(ab._attn_block_kernel, eps=1e-6,
                              scale=DH ** -0.5, n_valid=N, n_pad=n_pad,
                              kv_pad=kv_pad, n_heads=H, dh=DH, n_sc=n_sc),
            grid=(b,),
            in_specs=[pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      const((1, d)), const((1, d)), const((d, 3 * d)),
                      const((1, 3 * d)), const((d, d)), const((1, d))],
            out_specs=pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
            scratch_shapes=[pltpu.VMEM((kv_pad, 3 * d), x.dtype),
                            pltpu.VMEM((n_sc, n_pad, kv_pad), jnp.float32),
                            pltpu.VMEM((n_pad, d), x.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(xp, ls.reshape(1, -1).astype(jnp.float32),
          lb.reshape(1, -1).astype(jnp.float32),
          wqkv.astype(x.dtype), bqkv.reshape(1, -1).astype(jnp.float32),
          wo.astype(x.dtype), bo.reshape(1, -1).astype(jnp.float32))
        return out[:, :N, :]
    return fn


ks = jax.random.split(jax.random.key(0), 8)
x = jax.device_put(jax.random.normal(ks[0], (B, N, D), jnp.bfloat16))
ls = jnp.ones((D,), jnp.float32); lb = jnp.zeros((D,), jnp.float32)
wqkv = jax.device_put(jax.random.normal(ks[1], (D, 3 * D), jnp.bfloat16) * 0.02)
bqkv = jnp.zeros((3 * D,), jnp.float32)
wo = jax.device_put(jax.random.normal(ks[2], (D, D), jnp.bfloat16) * 0.02)
bo = jnp.zeros((D,), jnp.float32)

ref = np.asarray(ab.attn_block_xla(x, ls, lb, wqkv, bqkv, wo, bo, H)
                 ).astype(np.float32)

for n_sc in (1, 2, 4, 8):
    try:
        fn = build(n_sc)
        got = np.asarray(fn(ls, lb, wqkv, bqkv, wo, bo, x)).astype(np.float32)
        md = np.abs(ref - got).max()
        t = time_device_loop_single(fn, (ls, lb, wqkv, bqkv, wo, bo, x),
                                    n=16, reps=3)
        print(f"n_sc={n_sc:2d}  {t*1e3:7.3f} ms  maxdiff={md:.2e}",
              flush=True)
    except Exception as e:
        print(f"n_sc={n_sc:2d}  FAILED: {str(e)[:140]}", flush=True)


# XLA fallback for contrast
def xla_fn(ls, lb, wq, bq, wo, bo, x):
    return ab.attn_block_xla(x, ls, lb, wq, bq, wo, bo, H)
t = time_device_loop_single(xla_fn, (ls, lb, wqkv, bqkv, wo, bo, x),
                            n=16, reps=3)
print(f"XLA unfused     {t*1e3:7.3f} ms", flush=True)
