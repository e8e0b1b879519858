"""attn_block v2 design sweep: row padding / imgs-per-cell / softmax schedule.

Key trick: token ROWS (the GEMM M dim) only need sublane alignment (16 for
bf16) -> 208 for seq 197, cutting ~19% of projection FLOPs vs the current
256.  The scores' LANE dim must stay 128-aligned, so the qkv scratch keeps
a per-image 256-row K/V panel (tail zeroed once) while q/x rows stay 208.

Variants (ViT-B/16 geometry, batch 64):
  A. current kernel (256 rows, 1 img/cell, phase-split softmax)
  B. rows 208 / kv 256, 1 img/cell, phase-split
  C. rows 208, 2 imgs/cell, phase-split (scores scratch reused per img)
  D. rows 208, 2 imgs/cell, rolling interleave QK^T(i+1) || softmax+PV(i)
  E. rows 208, 1 img/cell, rolling
"""
import sys, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops.common import round_up
from vit_fpga_tpu.ops.attn_block import attn_block_pallas
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H = 64, 197, 768, 12
DH = D // H


def kernel_v2(x_ref, ls, lb, wqkv, bqkv, wo, bo, o_ref, qkv_s, sc, ao, *,
              eps, scale, n_pad, kv_pad, imgs, n_valid, schedule):
    d = D
    x2 = x_ref[:].reshape(imgs * n_pad, d)
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ls[0] + lb[0]).astype(x2.dtype)
    qkv = (jnp.dot(xn, wqkv[:], preferred_element_type=jnp.float32)
           + bqkv[0]).astype(x2.dtype)
    if kv_pad != n_pad:
        for b in range(imgs):
            qkv_s[b, :n_pad] = qkv[b * n_pad:(b + 1) * n_pad]
            qkv_s[b, n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d), x2.dtype)
    else:
        qkv_s[:] = qkv.reshape(imgs, n_pad, 3 * d)

    def qk(b, h):
        q = qkv_s[b, :n_pad, h * DH:(h + 1) * DH]
        k = qkv_s[b, :, d + h * DH:d + (h + 1) * DH]
        return jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32) * scale

    def sm_pv(b, h, s):
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x2.dtype)
        v = qkv_s[b, :, 2 * d + h * DH:2 * d + (h + 1) * DH]
        ao[b * n_pad:(b + 1) * n_pad, h * DH:(h + 1) * DH] = jnp.dot(
            p, v, preferred_element_type=jnp.float32).astype(x2.dtype)

    if schedule == "phase":
        for b in range(imgs):
            for h in range(H):
                sc[h] = qk(b, h)
            for h in range(H):
                sm_pv(b, h, sc[h])
    else:  # rolling: 2-slot scores, QK^T(i+1) overlaps softmax+PV(i)
        work = [(b, h) for b in range(imgs) for h in range(H)]
        sc[0] = qk(*work[0])
        for i in range(1, len(work)):
            sc[i % 2] = qk(*work[i])
            sm_pv(*work[i - 1], sc[(i - 1) % 2])
        sm_pv(*work[-1], sc[(len(work) - 1) % 2])

    y = jnp.dot(ao[:], wo[:], preferred_element_type=jnp.float32) + bo[0]
    o_ref[:] = (x2 + y.astype(x2.dtype)).reshape(imgs, n_pad, d)


def block_v2(x, ls, lb, wqkv, bqkv, wo, bo, imgs=2, row_pad=16,
             schedule="rolling"):
    b, n, d = x.shape
    n_pad = round_up(n, row_pad)
    kv_pad = round_up(n, 128)
    x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    n_sc = 2 if schedule == "rolling" else H
    out = pl.pallas_call(
        functools.partial(kernel_v2, eps=1e-6, scale=DH ** -0.5, n_pad=n_pad,
                          kv_pad=kv_pad, imgs=imgs, n_valid=n,
                          schedule=schedule),
        grid=(b // imgs,),
        in_specs=[pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  const((1, d)), const((1, d)), const((d, 3 * d)),
                  const((1, 3 * d)), const((d, d)), const((1, d))],
        out_specs=pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((imgs, kv_pad, 3 * d), x.dtype),
                        pltpu.VMEM((n_sc, n_pad, kv_pad), jnp.float32),
                        pltpu.VMEM((imgs * n_pad, d), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, ls.reshape(1, -1).astype(jnp.float32),
      lb.reshape(1, -1).astype(jnp.float32),
      wqkv.astype(x.dtype), bqkv.reshape(1, -1).astype(jnp.float32),
      wo.astype(x.dtype), bo.reshape(1, -1).astype(jnp.float32))
    return out[:, :n, :]


ks = jax.random.split(jax.random.key(0), 8)
x = jax.device_put(jax.random.normal(ks[0], (B, N, D), jnp.bfloat16))
ls = jnp.ones((D,), jnp.float32); lb = jnp.zeros((D,), jnp.float32)
wqkv = jax.device_put(jax.random.normal(ks[1], (D, 3 * D), jnp.bfloat16) * 0.02)
bqkv = jnp.zeros((3 * D,), jnp.float32)
wo = jax.device_put(jax.random.normal(ks[2], (D, D), jnp.bfloat16) * 0.02)
bo = jnp.zeros((D,), jnp.float32)

import numpy as np
ref = np.asarray(attn_block_pallas(x, ls, lb, wqkv, bqkv, wo, bo, H)
                 ).astype(np.float32)


def report(name, fn):
    try:
        got = np.asarray(fn(ls, lb, wqkv, bqkv, wo, bo, x)).astype(np.float32)
        md = np.abs(ref - got).max()
        t = time_device_loop_single(fn, (ls, lb, wqkv, bqkv, wo, bo, x),
                                    n=16, reps=3)
        print(f"{name:36s} {t*1e3:7.3f} ms  maxdiff={md:.2e}", flush=True)
    except Exception as e:
        print(f"{name:36s} FAILED: {str(e)[:160]}", flush=True)


report("A current (256 rows, 1img, phase)",
       lambda ls, lb, wq, bq, wo, bo, x:
       attn_block_pallas(x, ls, lb, wq, bq, wo, bo, H))
report("B 208 rows, 1img, phase",
       lambda ls, lb, wq, bq, wo, bo, x:
       block_v2(x, ls, lb, wq, bq, wo, bo, 1, 16, "phase"))
report("C 208 rows, 2img, phase",
       lambda ls, lb, wq, bq, wo, bo, x:
       block_v2(x, ls, lb, wq, bq, wo, bo, 2, 16, "phase"))
report("D 208 rows, 2img, rolling",
       lambda ls, lb, wq, bq, wo, bo, x:
       block_v2(x, ls, lb, wq, bq, wo, bo, 2, 16, "rolling"))
report("E 208 rows, 1img, rolling",
       lambda ls, lb, wq, bq, wo, bo, x:
       block_v2(x, ls, lb, wq, bq, wo, bo, 1, 16, "rolling"))
