"""attn_block with 2 images per cell: projections run on 2N rows."""
import sys, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops.common import LANE, round_up
from vit_fpga_tpu.ops.attn_block import attn_block_pallas
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H = 64, 197, 768, 12
DH = D // H

def kernel2(x_ref, ls, lb, wqkv, bqkv, wo, bo, o_ref, qkv_s, sc, ao, *,
            eps, scale, n_pad, imgs):
    d = D
    x2 = x_ref[:].reshape(imgs * n_pad, d)
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ls[0] + lb[0]).astype(x2.dtype)
    qkv_s[:] = (jnp.dot(xn, wqkv[:], preferred_element_type=jnp.float32)
                + bqkv[0]).astype(x2.dtype)
    for b in range(imgs):
        qkv = qkv_s[b * n_pad:(b + 1) * n_pad]
        for h in range(H):
            q = qkv[:, h * DH:(h + 1) * DH]
            k = qkv[:, d + h * DH:d + (h + 1) * DH]
            sc[h] = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) * scale
        for h in range(H):
            s = sc[h]
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < N, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x2.dtype)
            v = qkv[:, 2 * d + h * DH:2 * d + (h + 1) * DH]
            ao[b * n_pad:(b + 1) * n_pad, h * DH:(h + 1) * DH] = jnp.dot(
                p, v, preferred_element_type=jnp.float32).astype(x2.dtype)
    y = jnp.dot(ao[:], wo[:], preferred_element_type=jnp.float32) + bo[0]
    o_ref[:] = (x2 + y.astype(x2.dtype)).reshape(imgs, n_pad, d)

def block2(x, ls, lb, wqkv, bqkv, wo, bo, imgs=2):
    b, n, d = x.shape
    n_pad = round_up(n, LANE)
    x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(kernel2, eps=1e-6, scale=DH ** -0.5, n_pad=n_pad, imgs=imgs),
        grid=(b // imgs,),
        in_specs=[pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                  const((1, d)), const((1, d)), const((d, 3 * d)),
                  const((1, 3 * d)), const((d, d)), const((1, d))],
        out_specs=pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((imgs * n_pad, 3 * d), x.dtype),
                        pltpu.VMEM((H, n_pad, n_pad), jnp.float32),
                        pltpu.VMEM((imgs * n_pad, d), x.dtype)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(x, ls.reshape(1, -1).astype(jnp.float32), lb.reshape(1, -1).astype(jnp.float32),
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

def report(name, fn):
    t = time_device_loop_single(fn, (ls, lb, wqkv, bqkv, wo, bo, x), n=16, reps=3)
    print(f"{name:22s} {t*1e3:7.3f} ms", flush=True)

report("mega 1-img (current)",
       lambda ls, lb, wq, bq, wo, bo, x: attn_block_pallas(x, ls, lb, wq, bq, wo, bo, H))
report("mega 2-img",
       lambda ls, lb, wq, bq, wo, bo, x: block2(x, ls, lb, wq, bq, wo, bo, 2))
import numpy as np
a = np.asarray(attn_block_pallas(x, ls, lb, wqkv, bqkv, wo, bo, H)).astype(np.float32)
b2 = np.asarray(block2(x, ls, lb, wqkv, bqkv, wo, bo, 2)).astype(np.float32)
print("parity maxdiff:", np.abs(a - b2).max())
