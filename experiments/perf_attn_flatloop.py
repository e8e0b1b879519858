"""Attention multi-image cell: per-image phase groups (current) vs a
flat (image, head) work list in groups of n_sc — the flat order lets
softmax of one image's group overlap the next group's QK^T even across
image boundaries."""
import sys, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from vit_fpga_tpu.ops import attn_block as ab
from vit_fpga_tpu.ops.common import LANE, round_up
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H = 64, 197, 768, 12
DH = D // H


def flat_kernel(x_ref, ls_r, lb_r, wq_r, bq_r, wo_r, bo_r, o_ref, qkv_s,
                sc, ao, *, eps, scale, n_pad, kv_pad, n_valid, imgs, n_sc):
    d = D
    x = x_ref[:].reshape(imgs * n_pad, d)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ls_r[0]
          + lb_r[0]).astype(x.dtype)
    qkv = (jnp.dot(xn, wq_r[:], preferred_element_type=jnp.float32)
           + bq_r[0]).astype(x.dtype)
    for b in range(imgs):
        qkv_s[b, :n_pad] = qkv[b * n_pad:(b + 1) * n_pad]
        qkv_s[b, n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d), x.dtype)

    work = [(b, h) for b in range(imgs) for h in range(H)]
    for g in range(0, len(work), n_sc):
        grp = work[g:g + n_sc]
        for j, (b, h) in enumerate(grp):
            q = qkv_s[b, :n_pad, h * DH:(h + 1) * DH]
            k = qkv_s[b, :, d + h * DH:d + (h + 1) * DH]
            sc[j] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        for j, (b, h) in enumerate(grp):
            s = sc[j]
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
            v = qkv_s[b, :, 2 * d + h * DH:2 * d + (h + 1) * DH]
            ao[b * n_pad:(b + 1) * n_pad, h * DH:(h + 1) * DH] = jnp.dot(
                p, v, preferred_element_type=jnp.float32).astype(x.dtype)
    y = jnp.dot(ao[:], wo_r[:], preferred_element_type=jnp.float32) + bo_r[0]
    o_ref[:] = (x + y.astype(x.dtype)).reshape(imgs, n_pad, d)


def flat_block(imgs, n_sc, vmem_mb=48):
    n_pad = round_up(N, 16)
    kv_pad = round_up(N, LANE)

    def fn(ls, lb, wq, bq, wo, bo, x):
        b = x.shape[0]
        xp = jnp.pad(x, [(0, 0), (0, n_pad - N), (0, 0)])
        const = lambda shape: pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(flat_kernel, eps=1e-6, scale=DH ** -0.5,
                              n_pad=n_pad, kv_pad=kv_pad, n_valid=N,
                              imgs=imgs, n_sc=n_sc),
            grid=(b // imgs,),
            in_specs=[pl.BlockSpec((imgs, n_pad, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      const((1, D)), const((1, D)), const((D, 3 * D)),
                      const((1, 3 * D)), const((D, D)), const((1, D))],
            out_specs=pl.BlockSpec((imgs, n_pad, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n_pad, D), x.dtype),
            scratch_shapes=[pltpu.VMEM((imgs, kv_pad, 3 * D), x.dtype),
                            pltpu.VMEM((n_sc, n_pad, kv_pad), jnp.float32),
                            pltpu.VMEM((imgs * n_pad, D), x.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=vmem_mb * 1024 * 1024),
        )(xp, ls.reshape(1, -1).astype(jnp.float32),
          lb.reshape(1, -1).astype(jnp.float32),
          wq.astype(x.dtype), bq.reshape(1, -1).astype(jnp.float32),
          wo.astype(x.dtype), bo.reshape(1, -1).astype(jnp.float32))
        return out[:, :N, :]
    return fn


ks = jax.random.split(jax.random.key(0), 8)
x = jax.device_put(jax.random.normal(ks[0], (B, N, D), jnp.bfloat16))
ls = jnp.ones((D,), jnp.float32); lb = jnp.zeros((D,), jnp.float32)
wq = jax.device_put(jax.random.normal(ks[1], (D, 3 * D), jnp.bfloat16) * .02)
bq = jnp.zeros((3 * D,), jnp.float32)
wo = jax.device_put(jax.random.normal(ks[2], (D, D), jnp.bfloat16) * 0.02)
bo = jnp.zeros((D,), jnp.float32)
ref = np.asarray(ab.attn_block_xla(x, ls, lb, wq, bq, wo, bo, H)
                 ).astype(np.float32)


def rep(name, fn):
    try:
        got = np.asarray(fn(ls, lb, wq, bq, wo, bo, x)).astype(np.float32)
        md = np.abs(ref - got).max()
        t = time_device_loop_single(fn, (ls, lb, wq, bq, wo, bo, x),
                                    n=16, reps=3)
        print(f"{name:34s} {t*1e3:7.3f} ms  maxdiff={md:.2e}", flush=True)
    except Exception as e:
        m = [ln for ln in str(e).splitlines() if "Scoped" in ln]
        print(f"{name:34s} FAILED {(m[0] if m else str(e)[:120])[:140]}",
              flush=True)


rep("production (per-img groups, 4x6)",
    lambda ls, lb, wq, bq, wo, bo, x: ab.attn_block_pallas(
        x, ls, lb, wq, bq, wo, bo, H))
rep("flat 4img n_sc=6", flat_block(4, 6))
rep("flat 4img n_sc=8", flat_block(4, 8))
rep("flat 8img n_sc=6 vmem=80", flat_block(8, 6, 80))
