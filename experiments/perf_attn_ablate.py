"""Ablate the attention-half kernel to localize its overhead.

full        : V1 diet kernel
no_softmax  : p = bf16(s) directly (no max/exp/sum/div)  [wrong output]
no_scores   : skip QK^T+softmax+PV; ao = q               [wrong output]
gemm_only   : LN+QKV GEMM + out GEMM only                [wrong output]
no_ln       : diet kernel, LN replaced by cast           [wrong output]
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops.common import LANE, round_up
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H = 64, 197, 768, 12


def _kernel(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wo_ref,
            bo_ref, o_ref, qkv_ref, scores_ref, ao_ref, *,
            eps, n_valid, n_pad, kv_pad, n_heads, dh, n_sc, imgs, mode):
    d = n_heads * dh
    x = x_ref[:].reshape(imgs * n_pad, d)
    if mode == "no_ln":
        xn = x
    else:
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ls_ref[0] +
              lb_ref[0]).astype(x.dtype)
    qkv = (jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
           + bqkv_ref[0])
    row = jax.lax.broadcasted_iota(jnp.int32, (imgs * n_pad, 1), 0)
    valid = (row % n_pad) < n_valid
    qkv = jnp.where(valid, qkv, 0.0).astype(x.dtype)
    for b in range(imgs):
        qkv_ref[b, :n_pad] = qkv[b * n_pad:(b + 1) * n_pad]
        if kv_pad != n_pad:
            qkv_ref[b, n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d),
                                           x.dtype)
    n_tail = float(kv_pad - n_valid)
    if mode == "gemm_only":
        for b in range(imgs):
            ao_ref[b * n_pad:(b + 1) * n_pad] = qkv_ref[b, :n_pad, :d]
    else:
        for b in range(imgs):
            for g in range(0, n_heads, n_sc):
                heads = range(g, min(g + n_sc, n_heads))
                if mode != "no_scores":
                    for h in heads:
                        q = qkv_ref[b, :n_pad, h * dh:(h + 1) * dh]
                        k = qkv_ref[b, :, d + h * dh:d + (h + 1) * dh]
                        scores_ref[h - g] = jax.lax.dot_general(
                            q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                for h in heads:
                    if mode == "no_scores":
                        ao_ref[b * n_pad:(b + 1) * n_pad,
                               h * dh:(h + 1) * dh] = (
                            qkv_ref[b, :n_pad, h * dh:(h + 1) * dh])
                        continue
                    s = scores_ref[h - g]
                    v = qkv_ref[b, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
                    if mode == "no_softmax":
                        p = s.astype(x.dtype)
                        pv = jax.lax.dot_general(
                            p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        ao_ref[b * n_pad:(b + 1) * n_pad,
                               h * dh:(h + 1) * dh] = pv.astype(x.dtype)
                    else:
                        m = jnp.max(s, axis=-1, keepdims=True)
                        e = jnp.exp(s - m)
                        denom = (jnp.sum(e, axis=-1, keepdims=True)
                                 - n_tail * jnp.exp(-m))
                        pv = jax.lax.dot_general(
                            e.astype(x.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        ao_ref[b * n_pad:(b + 1) * n_pad,
                               h * dh:(h + 1) * dh] = (
                            pv * jax.lax.reciprocal(denom)).astype(x.dtype)
    y = jnp.dot(ao_ref[:], wo_ref[:],
                preferred_element_type=jnp.float32) + bo_ref[0]
    o_ref[:] = (x + y.astype(x.dtype)).reshape(imgs, n_pad, d)


def build(mode, imgs=4, n_sc=6, vmem=48 * 1024 * 1024):
    def f(ls, lb, wqkv, bqkv, wo, bo, x):
        b, n, d = x.shape
        dh = d // H
        n_pad = round_up(n, 16)
        kv_pad = round_up(n, LANE)
        wq = wqkv[:, :d] * (1.0 / (dh ** 0.5))
        wqkv2 = jnp.concatenate([wq, wqkv[:, d:]], axis=1)
        bq2 = jnp.concatenate([bqkv[:d] * (1.0 / (dh ** 0.5)),
                               bqkv[d:]], axis=0)
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])
        const = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel, eps=1e-6, n_valid=n, n_pad=n_pad,
                              kv_pad=kv_pad, n_heads=H, dh=dh, n_sc=n_sc,
                              imgs=imgs, mode=mode),
            grid=(b // imgs,),
            in_specs=[
                pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                const((1, d)), const((1, d)),
                const((d, 3 * d)), const((1, 3 * d)),
                const((d, d)), const((1, d)),
            ],
            out_specs=pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((imgs, kv_pad, 3 * d), x.dtype),
                pltpu.VMEM((n_sc, n_pad, kv_pad), jnp.float32),
                pltpu.VMEM((imgs * n_pad, d), x.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=vmem),
        )(x, ls.reshape(1, -1).astype(jnp.float32),
          lb.reshape(1, -1).astype(jnp.float32),
          wqkv2.astype(x.dtype), bq2.reshape(1, -1).astype(jnp.float32),
          wo.astype(x.dtype), bo.reshape(1, -1).astype(jnp.float32))
        return out[:, :n, :]

    def g(ls, lb, wq, bq, wo, bo, x):
        for _ in range(12):
            x = f(ls, lb, wq, bq, wo, bo, x)
        return x
    return jax.jit(g)


ks = jax.random.split(jax.random.key(0), 8)
x = jax.device_put(jax.random.normal(ks[0], (B, N, D), jnp.bfloat16))
ls = jnp.abs(jax.random.normal(ks[3], (D,), jnp.float32)) + 0.5
lb = jax.random.normal(ks[4], (D,), jnp.float32) * 0.1
wq = jax.device_put(jax.random.normal(ks[1], (D, 3 * D), jnp.bfloat16) * .02)
bq = jax.device_put(jax.random.normal(ks[5], (3 * D,), jnp.float32) * .02)
wo = jax.device_put(jax.random.normal(ks[2], (D, D), jnp.bfloat16) * .02)
bo = jnp.zeros((D,), jnp.float32)
args = (ls, lb, wq, bq, wo, bo, x)

modes = sys.argv[1:] or ["full", "no_softmax", "no_scores", "gemm_only",
                         "no_ln"]
fns = {m: build(m) for m in modes}
for rnd in range(3):
    for name, f in fns.items():
        t = time_device_loop_single(f, args, n=8, reps=3)
        print(f"r{rnd} {name:12s} {t * 1e3:7.3f} ms/12L", flush=True)
