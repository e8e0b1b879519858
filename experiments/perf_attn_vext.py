"""Softmax sum on the MXU: PV against an extended V panel [v | 1 | 0...]
so denom = pv_ext[:, dh] and the VPU sum-reduce disappears."""
import functools
import sys
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops import attn_block as ab
from vit_fpga_tpu.ops.common import LANE, round_up
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H = 64, 197, 768, 12
NEG = -1e30


def _kernel(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wo_ref,
            bo_ref, o_ref, qkv_ref, vext_ref, scores_ref, ao_ref, *,
            eps, scale, n_valid, n_pad, kv_pad, n_heads, dh, n_sc, imgs):
    d = n_heads * dh
    x = x_ref[:].reshape(imgs * n_pad, d)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ls_ref[0] +
          lb_ref[0]).astype(x.dtype)
    coli = jax.lax.broadcasted_iota(jnp.int32, (1, kv_pad), 1)
    colbias = jnp.where(coli < n_valid, 0.0, NEG)
    # ones column: 1 for valid rows, 0 for tail (exact denom)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (kv_pad, 1), 0)
    ones_col = jnp.where(rowi < n_valid, 1.0, 0.0).astype(x.dtype)
    for b in range(imgs):
        qkv_b = (jnp.dot(xn[b * n_pad:(b + 1) * n_pad], wqkv_ref[:],
                         preferred_element_type=jnp.float32)
                 + bqkv_ref[0]).astype(x.dtype)
        qkv_ref[b, :n_pad] = qkv_b
        qkv_ref[b, n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d), x.dtype)
        # extended V panel: head h at lanes [128h, 128h+64) + ones col
        for h in range(n_heads):
            vext_ref[b, :, h * 2 * dh:h * 2 * dh + dh] = (
                qkv_ref[b, :, 2 * d + h * dh:2 * d + (h + 1) * dh])
            vext_ref[b, :, h * 2 * dh + dh:h * 2 * dh + dh + 1] = ones_col
    for b in range(imgs):
        for g in range(0, n_heads, n_sc):
            heads = range(g, min(g + n_sc, n_heads))
            for h in heads:
                q = qkv_ref[b, :n_pad, h * dh:(h + 1) * dh] * x.dtype.type(
                    scale)
                k = qkv_ref[b, :, d + h * dh:d + (h + 1) * dh]
                scores_ref[h - g] = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            for h in heads:
                s = jnp.clip(scores_ref[h - g], -70.0, 80.0) + colbias
                e = jnp.exp(s).astype(x.dtype)
                vx = vext_ref[b, :, h * 2 * dh:(h + 1) * 2 * dh]
                pv = jnp.dot(e, vx, preferred_element_type=jnp.float32)
                denom = pv[:, dh:dh + 1]
                ao_ref[b * n_pad:(b + 1) * n_pad,
                       h * dh:(h + 1) * dh] = (
                    pv[:, :dh] * jax.lax.reciprocal(denom)).astype(x.dtype)
    y = jnp.dot(ao_ref[:], wo_ref[:],
                preferred_element_type=jnp.float32) + bo_ref[0]
    o_ref[:] = (x + y.astype(x.dtype)).reshape(imgs, n_pad, d)


def build(imgs=4, n_sc=6, vmem=60 * 1024 * 1024, layers=12):
    def f(ls, lb, wqkv, bqkv, wo, bo, x):
        b, n, d = x.shape
        dh = d // H
        n_pad = round_up(n, 16)
        kv_pad = round_up(n, LANE)
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])
        const = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel, eps=1e-6, scale=1.0 / dh ** 0.5,
                              n_valid=n, n_pad=n_pad, kv_pad=kv_pad,
                              n_heads=H, dh=dh, n_sc=n_sc, imgs=imgs),
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
                pltpu.VMEM((imgs, kv_pad, 2 * d), x.dtype),
                pltpu.VMEM((n_sc, n_pad, kv_pad), jnp.float32),
                pltpu.VMEM((imgs * n_pad, d), x.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=vmem),
        )(x, ls.reshape(1, -1).astype(jnp.float32),
          lb.reshape(1, -1).astype(jnp.float32),
          wqkv.astype(x.dtype), bqkv.reshape(1, -1).astype(jnp.float32),
          wo.astype(x.dtype), bo.reshape(1, -1).astype(jnp.float32))
        return out[:, :n, :]

    def g(ls, lb, wq, bq, wo, bo, x):
        for _ in range(layers):
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


def prod12(ls, lb, wq, bq, wo, bo, x):
    for _ in range(12):
        x = ab.attn_block_pallas(x, ls, lb, wq, bq, wo, bo, H)
    return x


MB = 1024 * 1024
with mock.patch.object(ab, "attn_plan",
                       lambda *a, **k: ab.AttnPlan(4, 6, False, 48 * MB)):
    fA = jax.jit(prod12)
    fA(*args)[0].block_until_ready()
fB = build()
refv = np.asarray(fA(*args), np.float32)
got = np.asarray(fB(*args), np.float32)
rel = np.abs(refv - got).max() / np.abs(refv).max()
print(f"vext maxdiff={np.abs(refv-got).max():.3e} rel={rel:.2e}",
      flush=True)
for rnd in range(4):
    tA = time_device_loop_single(fA, args, n=12, reps=3)
    tB = time_device_loop_single(fB, args, n=12, reps=3)
    print(f"r{rnd} prod {tA*1e3:7.3f}  vext {tB*1e3:7.3f}  "
          f"d={1e3*(tA-tB):+6.3f}", flush=True)
