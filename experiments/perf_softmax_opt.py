"""A/B softmax micro-optimizations inside the attention mega-kernel.

Variants (cumulative):
  v0 — production kernel (where-mask, rowmax, exp, per-element divide)
  v1 — normalize AFTER PV: pv * (1/rowsum(e)) — divides on (n, dh) not
       (n, kv): 4x fewer, and the bf16 cast moves to unnormalized e
  v2 — v1 + exp2 with log2(e) folded into the QK^T scale (saves the
       per-element multiply inside exp's lowering)
  v3 — v2 + no score mask at all: the K/V panel rows >= n_valid are
       zeroed at panel-write time (one where over (n_pad, 3d) per image
       instead of one per (head, n_pad, kv_pad) score element), so tail
       scores are exactly 0; PV ignores them (V rows are 0) and the
       denominator subtracts the known tail mass (kv_pad-n_valid)*2^-m.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops import attn_block as ab
from vit_fpga_tpu.ops.common import LANE, round_up
from vit_fpga_tpu.utils.timing import time_device_loop_single

_NEG_INF = -1e30
LOG2E = 1.4426950408889634


def _kernel(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
            o_ref, qkv_ref, scores_ref, ao_ref, *, eps, scale, n_valid,
            n_pad, kv_pad, n_heads, dh, n_sc, imgs, variant):
    d = n_heads * dh
    x = x_ref[:].reshape(imgs * n_pad, d)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ls_ref[0] +
          lb_ref[0]).astype(x.dtype)
    qkv = (jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
           + bqkv_ref[0]).astype(x.dtype)
    if variant >= 3:
        # zero rows >= n_valid so tail score columns are exactly 0
        row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 3 * d), 0)
        qkv_m = jnp.where(row < n_valid,
                          qkv.reshape(imgs, n_pad, 3 * d),
                          jnp.zeros((), x.dtype))
        for b in range(imgs):
            qkv_ref[b, :n_pad] = qkv_m[b]
            if kv_pad != n_pad:
                qkv_ref[b, n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d),
                                               x.dtype)
    else:
        for b in range(imgs):
            if kv_pad != n_pad:
                qkv_ref[b, :n_pad] = qkv[b * n_pad:(b + 1) * n_pad]
                qkv_ref[b, n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d),
                                               x.dtype)
            else:
                qkv_ref[b] = qkv[b * n_pad:(b + 1) * n_pad]

    sc = scale * LOG2E if variant >= 2 else scale
    exp = jnp.exp2 if variant >= 2 else jnp.exp
    tail = kv_pad - n_valid
    for b in range(imgs):
        for g in range(0, n_heads, n_sc):
            heads = range(g, min(g + n_sc, n_heads))
            for h in heads:
                q = qkv_ref[b, :n_pad, h * dh:(h + 1) * dh]
                k = qkv_ref[b, :, d + h * dh:d + (h + 1) * dh]
                scores_ref[h - g] = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * sc
            for h in heads:
                s = scores_ref[h - g]
                if variant < 3 and n_valid < kv_pad:
                    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    s = jnp.where(col < n_valid, s, _NEG_INF)
                m = jnp.max(s, axis=-1, keepdims=True)
                e = exp(s - m)
                v = qkv_ref[b, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
                if variant == 0:
                    p = (e / jnp.sum(e, axis=-1, keepdims=True)
                         ).astype(x.dtype)
                    pv = jnp.dot(p, v,
                                 preferred_element_type=jnp.float32
                                 ).astype(x.dtype)
                elif variant == 4:
                    # v2's exp2 + v3's maskless panel, but keep v0's
                    # f32-normalized p (per-element divide)
                    denom = jnp.sum(e, axis=-1, keepdims=True)
                    if tail:
                        denom = denom - tail * exp(-m)
                    p = (e / denom).astype(x.dtype)
                    pv = jnp.dot(p, v,
                                 preferred_element_type=jnp.float32
                                 ).astype(x.dtype)
                else:
                    denom = jnp.sum(e, axis=-1, keepdims=True)
                    if variant >= 3 and tail:
                        denom = denom - tail * exp(-m)
                    pv = jnp.dot(e.astype(x.dtype), v,
                                 preferred_element_type=jnp.float32)
                    pv = (pv / denom).astype(x.dtype)
                ao_ref[b * n_pad:(b + 1) * n_pad,
                       h * dh:(h + 1) * dh] = pv
    y = jnp.dot(ao_ref[:], wo_ref[:],
                preferred_element_type=jnp.float32) + bo_ref[0]
    o_ref[:] = (x + y.astype(x.dtype)).reshape(imgs, n_pad, d)


@functools.partial(jax.jit, static_argnames=("num_heads", "variant"))
def attn_v(x, ls, lb, wqkv, bqkv, wo, bo, num_heads, variant):
    b, n, d = x.shape
    dh = d // num_heads
    eps = 1e-6
    n_pad = round_up(n, 16)
    kv_pad = round_up(n, LANE)
    if n_pad != n:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])
    plan = ab.attn_plan(num_heads, d, n_pad, kv_pad, 2, batch=b)
    imgs, n_sc = plan.imgs, plan.n_sc
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, scale=1.0 / (dh ** 0.5),
                          n_valid=n, n_pad=n_pad, kv_pad=kv_pad,
                          n_heads=num_heads, dh=dh, n_sc=n_sc, imgs=imgs,
                          variant=variant),
        grid=(b // imgs,),
        in_specs=[
            pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, d)), const((1, d)), const((d, 3 * d)),
            const((1, 3 * d)), const((d, d)), const((1, d)),
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
            **({"vmem_limit_bytes": plan.vmem_limit}
               if plan.vmem_limit else {})),
    )(x, ls.reshape(1, -1).astype(jnp.float32),
      lb.reshape(1, -1).astype(jnp.float32),
      wqkv.astype(x.dtype), bqkv.reshape(1, -1).astype(jnp.float32),
      wo.astype(x.dtype), bo.reshape(1, -1).astype(jnp.float32))
    return out[:, :n, :]


def probe(tag, B, N, D, H):
    ks = jax.random.split(jax.random.key(0), 8)
    x = jax.device_put(jax.random.normal(ks[0], (B, N, D), jnp.bfloat16))
    ls = jnp.ones((D,), jnp.float32)
    lb = jnp.zeros((D,), jnp.float32)
    wq = jax.device_put(
        jax.random.normal(ks[1], (D, 3 * D), jnp.bfloat16) * 0.02)
    bq = jnp.zeros((3 * D,), jnp.float32)
    wo = jax.device_put(
        jax.random.normal(ks[2], (D, D), jnp.bfloat16) * 0.02)
    bo = jnp.zeros((D,), jnp.float32)
    ref = np.asarray(ab.attn_block_xla(x, ls, lb, wq, bq, wo, bo, H)
                     ).astype(np.float32)
    for variant in (0, 3, 4):
        fn = lambda ls, lb, wq, bq, wo, bo, x: attn_v(  # noqa: E731
            x, ls, lb, wq, bq, wo, bo, H, variant)
        got = np.asarray(fn(ls, lb, wq, bq, wo, bo, x)).astype(np.float32)
        md = np.abs(ref - got).max()
        t = time_device_loop_single(fn, (ls, lb, wq, bq, wo, bo, x),
                                    n=16, reps=3)
        print(f"{tag} v{variant}  {t * 1e3:7.3f} ms  maxdiff={md:.2e}",
              flush=True)


if __name__ == "__main__":
    probe("vitb  d768 h12 n197", 64, 197, 768, 12)
    probe("clipL d1024 h16 n257", 64, 257, 1024, 16)
