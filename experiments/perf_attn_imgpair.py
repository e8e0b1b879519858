"""Round 4: IMAGE-pair-packed score/PV GEMMs (VERDICT r3 item 1a).

The pair-packed attention kernel's score GEMMs run at M=200 — under the
MXU's 128-row fill/drain that is the worst shape in the stream (see
experiments/perf_gemm_ceiling.py).  This variant stacks an image PAIR
along M: for images (b0, b1) and head pair h,

  q_bd   (2*n_pad, dw)      rows 0..n_pad-1 = b0, rest = b1
  kbd2   (4*kv_pad, dw)     b0's block-diag K panel stacked on b1's
  scores (2*n_pad, 4*kv_pad) = q_bd @ kbd2^T

Rows 0..n_pad-1 x cols 0..2kv-1 hold b0's two heads, rows n_pad..
x cols 2kv.. hold b1's; the two CROSS-image blocks are computed and
thrown away (masked to exact 0 after exp) — 2x the score/PV MACs for
(per the ceiling bench) >2x better MXU efficiency at M=400.  PV runs
packed too: pv = e_masked @ vbd2 with vbd2 (4*kv_pad, dw); the cross
blocks contribute exact zeros, so the math is BIT-IDENTICAL to the
production pair kernel (adding 0.0 is exact).  Since b1 = b0+1, the
(2*n_pad, dw) pv tile writes one contiguous ao slice.

Variants (12-layer attention-only stacks, ViT-B/16 b64 geometry):
  A  production pair-packed kernel (attn_block_pallas)
  B  image-pair cols packing, n_sc=4 (2 quad slots, 48MB plan)
  C  image-pair cols packing, n_sc=6 (3 quad slots, 64MB plan)

Run: python experiments/perf_attn_imgpair.py
"""
import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_fpga_tpu.ops.attn_block import (_EXP_HI, _EXP_LO, _NEG_INF,
                                         attn_block_pallas)
from vit_fpga_tpu.utils.timing import time_device_loop

B, N, D, H = 64, 197, 768, 12
DH = D // H
N_PAD, KV = 200, 256
IMGS = 4
EPS = 1e-6
SCALE = 1.0 / (DH ** 0.5)
L = 12


def _imgpair_kernel(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wo_ref,
                    bo_ref, o_ref, qkv_ref, scores_ref, ao_ref, *,
                    n_sc: int):
    d = D
    dh, dw = DH, 2 * DH
    n2 = 2 * N_PAD
    kv4 = 4 * KV
    x = x_ref[:].reshape(IMGS * N_PAD, d)

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    xn = ((xf - mu) * jax.lax.rsqrt(var + EPS) * ls_ref[0] +
          lb_ref[0]).astype(x.dtype)
    for b in range(IMGS):
        qkv_b = (jnp.dot(xn[b * N_PAD:(b + 1) * N_PAD], wqkv_ref[:],
                         preferred_element_type=jnp.float32)
                 + bqkv_ref[0]).astype(x.dtype)
        qkv_ref[b, :N_PAD] = qkv_b
        qkv_ref[b, N_PAD:] = jnp.zeros((KV - N_PAD, 3 * d), x.dtype)

    # pad-key colbias over BOTH images' column spans (cols mod KV >= N)
    coli = jax.lax.broadcasted_iota(jnp.int32, (1, kv4), 1)
    colbias = jnp.where(coli % KV < N, 0.0, _NEG_INF)
    # cross-image block mask: rows < N_PAD own cols < 2*KV
    rowi2 = jax.lax.broadcasted_iota(jnp.int32, (n2, kv4), 0)
    coli2 = jax.lax.broadcasted_iota(jnp.int32, (n2, kv4), 1)
    block_ok = (rowi2 < N_PAD) == (coli2 < 2 * KV)
    # which head each K/V panel lane / output lane belongs to
    lanei = jax.lax.broadcasted_iota(jnp.int32, (KV, dw), 1) // dh
    lane_sm = jax.lax.broadcasted_iota(jnp.int32, (n2, dw), 1) // dh
    row_img = jax.lax.broadcasted_iota(jnp.int32, (n2, 1), 0) < N_PAD

    for bp in range(IMGS // 2):
        b0 = 2 * bp
        for g in range(0, H, n_sc):
            npair = (min(g + n_sc, H) - g) // 2
            for sl in range(npair):
                h = g + 2 * sl
                q0 = qkv_ref[b0, :N_PAD, h * dh:(h + 2) * dh]
                q1 = qkv_ref[b0 + 1, :N_PAD, h * dh:(h + 2) * dh]
                q_bd = jnp.concatenate([q0, q1], axis=0) * x.dtype.type(
                    SCALE)
                ks0 = qkv_ref[b0, :, d + h * dh:d + (h + 2) * dh]
                ks1 = qkv_ref[b0 + 1, :, d + h * dh:d + (h + 2) * dh]
                kbd2 = jnp.concatenate(
                    [jnp.where(lanei == 0, ks0, 0),
                     jnp.where(lanei == 1, ks0, 0),
                     jnp.where(lanei == 0, ks1, 0),
                     jnp.where(lanei == 1, ks1, 0)], axis=0)
                scores_ref[sl] = jax.lax.dot_general(
                    q_bd, kbd2, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            for sl in range(npair):
                h = g + 2 * sl
                s = scores_ref[sl]               # (n2, kv4)
                s = jnp.clip(s, _EXP_LO, _EXP_HI) + colbias
                e = jnp.exp(s)
                e = jnp.where(block_ok, e, 0.0)
                # per-head denominators: head halves are lane-aligned
                # quarters of the column span per image
                e0 = e[:, :KV] + e[:, 2 * KV:3 * KV]       # head h cols
                e1 = e[:, KV:2 * KV] + e[:, 3 * KV:]       # head h+1 cols
                r0 = jax.lax.reciprocal(
                    jnp.sum(e0, axis=-1, keepdims=True))
                r1 = jax.lax.reciprocal(
                    jnp.sum(e1, axis=-1, keepdims=True))
                div = jnp.where(lane_sm == 0, r0, r1)
                vs0 = qkv_ref[b0, :, 2 * d + h * dh:2 * d + (h + 2) * dh]
                vs1 = qkv_ref[b0 + 1, :,
                              2 * d + h * dh:2 * d + (h + 2) * dh]
                vbd2 = jnp.concatenate(
                    [jnp.where(lanei == 0, vs0, 0),
                     jnp.where(lanei == 1, vs0, 0),
                     jnp.where(lanei == 0, vs1, 0),
                     jnp.where(lanei == 1, vs1, 0)], axis=0)
                pv = jnp.dot(e.astype(x.dtype), vbd2,
                             preferred_element_type=jnp.float32)
                pv = (pv * div).astype(x.dtype)
                ao_ref[b0 * N_PAD:(b0 + 2) * N_PAD,
                       h * dh:(h + 2) * dh] = pv

    y = jnp.dot(ao_ref[:], wo_ref[:],
                preferred_element_type=jnp.float32) + bo_ref[0]
    o_ref[:] = (x + y.astype(x.dtype)).reshape(IMGS, N_PAD, d)


def imgpair_attn(x, ls, lb, wqkv, bqkv, wo, bo, n_sc: int, vmem: int):
    b = x.shape[0]
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_imgpair_kernel, n_sc=n_sc),
        grid=(b // IMGS,),
        in_specs=[
            pl.BlockSpec((IMGS, N_PAD, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, D)), const((1, D)),
            const((D, 3 * D)), const((1, 3 * D)),
            const((D, D)), const((1, D)),
        ],
        out_specs=pl.BlockSpec((IMGS, N_PAD, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, N_PAD, D), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((IMGS, KV, 3 * D), x.dtype),
            pltpu.VMEM((n_sc // 2, 2 * N_PAD, 4 * KV), jnp.float32),
            pltpu.VMEM((IMGS * N_PAD, D), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem),
    )(x, ls.reshape(1, -1).astype(jnp.float32),
      lb.reshape(1, -1).astype(jnp.float32),
      wqkv.astype(x.dtype), bqkv.reshape(1, -1).astype(jnp.float32),
      wo.astype(x.dtype), bo.reshape(1, -1).astype(jnp.float32))


key = jax.random.key(0)
ks = jax.random.split(key, 8)
x = jax.device_put(jax.random.normal(
    ks[0], (B, N_PAD, D), jnp.float32).astype(jnp.bfloat16))
# zero the pad token rows like padded residency does
x = x.at[:, N:].set(0)
ls = jnp.ones((D,), jnp.float32) + 0.1 * jax.random.normal(ks[1], (D,))
lb = 0.1 * jax.random.normal(ks[2], (D,))
wqkv = (jax.random.normal(ks[3], (D, 3 * D), jnp.float32)
        / np.sqrt(D)).astype(jnp.float32)
bqkv = 0.1 * jax.random.normal(ks[4], (3 * D,))
wo = (jax.random.normal(ks[5], (D, D), jnp.float32)
      / np.sqrt(D)).astype(jnp.float32)
bo = 0.1 * jax.random.normal(ks[6], (D,))
args = [jax.device_put(a) for a in (ls, lb, wqkv, bqkv, wo, bo)]


def stack_prod(x, *w):
    for _ in range(L):
        x = attn_block_pallas(x, *w, num_heads=H, eps=EPS, n_valid=N)
    return x


def make_stack_ip(n_sc, vmem):
    @jax.jit
    def stack(x, *w):
        for _ in range(L):
            x = imgpair_attn(x, *w, n_sc=n_sc, vmem=vmem)
        return x
    return stack


print("device:", jax.devices())
ref1 = jax.jit(stack_prod)(x, *args)
t = time_device_loop(lambda *a: jax.jit(stack_prod)(a[-1], *a[:-1]),
                     (*args, x), n_lo=4, n_hi=16)
print(f"A production pair kernel      {t * 1e3:8.3f} ms /{L}L")

for n_sc, vmem, lbl in ((4, 48 * 1024 * 1024, "B"),
                        (6, 64 * 1024 * 1024, "C")):
    try:
        st = make_stack_ip(n_sc, vmem)
        out = st(x, *args)
        d = float(jnp.max(jnp.abs(
            out[:, :N].astype(jnp.float32) -
            ref1[:, :N].astype(jnp.float32))))
        t = time_device_loop(lambda *a, _s=st: _s(a[-1], *a[:-1]),
                             (*args, x), n_lo=4, n_hi=16)
        print(f"{lbl} img-pair n_sc={n_sc} vmem={vmem >> 20}MB   "
              f"{t * 1e3:8.3f} ms /{L}L   max|diff|={d:.3e}")
        assert d == 0.0, f"img-pair parity broke: {d:.3e}"
    except Exception as e:  # noqa: BLE001
        print(f"{lbl} n_sc={n_sc}: FAILED {str(e)[:160]}")
