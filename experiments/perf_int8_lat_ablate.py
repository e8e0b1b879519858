"""Batch-1 int8 single-launch encoder: stage ablation.

Where do the ~147 us above the weight-stream floor go?  The int8 stack
(ops/vit_stack.py vit_layers_int8_pallas) measures 251.8-257.6 us p50 at
ViT-B; the pure int8 weight read is ~86 MB / 819 GB/s ~= 105 us.  Per
layer that is ~21 us measured vs ~8.8 us of weight stream, so the kernel
is COMPUTE-bound at batch 1 and the question is which stage dominates.

Variants (all one pallas_call, layers on the grid, same specs as
production; only the kernel body changes):

  full       production int8 kernel body
  no_scores  per-head QK^T/softmax/PV replaced by ao = q-slice copy
             (removes 24 dh=64 GEMMs + softmax VPU per layer)
  no_sm      scores computed, softmax replaced by e = s (removes
             clip/exp/sum/reciprocal VPU; keeps both GEMM shapes)
  no_quant   row-quant passes removed: GEMMs run bf16 (removes 4
             _row_quant VPU passes + int8->f32 dequant muls; GEMM time
             doubles, so this isolates quant-VPU vs MXU trade)
  stream     weights are read (one element folded into the output) but
             no math at all — the revolving-buffer weight-stream floor
             through this grid, i.e. the latency the memory system
             allows this kernel shape.

Decision input for VERDICT r2 #6 (target: p50 <= ~180 us int8).
"""
import functools
import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops.quant_block import _row_quant
from vit_fpga_tpu.ops.vit_stack import vit_layers_int8_pallas
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H, M, DEPTH = 1, 197, 768, 12, 3072, 12
DH = D // H
N_PAD, KV = 208, 256
EPS = 1e-6
SCALE = 1.0 / (DH ** 0.5)
NEG = -1e30
_EXP_LO, _EXP_HI = -70.0, 80.0


def _kernel(x_ref, l1s, l1b, wqkv, sqkv, bqkv, wo, so, bo, l2s, l2b,
            w1, s1, b1, w2, s2, b2, o_ref, tok, qkv_s, sc, ao, *,
            variant: str):
    i = pl.program_id(0)
    d = D

    @pl.when(i == 0)
    def _():
        tok[:] = x_ref[:].reshape(B * N_PAD, d)

    x = tok[:]

    if variant == "stream":
        # Touch every weight block so the grid still streams them, then
        # do a near-zero amount of math (i8 scalar extracts are not
        # lowerable; sum a row slice in f32 instead).
        touch = (jnp.sum(wqkv[0, :1, :].astype(jnp.float32))
                 + jnp.sum(wo[0, :1, :].astype(jnp.float32))
                 + jnp.sum(w1[0, :1, :].astype(jnp.float32))
                 + jnp.sum(w2[0, :1, :].astype(jnp.float32))
                 + jnp.sum(sqkv[0]) + jnp.sum(so[0])
                 + jnp.sum(s1[0]) + jnp.sum(s2[0]))
        tok[:] = x + (touch * 1e-30).astype(x.dtype)

        @pl.when(i == DEPTH - 1)
        def _():
            o_ref[:] = tok[:].reshape(B, N_PAD, d)
        return

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    xn = (xf - mu) * jax.lax.rsqrt(var + EPS) * l1s[0] + l1b[0]
    if variant == "no_quant":
        qkv = (jnp.dot(xn.astype(x.dtype), wqkv[0].astype(x.dtype),
                       preferred_element_type=jnp.float32)
               + bqkv[0]).astype(x.dtype)
    else:
        xq, sx = _row_quant(xn)
        acc = jax.lax.dot_general(xq, wqkv[0], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        qkv = (acc.astype(jnp.float32) * (sx * sqkv[0])
               + bqkv[0]).astype(x.dtype)
    for b in range(B):
        qkv_s[b, :N_PAD] = qkv[b * N_PAD:(b + 1) * N_PAD]
        qkv_s[b, N_PAD:] = jnp.zeros((KV - N_PAD, 3 * d), x.dtype)
    coli = jax.lax.broadcasted_iota(jnp.int32, (1, KV), 1)
    colbias = jnp.where(coli < N, 0.0, NEG)
    q_scaled = math.frexp(SCALE)[0] == 0.5
    if variant == "no_scores":
        for b in range(B):
            ao[b * N_PAD:(b + 1) * N_PAD, :] = qkv_s[b, :N_PAD, :d]
    else:
        for b in range(B):
            for h in range(H):
                q = qkv_s[b, :N_PAD, h * DH:(h + 1) * DH]
                if q_scaled:
                    q = q * x.dtype.type(SCALE)
                k = qkv_s[b, :, d + h * DH:d + (h + 1) * DH]
                sc[h] = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            for h in range(H):
                s = sc[h]
                if not q_scaled:
                    s = s * SCALE
                v = qkv_s[b, :, 2 * d + h * DH:2 * d + (h + 1) * DH]
                if variant == "no_sm":
                    e = s
                    pv = jnp.dot(e.astype(x.dtype), v,
                                 preferred_element_type=jnp.float32)
                    ao[b * N_PAD:(b + 1) * N_PAD,
                       h * DH:(h + 1) * DH] = pv.astype(x.dtype)
                else:
                    s = jnp.clip(s, _EXP_LO, _EXP_HI) + colbias
                    e = jnp.exp(s)
                    denom = jnp.sum(e, axis=-1, keepdims=True)
                    pv = jnp.dot(e.astype(x.dtype), v,
                                 preferred_element_type=jnp.float32)
                    ao[b * N_PAD:(b + 1) * N_PAD, h * DH:(h + 1) * DH] = (
                        pv * jax.lax.reciprocal(denom)).astype(x.dtype)
    if variant == "no_quant":
        y = (jnp.dot(ao[:], wo[0].astype(x.dtype),
                     preferred_element_type=jnp.float32) + bo[0])
    else:
        aoq, sa = _row_quant(ao[:].astype(jnp.float32))
        acc_o = jax.lax.dot_general(aoq, wo[0], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
        y = acc_o.astype(jnp.float32) * (sa * so[0]) + bo[0]
    xa = x + y.astype(x.dtype)

    xf2 = xa.astype(jnp.float32)
    mu2 = jnp.mean(xf2, axis=-1, keepdims=True)
    var2 = jnp.maximum(
        jnp.mean(xf2 * xf2, axis=-1, keepdims=True) - mu2 * mu2, 0.0)
    xn2 = (xf2 - mu2) * jax.lax.rsqrt(var2 + EPS) * l2s[0] + l2b[0]
    if variant == "no_quant":
        h_ = (jnp.dot(xn2.astype(x.dtype), w1[0].astype(x.dtype),
                      preferred_element_type=jnp.float32) + b1[0])
    else:
        hq, sh = _row_quant(xn2)
        acc1 = jax.lax.dot_general(hq, w1[0], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        h_ = acc1.astype(jnp.float32) * (sh * s1[0]) + b1[0]
    h_ = jax.nn.gelu(h_, approximate=True)
    if variant == "no_quant":
        y2 = (jnp.dot(h_.astype(x.dtype), w2[0].astype(x.dtype),
                      preferred_element_type=jnp.float32) + b2[0])
    else:
        gq, sg = _row_quant(h_)
        acc2 = jax.lax.dot_general(gq, w2[0], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        y2 = acc2.astype(jnp.float32) * (sg * s2[0]) + b2[0]
    out = xa + y2.astype(x.dtype)
    tok[:] = out

    @pl.when(i == DEPTH - 1)
    def _():
        o_ref[:] = out.reshape(B, N_PAD, d)


def build(variant, qb, x):
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    def per_layer(*tr):
        return pl.BlockSpec((1,) + tr,
                            lambda i: (i,) + tuple(0 for _ in tr),
                            memory_space=pltpu.VMEM)

    def vec(a):
        return a.reshape(a.shape[0], 1, a.shape[1]).astype(jnp.float32)

    dt = x.dtype
    fn = pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        grid=(DEPTH,),
        in_specs=[const((B, N_PAD, D)),
                  per_layer(1, D), per_layer(1, D),
                  per_layer(D, 3 * D), per_layer(1, 3 * D),
                  per_layer(1, 3 * D),
                  per_layer(D, D), per_layer(1, D), per_layer(1, D),
                  per_layer(1, D), per_layer(1, D),
                  per_layer(D, M), per_layer(1, M), per_layer(1, M),
                  per_layer(M, D), per_layer(1, D), per_layer(1, D)],
        out_specs=const((B, N_PAD, D)),
        out_shape=jax.ShapeDtypeStruct((B, N_PAD, D), dt),
        scratch_shapes=[
            pltpu.VMEM((B * N_PAD, D), dt),
            pltpu.VMEM((B, KV, 3 * D), dt),
            pltpu.VMEM((H, N_PAD, KV), jnp.float32),
            pltpu.VMEM((B * N_PAD, D), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return fn, (x,
                vec(qb["ln1_scale"]), vec(qb["ln1_bias"]),
                qb["wqkv_q"], vec(qb["wqkv_s"]), vec(qb["bqkv"]),
                qb["wo_q"], vec(qb["wo_s"]), vec(qb["bo"]),
                vec(qb["ln2_scale"]), vec(qb["ln2_bias"]),
                qb["w1_q"], vec(qb["w1_s"]), vec(qb["b1"]),
                qb["w2_q"], vec(qb["w2_s"]), vec(qb["b2"]))


def main():
    rng = np.random.default_rng(0)
    qb = {}
    for k, shape in [("wqkv_q", (DEPTH, D, 3 * D)), ("wo_q", (DEPTH, D, D)),
                     ("w1_q", (DEPTH, D, M)), ("w2_q", (DEPTH, M, D))]:
        qb[k] = jnp.asarray(
            rng.integers(-127, 128, size=shape, dtype=np.int32), jnp.int8)
        qb[k[:-2] + "_s"] = jnp.asarray(
            rng.uniform(0.5, 1.5, size=(DEPTH, shape[-1])), jnp.float32
        ) * 0.01
    for k, shape in [("bqkv", (DEPTH, 3 * D)), ("bo", (DEPTH, D)),
                     ("b1", (DEPTH, M)), ("b2", (DEPTH, D)),
                     ("ln1_scale", (DEPTH, D)), ("ln1_bias", (DEPTH, D)),
                     ("ln2_scale", (DEPTH, D)), ("ln2_bias", (DEPTH, D))]:
        qb[k] = jnp.asarray(rng.normal(size=shape) * 0.1 + (
            1.0 if "scale" in k else 0.0), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, N_PAD, D)) * 0.1, jnp.bfloat16)

    # Baseline: the production kernel (sanity that the "full" variant here
    # matches its timing).
    prod_qb = dict(qb)
    fns = {}
    for variant in ["full", "no_scores", "no_sm", "no_quant", "stream"]:
        fn, args = build(variant, qb, x)
        fns[variant] = (jax.jit(fn), args)
        out = fns[variant][0](*args)
        jax.block_until_ready(out)

    @jax.jit
    def prod(x):
        return vit_layers_int8_pallas(x, prod_qb, H, eps=EPS,
                                      act="gelu_tanh", n_valid=N)
    jax.block_until_ready(prod(x))

    for rnd in range(4):
        line = []
        t = time_device_loop_single(prod, (x,), n=256)
        line.append(f"prod {t * 1e6:6.1f}")
        for variant, (fn, args) in fns.items():
            t = time_device_loop_single(fn, args, n=256)
            line.append(f"{variant} {t * 1e6:6.1f}")
        print(f"round {rnd}: " + "  ".join(line) + "  (us)", flush=True)


if __name__ == "__main__":
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    main()
