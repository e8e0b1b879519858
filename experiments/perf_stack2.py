"""Batch-1 latency: 2 layers per grid step in the single-launch encoder.

The layers-on-grid kernel (ops/vit_stack.py) runs one layer per grid
step; at batch 1 everything inside a step is on the critical path and
the step boundary is a scheduling barrier.  Packing TWO layers per step
(weights blocked (2, ...) per fetch) halves the barriers and gives
Mosaic a longer instruction stream to overlap layer i+1's first GEMM
with layer i's tail VPU work — while the revolving buffers still stream
2 layers' weights per step (bf16: 28 MB double-buffered, fits the
100 MB plan at ViT-B).

A: production vit_layers_pallas (1 layer/step)
B: 2 layers/step
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
from vit_fpga_tpu.ops.vit_stack import vit_layers_pallas
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H, M, DEPTH = 1, 197, 768, 12, 3072, 12
DH = D // H
N_PAD, KV = 208, 256
EPS = 1e-6
SCALE = 1.0 / (DH ** 0.5)
NEG = -1e30


def _half_pair(x, tok_dtype, l1s, l1b, wqkv, bqkv, wo, bo, l2s, l2b, w1,
               b1, w2, b2, qkv_s, sc, ao):
    """One transformer layer on (B*N_PAD, D) rows; weights are the
    per-layer slices."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    xn = ((xf - mu) * jax.lax.rsqrt(var + EPS) * l1s + l1b).astype(
        tok_dtype)
    qkv = (jnp.dot(xn, wqkv, preferred_element_type=jnp.float32)
           + bqkv).astype(tok_dtype)
    for b in range(B):
        qkv_s[b, :N_PAD] = qkv[b * N_PAD:(b + 1) * N_PAD]
        qkv_s[b, N_PAD:] = jnp.zeros((KV - N_PAD, 3 * D), tok_dtype)
    coli = jax.lax.broadcasted_iota(jnp.int32, (1, KV), 1)
    colbias = jnp.where(coli < N, 0.0, NEG)
    for b in range(B):
        for h in range(H):
            q = qkv_s[b, :N_PAD, h * DH:(h + 1) * DH] * tok_dtype.type(
                SCALE)
            k = qkv_s[b, :, D + h * DH:D + (h + 1) * DH]
            sc[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        for h in range(H):
            s = jnp.clip(sc[h], -70.0, 80.0) + colbias
            e = jnp.exp(s)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            v = qkv_s[b, :, 2 * D + h * DH:2 * D + (h + 1) * DH]
            pv = jnp.dot(e.astype(tok_dtype), v,
                         preferred_element_type=jnp.float32)
            ao[b * N_PAD:(b + 1) * N_PAD, h * DH:(h + 1) * DH] = (
                pv * jax.lax.reciprocal(denom)).astype(tok_dtype)
    y = jnp.dot(ao[:], wo, preferred_element_type=jnp.float32) + bo
    xa = x + y.astype(tok_dtype)
    xf2 = xa.astype(jnp.float32)
    mu2 = jnp.mean(xf2, axis=-1, keepdims=True)
    var2 = jnp.maximum(
        jnp.mean(xf2 * xf2, axis=-1, keepdims=True) - mu2 * mu2, 0.0)
    xn2 = ((xf2 - mu2) * jax.lax.rsqrt(var2 + EPS) * l2s + l2b).astype(
        tok_dtype)
    h2 = jnp.dot(xn2, w1, preferred_element_type=jnp.float32) + b1
    h2 = jax.nn.gelu(h2, approximate=True).astype(tok_dtype)
    y2 = jnp.dot(h2, w2, preferred_element_type=jnp.float32) + b2
    return xa + y2.astype(tok_dtype)


def _stack2_kernel(x_ref, l1s, l1b, wqkv, bqkv, wo, bo, l2s, l2b, w1, b1,
                   w2, b2, o_ref, tok, qkv_s, sc, ao, *, depth_steps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        tok[:] = x_ref[:].reshape(B * N_PAD, D)

    x = tok[:]
    for j in range(2):
        x = _half_pair(x, x.dtype, l1s[j], l1b[j], wqkv[j], bqkv[j],
                       wo[j], bo[j], l2s[j], l2b[j], w1[j], b1[j],
                       w2[j], b2[j], qkv_s, sc, ao)
    tok[:] = x

    @pl.when(i == depth_steps - 1)
    def _():
        o_ref[:] = x.reshape(B, N_PAD, D)


def stack2(x, blocks):
    def per2(*tr):
        return pl.BlockSpec((2,) + tr,
                            lambda i: (i,) + tuple(0 for _ in tr),
                            memory_space=pltpu.VMEM)

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    dt = x.dtype
    f32 = jnp.float32

    def vec(a):
        return a.reshape(a.shape[0], 1, a.shape[1]).astype(f32)

    return pl.pallas_call(
        functools.partial(_stack2_kernel, depth_steps=DEPTH // 2),
        grid=(DEPTH // 2,),
        in_specs=[const((B, N_PAD, D)),
                  per2(1, D), per2(1, D),
                  per2(D, 3 * D), per2(1, 3 * D),
                  per2(D, D), per2(1, D),
                  per2(1, D), per2(1, D),
                  per2(D, M), per2(1, M),
                  per2(M, D), per2(1, D)],
        out_specs=const((B, N_PAD, D)),
        out_shape=jax.ShapeDtypeStruct((B, N_PAD, D), dt),
        scratch_shapes=[
            pltpu.VMEM((B * N_PAD, D), dt),
            pltpu.VMEM((B, KV, 3 * D), dt),
            pltpu.VMEM((H, N_PAD, KV), f32),
            pltpu.VMEM((B * N_PAD, D), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x,
      vec(blocks["ln1_scale"]), vec(blocks["ln1_bias"]),
      blocks["wqkv"].astype(dt), vec(blocks["bqkv"]),
      blocks["wo"].astype(dt), vec(blocks["bo"]),
      vec(blocks["ln2_scale"]), vec(blocks["ln2_bias"]),
      blocks["w1"].astype(dt), vec(blocks["b1"]),
      blocks["w2"].astype(dt), vec(blocks["b2"]))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N_PAD, D)) * 0.5, jnp.bfloat16)
    blocks = {
        "ln1_scale": jnp.ones((DEPTH, D), jnp.float32),
        "ln1_bias": jnp.zeros((DEPTH, D), jnp.float32),
        "wqkv": jnp.asarray(rng.normal(size=(DEPTH, D, 3 * D)) * 0.02,
                            jnp.bfloat16),
        "bqkv": jnp.zeros((DEPTH, 3 * D), jnp.float32),
        "wo": jnp.asarray(rng.normal(size=(DEPTH, D, D)) * 0.02,
                          jnp.bfloat16),
        "bo": jnp.zeros((DEPTH, D), jnp.float32),
        "ln2_scale": jnp.ones((DEPTH, D), jnp.float32),
        "ln2_bias": jnp.zeros((DEPTH, D), jnp.float32),
        "w1": jnp.asarray(rng.normal(size=(DEPTH, D, M)) * 0.02,
                          jnp.bfloat16),
        "b1": jnp.zeros((DEPTH, M), jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(DEPTH, M, D)) * 0.02,
                          jnp.bfloat16),
        "b2": jnp.zeros((DEPTH, D), jnp.float32),
    }
    leaves, tdef = jax.tree_util.tree_flatten(blocks)

    @jax.jit
    def fA(*a):
        bl = jax.tree_util.tree_unflatten(tdef, a[:-1])
        return vit_layers_pallas(a[-1], bl, H, eps=EPS, act="gelu_tanh",
                                 n_valid=N)

    @jax.jit
    def fB(*a):
        bl = jax.tree_util.tree_unflatten(tdef, a[:-1])
        return stack2(a[-1], bl)

    args = tuple(leaves) + (x,)
    ref = np.asarray(fA(*args), np.float32)
    got = np.asarray(fB(*args), np.float32)
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
    print(f"stack2 parity: rel err {err:.2e}", flush=True)
    for rnd in range(4):
        tA = time_device_loop_single(fA, args, n=256)
        tB = time_device_loop_single(fB, args, n=256)
        print(f"round {rnd}: 1/step {tA * 1e6:7.1f} us  "
              f"2/step {tB * 1e6:7.1f} us  d={1e6 * (tA - tB):+6.1f}",
              flush=True)


if __name__ == "__main__":
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    main()
