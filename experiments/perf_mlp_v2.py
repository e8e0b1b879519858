"""Fused-MLP v2 sweep: can VPU (LN/GELU) overlap MXU across sub-tiles?

Current kernel: one (block_t, D) tile per cell, strict LN->GEMM1->GELU->
GEMM2 dependency chain -> VPU work sits on the MXU critical path
(202 TF/s vs 225 observed ceiling).  Variants split each cell into S
sub-tiles and issue ops in an interleaved order so GELU(a) can run while
GEMM1(b) occupies the MXU.
"""
import sys, functools
import jax, jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops.fused_mlp import fused_mlp_pallas, fused_mlp_xla
from vit_fpga_tpu.ops.common import round_up
from vit_fpga_tpu.utils.timing import time_device_loop_single
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, D, M = 64 * 197, 768, 3072


def _ln(x, s, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * s + b).astype(x.dtype)


def make_subtile(block_t, S):
    sub = block_t // S

    def kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        # software-pipelined sub-tiles: all GEMM1s first is wrong (h must
        # stay small); instead do h(i) = GEMM1(ln(i)); g(i) = GELU(h(i));
        # y(i) = GEMM2(g(i)) with the loop unrolled so Mosaic can overlap
        # GELU(i) with GEMM1(i+1) / GEMM2(i-1).
        xs = [x_ref[i * sub:(i + 1) * sub] for i in range(S)]
        xn = [_ln(x, s_ref[0], b_ref[0]) for x in xs]
        hs = [None] * S
        gs = [None] * S
        for i in range(S):
            hs[i] = jnp.dot(xn[i], w1_ref[:],
                            preferred_element_type=jnp.float32) + b1_ref[0]
            if i > 0:
                gs[i - 1] = jax.nn.gelu(hs[i - 1],
                                        approximate=True).astype(x_ref.dtype)
        gs[S - 1] = jax.nn.gelu(hs[S - 1],
                                approximate=True).astype(x_ref.dtype)
        for i in range(S):
            y = jnp.dot(gs[i], w2_ref[:],
                        preferred_element_type=jnp.float32) + b2_ref[0]
            o_ref[i * sub:(i + 1) * sub] = xs[i] + y.astype(x_ref.dtype)

    def fn(x, s, b, w1, b1, w2, b2):
        t, d = x.shape
        m = w1.shape[1]
        tp = round_up(t, block_t)
        if tp != t:
            x = jnp.pad(x, ((0, tp - t), (0, 0)))
        const = lambda shape: pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(tp // block_t,),
            in_specs=[pl.BlockSpec((block_t, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      const((1, d)), const((1, d)), const((d, m)),
                      const((1, m)), const((m, d)), const((1, d))],
            out_specs=pl.BlockSpec((block_t, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tp, d), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x, s.reshape(1, -1).astype(jnp.float32),
          b.reshape(1, -1).astype(jnp.float32),
          w1.astype(x.dtype), b1.reshape(1, -1).astype(jnp.float32),
          w2.astype(x.dtype), b2.reshape(1, -1).astype(jnp.float32))
        return out[:t]
    return fn


ks = jax.random.split(jax.random.key(0), 8)
x = jax.device_put(jax.random.normal(ks[0], (T, D), jnp.bfloat16))
s = jnp.ones((D,), jnp.float32); b = jnp.zeros((D,), jnp.float32)
w1 = jax.device_put(jax.random.normal(ks[1], (D, M), jnp.bfloat16) * 0.02)
b1 = jnp.zeros((M,), jnp.float32)
w2 = jax.device_put(jax.random.normal(ks[2], (M, D), jnp.bfloat16) * 0.02)
b2 = jnp.zeros((D,), jnp.float32)

ref = np.asarray(fused_mlp_pallas(x, s, b, w1, b1, w2, b2,
                                  act="gelu_tanh")).astype(np.float32)


def report(name, fn):
    try:
        got = np.asarray(fn(x, s, b, w1, b1, w2, b2)).astype(np.float32)
        md = np.abs(ref - got).max()
        t = time_device_loop_single(
            lambda s, b, w1, b1, w2, b2, x: fn(x, s, b, w1, b1, w2, b2),
            (s, b, w1, b1, w2, b2, x), n=16, reps=3)
        tf = 4 * T * D * M / t / 1e12
        print(f"{name:28s} {t*1e3:7.3f} ms  {tf:5.1f} TF/s  "
              f"maxdiff={md:.2e}", flush=True)
    except Exception as e:
        print(f"{name:28s} FAILED: {str(e)[:160]}", flush=True)


report("current bt=256", lambda *a: fused_mlp_pallas(*a, act="gelu_tanh"))
report("current bt=512",
       lambda *a: fused_mlp_pallas(*a, act="gelu_tanh", block_t=512))
report("subtile bt=256 S=2", make_subtile(256, 2))
report("subtile bt=512 S=2", make_subtile(512, 2))
report("subtile bt=512 S=4", make_subtile(512, 4))
report("subtile bt=1024 S=4", make_subtile(1024, 4))
