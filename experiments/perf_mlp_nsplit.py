"""MLP kernel with GEMM1 split along mlp_dim: h1/h2 are independent, so
GELU(h1) (VPU) can overlap GEMM1's second half / GEMM2's first half
(MXU).  vs the monolithic kernel's strict GEMM1->GELU->GEMM2 chain."""
import sys, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from vit_fpga_tpu.ops.fused_mlp import fused_mlp_pallas
from vit_fpga_tpu.ops.common import round_up
from vit_fpga_tpu.utils.timing import time_device_loop_single

T, D, M = 64 * 197, 768, 3072


def make_nsplit(block_t, S):
    mc = M // S

    def kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        x = x_ref[:]
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * s_ref[0]
              + b_ref[0]).astype(x.dtype)
        hs = [jnp.dot(xn, w1_ref[:, c * mc:(c + 1) * mc],
                      preferred_element_type=jnp.float32)
              + b1_ref[0, c * mc:(c + 1) * mc] for c in range(S)]
        gs = [jax.nn.gelu(h, approximate=True).astype(x.dtype)
              for h in hs]
        y = b2_ref[0]
        for c in range(S):
            y = y + jnp.dot(gs[c], w2_ref[c * mc:(c + 1) * mc, :],
                            preferred_element_type=jnp.float32)
        o_ref[:] = x + y.astype(x.dtype)

    def fn(s, b, w1, b1, w2, b2, x):
        t, d = x.shape
        tp = round_up(t, block_t)
        xp = jnp.pad(x, ((0, tp - t), (0, 0))) if tp != t else x
        const = lambda shape: pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(tp // block_t,),
            in_specs=[pl.BlockSpec((block_t, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      const((1, d)), const((1, d)), const((d, M)),
                      const((1, M)), const((M, d)), const((1, d))],
            out_specs=pl.BlockSpec((block_t, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tp, d), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 * 1024 * 1024),
        )(xp, s.reshape(1, -1).astype(jnp.float32),
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


def rep(name, fn):
    try:
        got = np.asarray(fn(s, b, w1, b1, w2, b2, x)).astype(np.float32)
        md = np.abs(ref - got).max()
        t = time_device_loop_single(fn, (s, b, w1, b1, w2, b2, x),
                                    n=16, reps=3)
        print(f"{name:28s} {t*1e3:7.3f} ms  {4*T*D*M/t/1e12:5.1f} TF/s  "
              f"maxdiff={md:.2e}", flush=True)
    except Exception as e:
        m = [ln for ln in str(e).splitlines() if "Scoped" in ln]
        print(f"{name:28s} FAILED {(m[0] if m else str(e)[:120])[:140]}",
              flush=True)


rep("current bt=512",
    lambda s, b, w1, b1, w2, b2, x: fused_mlp_pallas(
        x, s, b, w1, b1, w2, b2, act="gelu_tanh"))
rep("nsplit bt=512 S=2", make_nsplit(512, 2))
rep("nsplit bt=512 S=4", make_nsplit(512, 4))
rep("nsplit bt=256 S=4", make_nsplit(256, 4))
