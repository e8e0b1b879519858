"""ViT-L/16@384 (seq 577, batch 16) per-half comparison: which attention
and MLP implementations win at this geometry?"""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from vit_fpga_tpu.ops import attn_block as ab
from vit_fpga_tpu.ops.attention import mha_qkv_xla, _mha_qkv_diff
from vit_fpga_tpu.ops.fused_mlp import (fused_mlp_chunked_pallas,
                                        fused_mlp_xla)
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H, M = 16, 577, 1024, 16, 4096
ks = jax.random.split(jax.random.key(0), 12)
x3 = jax.device_put(jax.random.normal(ks[0], (B, N, D), jnp.bfloat16))
x2 = jax.device_put(x3.reshape(B * N, D))
ls = jnp.ones((D,), jnp.float32); lb = jnp.zeros((D,), jnp.float32)
wqkv = jax.device_put(jax.random.normal(ks[1], (D, 3 * D), jnp.bfloat16) * 0.02)
bqkv = jnp.zeros((3 * D,), jnp.float32)
wo = jax.device_put(jax.random.normal(ks[2], (D, D), jnp.bfloat16) * 0.02)
bo = jnp.zeros((D,), jnp.float32)
w1 = jax.device_put(jax.random.normal(ks[3], (D, M), jnp.bfloat16) * 0.02)
b1 = jnp.zeros((M,), jnp.float32)
w2 = jax.device_put(jax.random.normal(ks[4], (M, D), jnp.bfloat16) * 0.02)
b2 = jnp.zeros((D,), jnp.float32)


def rep(name, fn, args):
    try:
        t = time_device_loop_single(fn, args, n=8, reps=3)
        print(f"{name:40s} {t*1e3:7.3f} ms", flush=True)
    except Exception as e:
        m = [ln for ln in str(e).splitlines() if "Scoped" in ln]
        print(f"{name:40s} FAILED {(m[0] if m else str(e)[:120])[:140]}",
              flush=True)


# attention half variants
rep("attn fused big-tier (current)",
    lambda ls, lb, wq, bq, wo, bo, x: ab.attn_block_pallas(
        x, ls, lb, wq, bq, wo, bo, H),
    (ls, lb, wqkv, bqkv, wo, bo, x3))


def attn_r1(ls, lb, wq, bq, wo, bo, x):
    """Round-1 path: XLA LN/projections + streamed packed-qkv Pallas MHA."""
    import vit_fpga_tpu.models.vit as vm
    h = vm._layernorm(x, ls, lb, 1e-6)
    qkv = h @ wq + bq.astype(x.dtype)
    o = _mha_qkv_diff(qkv, H, None)
    return x + (o @ wo + bo.astype(x.dtype))


rep("attn r1 (xla proj + streamed pallas)", attn_r1,
    (ls, lb, wqkv, bqkv, wo, bo, x3))


def attn_xla(ls, lb, wq, bq, wo, bo, x):
    return ab.attn_block_xla(x, ls, lb, wq, bq, wo, bo, H)


rep("attn unfused xla", attn_xla, (ls, lb, wqkv, bqkv, wo, bo, x3))

# MLP half variants
rep("mlp chunked fused n=2 (current)",
    lambda ls, lb, w1, b1, w2, b2, x: fused_mlp_chunked_pallas(
        x, ls, lb, w1, b1, w2, b2, act="gelu_tanh", n_chunks=2),
    (ls, lb, w1, b1, w2, b2, x2))
rep("mlp chunked fused n=2 bt512",
    lambda ls, lb, w1, b1, w2, b2, x: fused_mlp_chunked_pallas(
        x, ls, lb, w1, b1, w2, b2, act="gelu_tanh", n_chunks=2,
        block_t=512),
    (ls, lb, w1, b1, w2, b2, x2))
rep("mlp xla (r1 path)",
    lambda ls, lb, w1, b1, w2, b2, x: fused_mlp_xla(
        x, ls, lb, w1, b1, w2, b2, act="gelu_tanh"),
    (ls, lb, w1, b1, w2, b2, x2))
