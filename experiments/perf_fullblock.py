"""With vmem_limit_bytes raised (v5e has far more than the 16MB default
scoped limit), test:
  A. current MLP kernel at bt=1024/2048
  B. whole-block mega-kernel: LN1+QKV+MHA+proj+res+LN2+MLP+res per image
  C. attention kernel with 2-img cells, full slots, ao scratch
"""
import sys, functools
import jax, jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from vit_fpga_tpu.ops.common import LANE, round_up
from vit_fpga_tpu.ops.fused_mlp import fused_mlp_pallas
from vit_fpga_tpu.ops import attn_block as ab
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H, M = 64, 197, 768, 12, 3072
DH = D // H
VMEM = 100 * 1024 * 1024


def mlp_big(block_t):
    def fn(s, b, w1, b1, w2, b2, x):
        import vit_fpga_tpu.ops.fused_mlp as fm
        t, d = x.shape
        m = w1.shape[1]
        tp = round_up(t, block_t)
        xp = jnp.pad(x, ((0, tp - t), (0, 0))) if tp != t else x
        const = lambda shape: pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(fm._mlp_kernel, eps=1e-6, act="gelu_tanh"),
            grid=(tp // block_t,),
            in_specs=[pl.BlockSpec((block_t, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      const((1, d)), const((1, d)), const((d, m)),
                      const((1, m)), const((m, d)), const((1, d))],
            out_specs=pl.BlockSpec((block_t, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tp, d), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=VMEM),
        )(xp, s.reshape(1, -1).astype(jnp.float32),
          b.reshape(1, -1).astype(jnp.float32),
          w1.astype(x.dtype), b1.reshape(1, -1).astype(jnp.float32),
          w2.astype(x.dtype), b2.reshape(1, -1).astype(jnp.float32))
        return out[:t]
    return fn


def _full_kernel(x_ref, l1s, l1b, wqkv, bqkv, wo, bo, l2s, l2b, w1, b1,
                 w2, b2, o_ref, qkv_s, sc, ao, *, eps, scale, n_pad,
                 kv_pad, n_valid, imgs):
    d = D
    for bi in range(imgs):
        x = x_ref[bi]
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * l1s[0] +
              l1b[0]).astype(x.dtype)
        qkv = (jnp.dot(xn, wqkv[:], preferred_element_type=jnp.float32)
               + bqkv[0]).astype(x.dtype)
        if kv_pad != n_pad:
            qkv_s[:n_pad] = qkv
            qkv_s[n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d), x.dtype)
        else:
            qkv_s[:] = qkv
        for h in range(H):
            q = qkv_s[:n_pad, h * DH:(h + 1) * DH]
            k = qkv_s[:, d + h * DH:d + (h + 1) * DH]
            sc[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        for h in range(H):
            s = sc[h]
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, -1e30)
            mx = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - mx)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
            v = qkv_s[:, 2 * d + h * DH:2 * d + (h + 1) * DH]
            ao[:, h * DH:(h + 1) * DH] = jnp.dot(
                p, v, preferred_element_type=jnp.float32).astype(x.dtype)
        y = jnp.dot(ao[:], wo[:], preferred_element_type=jnp.float32) + bo[0]
        xa = x + y.astype(x.dtype)
        # MLP half on the same VMEM-resident tokens
        xf2 = xa.astype(jnp.float32)
        mu2 = jnp.mean(xf2, axis=-1, keepdims=True)
        var2 = jnp.var(xf2, axis=-1, keepdims=True)
        xn2 = ((xf2 - mu2) * jax.lax.rsqrt(var2 + eps) * l2s[0] +
               l2b[0]).astype(x.dtype)
        hmid = jnp.dot(xn2, w1[:], preferred_element_type=jnp.float32) + b1[0]
        g = jax.nn.gelu(hmid, approximate=True).astype(x.dtype)
        y2 = jnp.dot(g, w2[:], preferred_element_type=jnp.float32) + b2[0]
        o_ref[bi] = xa + y2.astype(x.dtype)


def full_block(imgs):
    n_pad = round_up(N, 16)
    kv_pad = round_up(N, LANE)

    def fn(l1s, l1b, wqkv, bqkv, wo, bo, l2s, l2b, w1, b1, w2, b2, x):
        b, n, d = x.shape
        xp = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])
        const = lambda shape: pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_full_kernel, eps=1e-6, scale=DH ** -0.5,
                              n_pad=n_pad, kv_pad=kv_pad, n_valid=N,
                              imgs=imgs),
            grid=(b // imgs,),
            in_specs=[pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      const((1, d)), const((1, d)), const((d, 3 * d)),
                      const((1, 3 * d)), const((d, d)), const((1, d)),
                      const((1, d)), const((1, d)), const((d, M)),
                      const((1, M)), const((M, d)), const((1, d))],
            out_specs=pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
            scratch_shapes=[pltpu.VMEM((kv_pad, 3 * d), x.dtype),
                            pltpu.VMEM((H, n_pad, kv_pad), jnp.float32),
                            pltpu.VMEM((n_pad, d), x.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=VMEM),
        )(xp, l1s.reshape(1, -1).astype(jnp.float32),
          l1b.reshape(1, -1).astype(jnp.float32),
          wqkv.astype(x.dtype), bqkv.reshape(1, -1).astype(jnp.float32),
          wo.astype(x.dtype), bo.reshape(1, -1).astype(jnp.float32),
          l2s.reshape(1, -1).astype(jnp.float32),
          l2b.reshape(1, -1).astype(jnp.float32),
          w1.astype(x.dtype), b1.reshape(1, -1).astype(jnp.float32),
          w2.astype(x.dtype), b2.reshape(1, -1).astype(jnp.float32))
        return out[:, :N, :]
    return fn


ks = jax.random.split(jax.random.key(0), 12)
x3 = jax.device_put(jax.random.normal(ks[0], (B, N, D), jnp.bfloat16))
x2 = jax.device_put(x3.reshape(B * N, D))
l1s = jnp.ones((D,), jnp.float32); l1b = jnp.zeros((D,), jnp.float32)
l2s = jnp.ones((D,), jnp.float32); l2b = jnp.zeros((D,), jnp.float32)
wqkv = jax.device_put(jax.random.normal(ks[1], (D, 3 * D), jnp.bfloat16) * 0.02)
bqkv = jnp.zeros((3 * D,), jnp.float32)
wo = jax.device_put(jax.random.normal(ks[2], (D, D), jnp.bfloat16) * 0.02)
bo = jnp.zeros((D,), jnp.float32)
w1 = jax.device_put(jax.random.normal(ks[3], (D, M), jnp.bfloat16) * 0.02)
b1 = jnp.zeros((M,), jnp.float32)
w2 = jax.device_put(jax.random.normal(ks[4], (M, D), jnp.bfloat16) * 0.02)
b2 = jnp.zeros((D,), jnp.float32)

T = B * N
mlp_flops = 4 * T * D * M


def rep(name, fn, args, flops=None, ref=None, got_fn=None):
    try:
        got = np.asarray(got_fn()).astype(np.float32) if got_fn else None
        md = (np.abs(ref - got).max() if ref is not None else 0.0)
        t = time_device_loop_single(fn, args, n=16, reps=3)
        extra = f"  {flops/t/1e12:5.1f} TF/s" if flops else ""
        print(f"{name:30s} {t*1e3:7.3f} ms{extra}  maxdiff={md:.2e}",
              flush=True)
    except Exception as e:
        msg = [l for l in str(e).splitlines() if "Scoped" in l or "error" in l]
        print(f"{name:30s} FAILED: {(msg[0] if msg else str(e)[:150])[:180]}",
              flush=True)


rep("mlp current bt=512",
    lambda s, b, w1, b1, w2, b2, x: fused_mlp_pallas(
        x, s, b, w1, b1, w2, b2, act="gelu_tanh", block_t=512),
    (l2s, l2b, w1, b1, w2, b2, x2), flops=mlp_flops)
for bt in (1024, 2048):
    rep(f"mlp big bt={bt}", mlp_big(bt), (l2s, l2b, w1, b1, w2, b2, x2),
        flops=mlp_flops)

# whole-block reference for parity
ref_attn = ab.attn_block_xla(x3, l1s, l1b, wqkv, bqkv, wo, bo, H)
from vit_fpga_tpu.ops.fused_mlp import fused_mlp_xla
ref_full = np.asarray(fused_mlp_xla(
    ref_attn.reshape(B * N, D), l2s, l2b, w1, b1, w2, b2,
    act="gelu_tanh").reshape(B, N, D)).astype(np.float32)

for imgs in (1, 2):
    fb = full_block(imgs)
    rep(f"FULL block imgs={imgs}",
        lambda *a: fb(*a),
        (l1s, l1b, wqkv, bqkv, wo, bo, l2s, l2b, w1, b1, w2, b2, x3),
        flops=mlp_flops + 2 * B * (round_up(N,16)) * D * 4 * D
        + 4 * B * H * round_up(N,16) * 256 * DH,
        ref=ref_full,
        got_fn=lambda: fb(l1s, l1b, wqkv, bqkv, wo, bo, l2s, l2b,
                          w1, b1, w2, b2, x3))
