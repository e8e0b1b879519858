"""Attention kernel variants: phase-split and multi-image cells."""
import sys
import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops.common import LANE, round_up
from vit_fpga_tpu.ops.attention import mha_qkv_pallas, mha_qkv_xla
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H = 64, 197, 768, 12
DH = D // H
NP = 256
qkv = jax.device_put(
    jax.random.normal(jax.random.key(0), (B, N, 3 * D), jnp.bfloat16))
flops = 2 * 2 * B * H * NP * NP * DH


def kernel_v3(qkv_ref, o_ref, scores_ref, *, scale, n_valid, n_pad,
              n_heads, dh, imgs):
    d = n_heads * dh
    for b in range(imgs):
        q3 = qkv_ref[b]
        # phase 1: all QK^T matmuls into the scores scratch
        for h in range(n_heads):
            q = q3[:, h * dh:(h + 1) * dh]
            k = q3[:, d + h * dh:d + (h + 1) * dh]
            scores_ref[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        # phase 2+3: softmax + PV per head
        for h in range(n_heads):
            s = scores_ref[h]
            if n_valid < n_pad:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n_valid, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q3.dtype)
            v = q3[:, 2 * d + h * dh:2 * d + (h + 1) * dh]
            o_ref[b, :, h * dh:(h + 1) * dh] = jnp.dot(
                p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def mha_v3(qkv, num_heads, imgs_per_cell=1):
    b, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    n_pad = round_up(n, LANE)
    if n_pad != n:
        qkv = jnp.pad(qkv, [(0, 0), (0, n_pad - n), (0, 0)])
    out = pl.pallas_call(
        functools.partial(kernel_v3, scale=1.0 / dh ** 0.5, n_valid=n,
                          n_pad=n_pad, n_heads=num_heads, dh=dh,
                          imgs=imgs_per_cell),
        grid=(b // imgs_per_cell,),
        in_specs=[pl.BlockSpec((imgs_per_cell, n_pad, d3),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((imgs_per_cell, n_pad, d),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((num_heads, n_pad, n_pad), jnp.float32)],
    )(qkv)
    return out[:, :n, :]


def report(name, fn):
    t = time_device_loop_single(fn, (qkv,), n=24, reps=3)
    print(f"{name:28s} {t*1e3:7.3f} ms  ({flops/t/1e12:5.1f} TF/s)",
          flush=True)


report("v2 (current, fused loop)", lambda q: mha_qkv_pallas(q, H))
report("v3 phase-split", jax.jit(lambda q: mha_v3(q, H)))
report("v3 2-img cells", jax.jit(lambda q: mha_v3(q, H, imgs_per_cell=2)))
