"""Compact-row (pad-free) residency layout (round 3 MFU push).

The padded residency carries 208 rows/image for bf16 sublane alignment;
the 11 pad rows/image are 5.3% of every row-space GEMM (MLP: ~0.55 ms /
12 ViT-B layers at b64; attention projections: ~0.22 ms).  A COMPACT
layout (197 rows/img) eliminates them:
  * attention cells of 16 images = 3152 rows — a 16-sublane multiple,
    so HBM blocks stay aligned; per-image rows inside the cell start at
    197*i (sublane-misaligned -> Mosaic relayouts on the 32 per-image
    slice/store sites, the cost this experiment measures);
  * the MLP runs a masked last grid block (12608 = 24x512 + 320) —
    Pallas masks the out-of-range rows, no jnp.pad round-trip.

Variants (12-layer attn+MLP chains, b64 ViT-B bf16):
  P : production padded pair (attn_block_pallas + fused_mlp_pallas)
  C : compact 16-img attention cells + masked-grid MLP
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops.attn_block import attn_block_pallas
from vit_fpga_tpu.ops.fused_mlp import fused_mlp_pallas, _act
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H, M = 64, 197, 768, 12, 3072
DH = D // H
N_PAD, KV = 208, 256
import os
NI = int(os.environ.get('VFT_NI', '16'))  # images per compact attention cell
RC = NI * N              # 3152 compact rows per cell
EPS = 1e-6
SCALE = 1.0 / (DH ** 0.5)
NEG = -1e30
L = 12
BT = 512
VMEM64 = 64 * 1024 * 1024


def _ln(xf):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True)
                      - mu * mu, 0.0)
    return (xf - mu) * jax.lax.rsqrt(var + EPS)


def attn_k_compact(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wo_ref,
                   bo_ref, o_ref, qkv_ref, scores_ref, ao_ref):
    x = x_ref[:]                                    # (RC, D)
    xn = (_ln(x.astype(jnp.float32)) * ls_ref[0] + lb_ref[0]).astype(
        x.dtype)
    for b in range(NI):
        qkv_b = (jnp.dot(xn[b * N:(b + 1) * N], wqkv_ref[:],
                         preferred_element_type=jnp.float32)
                 + bqkv_ref[0]).astype(x.dtype)
        qkv_ref[b, :N] = qkv_b
        qkv_ref[b, N:] = jnp.zeros((KV - N, 3 * D), x.dtype)
    lanei = jax.lax.broadcasted_iota(jnp.int32, (KV, 2 * DH), 1) // DH
    lane_sm = jax.lax.broadcasted_iota(jnp.int32, (N, 2 * DH), 1) // DH
    coli = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * KV), 1)
    colbias = jnp.where(coli % KV < N, 0.0, NEG)
    for b in range(NI):
        for g in range(0, H, 6):
            for sl in range(3):
                h = g + 2 * sl
                q2 = qkv_ref[b, :N, h * DH:(h + 2) * DH] * x.dtype.type(
                    SCALE)
                ks = qkv_ref[b, :, D + h * DH:D + (h + 2) * DH]
                kbd = jnp.concatenate(
                    [jnp.where(lanei == 0, ks, 0),
                     jnp.where(lanei == 1, ks, 0)], axis=0)
                scores_ref[sl, :N] = jax.lax.dot_general(
                    q2, kbd, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            for sl in range(3):
                h = g + 2 * sl
                s = jnp.clip(scores_ref[sl, :N], -70.0, 80.0) + colbias
                e = jnp.exp(s)
                r0 = jax.lax.reciprocal(
                    jnp.sum(e[:, :KV], axis=-1, keepdims=True))
                r1 = jax.lax.reciprocal(
                    jnp.sum(e[:, KV:], axis=-1, keepdims=True))
                div = jnp.where(lane_sm == 0, r0, r1)
                vs = qkv_ref[b, :, 2 * D + h * DH:2 * D + (h + 2) * DH]
                vbd = jnp.concatenate(
                    [jnp.where(lanei == 0, vs, 0),
                     jnp.where(lanei == 1, vs, 0)], axis=0)
                pv = jnp.dot(e.astype(x.dtype), vbd,
                             preferred_element_type=jnp.float32)
                ao_ref[b, :N, h * DH:(h + 2) * DH] = (pv * div).astype(
                    x.dtype)
    for b in range(NI):
        y = (jnp.dot(ao_ref[b, :N], wo_ref[:],
                     preferred_element_type=jnp.float32) + bo_ref[0])
        o_ref[b * N:(b + 1) * N] = (x[b * N:(b + 1) * N]
                                    + y.astype(x.dtype))


def _const(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def attn_compact(x, w):
    tile = pl.BlockSpec((RC, D), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        attn_k_compact, grid=(B // NI,),
        in_specs=[tile, _const((1, D)), _const((1, D)),
                  _const((D, 3 * D)), _const((1, 3 * D)),
                  _const((D, D)), _const((1, D))],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((B * N, D), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((NI, KV, 3 * D), jnp.bfloat16),
            pltpu.VMEM((3, N_PAD, 2 * KV), jnp.float32),
            pltpu.VMEM((NI, N_PAD, D), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM64),
    )(x, *w)


def _mlp_kernel_c(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  o_ref):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    xn = (_ln(xf) * s_ref[0] + b_ref[0]).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[0]
    h = _act(h, "gelu_tanh").astype(x.dtype)
    y = jnp.dot(h, w2_ref[:],
                preferred_element_type=jnp.float32) + b2_ref[0]
    o_ref[:] = x + y.astype(x.dtype)


def mlp_compact(x, w):
    t = x.shape[0]                        # 12608: masked last block
    tile = pl.BlockSpec((BT, D), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mlp_kernel_c, grid=((t + BT - 1) // BT,),
        in_specs=[tile, _const((1, D)), _const((1, D)),
                  _const((D, M)), _const((1, M)), _const((M, D)),
                  _const((1, D))],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((t, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, *w)


def main():
    rng = np.random.default_rng(0)
    xc = jnp.asarray(rng.normal(size=(B * N, D)) * 0.3, jnp.bfloat16)
    # padded twin: insert 11 zero rows per image
    xp = jnp.zeros((B, N_PAD, D), jnp.bfloat16).at[:, :N].set(
        xc.reshape(B, N, D))
    aw = (jnp.asarray(rng.normal(size=(1, D)) * 0.1 + 1, jnp.float32),
          jnp.asarray(rng.normal(size=(1, D)) * 0.1, jnp.float32),
          jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.03, jnp.bfloat16),
          jnp.asarray(rng.normal(size=(1, 3 * D)) * 0.02, jnp.float32),
          jnp.asarray(rng.normal(size=(D, D)) * 0.03, jnp.bfloat16),
          jnp.asarray(rng.normal(size=(1, D)) * 0.02, jnp.float32))
    mw = (jnp.asarray(rng.normal(size=(1, D)) * 0.1 + 1, jnp.float32),
          jnp.asarray(rng.normal(size=(1, D)) * 0.1, jnp.float32),
          jnp.asarray(rng.normal(size=(D, M)) * 0.02, jnp.bfloat16),
          jnp.asarray(rng.normal(size=(1, M)) * 0.02, jnp.float32),
          jnp.asarray(rng.normal(size=(M, D)) * 0.02, jnp.bfloat16),
          jnp.asarray(rng.normal(size=(1, D)) * 0.02, jnp.float32))

    @jax.jit
    def chain_c(x, aw, mw):
        for _ in range(L):
            x = attn_compact(x, aw)
            x = mlp_compact(x, mw)
        return x

    @jax.jit
    def chain_p(x, aw, mw):
        for _ in range(L):
            x = attn_block_pallas(
                x.reshape(B * N_PAD, 1, D).reshape(B, N_PAD, D),
                aw[0][0], aw[1][0], aw[2], aw[3][0], aw[4], aw[5][0],
                H, n_valid=N)
            x = fused_mlp_pallas(
                x.reshape(B * N_PAD, D), mw[0][0], mw[1][0], mw[2],
                mw[3][0], mw[4], mw[5][0], act="gelu_tanh", block_t=BT
            ).reshape(B, N_PAD, D)
        return x

    yc = np.asarray(chain_c(xc, aw, mw), np.float32).reshape(B, N, D)
    yp = np.asarray(chain_p(xp, aw, mw), np.float32)[:, :N]
    print(f"compact vs padded max abs diff (12L bf16): "
          f"{np.abs(yc - yp).max():.2e}")

    for rnd in range(4):
        tc = time_device_loop_single(
            lambda x: chain_c(x, aw, mw), (xc,), n=8)
        tp = time_device_loop_single(
            lambda x: chain_p(x, aw, mw), (xp,), n=8)
        print(f"round {rnd}: P {tp * 1e3:7.3f}  C {tc * 1e3:7.3f} "
              f"({(tp - tc) * 1e3:+6.3f})  ms/12L-pairs")


if __name__ == "__main__":
    main()
