"""Head-pair-packed score GEMMs (round 3 MFU push).

The attention ablation charges ~1.3 ms/12L to the per-head score GEMMs:
24 GEMMs per image-cell at K=dh=64 (half the MXU contraction rows) and
N=64 (PV), every q/k/v slice 64-lane (half-tile) aligned.  Packing head
PAIRS is MXU-cycle-neutral (2x the MACs at 2x the lane utilization) but
halves the GEMM count and makes every slice 128-lane aligned — the win,
if any, is pure glue (slice relayouts, instruction issue).

The block-diagonal panels need NO transposes or lane shifts: adjacent
heads already live in their own 64-lane halves of the qkv panel, so
  kbd = [[k_h  | 0   ],      vbd = [[v_h  | 0   ],
         [0    | k_h1]]             [0    | v_h1]]
are two lane-masked selects stacked on the sublane axis, and
  [S_h | S_h1] = q2 @ kbd^T   (K=128, N=2*KV)
  [PV_h|PV_h1] = E2 @ vbd     (K=2*KV, N=128)
with per-head denominators from a (n, 2, KV) reshape-sum.

Variants (12-layer attention-only stacks, ViT-B b64 production geometry:
4-img cells, 6 score slots, 48 MB plan):
  P     : production per-head loop
  PAIR2 : head pairs   (6 GEMM pairs/img, K=128, N=512 scores)
  PAIR4 : head quads   (3 GEMMs/img, K=256, N=1024 scores)
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H, M = 64, 197, 768, 12, 3072
DH = D // H
N_PAD, KV, IMGS, NSC = 208, 256, 4, 6
EPS = 1e-6
SCALE = 1.0 / (DH ** 0.5)
NEG = -1e30
VMEM48 = 48 * 1024 * 1024
L = 12


def _ln(xf):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True)
                      - mu * mu, 0.0)
    return (xf - mu) * jax.lax.rsqrt(var + EPS)


def _prologue(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, qkv_ref):
    x = x_ref[:].reshape(IMGS * N_PAD, D)
    xn = (_ln(x.astype(jnp.float32)) * ls_ref[0] + lb_ref[0]).astype(
        x.dtype)
    for b in range(IMGS):
        qkv_b = (jnp.dot(xn[b * N_PAD:(b + 1) * N_PAD], wqkv_ref[:],
                         preferred_element_type=jnp.float32)
                 + bqkv_ref[0]).astype(x.dtype)
        qkv_ref[b, :N_PAD] = qkv_b
        qkv_ref[b, N_PAD:] = jnp.zeros((KV - N_PAD, 3 * D), x.dtype)
    return x


def _epilogue(x, ao_ref, wo_ref, bo_ref, o_ref):
    y = jnp.dot(ao_ref[:], wo_ref[:],
                preferred_element_type=jnp.float32) + bo_ref[0]
    o_ref[:] = (x + y.astype(x.dtype)).reshape(IMGS, N_PAD, D)


def attn_k_prod(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                o_ref, qkv_ref, scores_ref, ao_ref):
    x = _prologue(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, qkv_ref)
    coli = jax.lax.broadcasted_iota(jnp.int32, (1, KV), 1)
    colbias = jnp.where(coli < N, 0.0, NEG)
    for b in range(IMGS):
        for g in range(0, H, NSC):
            heads = range(g, min(g + NSC, H))
            for h in heads:
                q = qkv_ref[b, :N_PAD, h * DH:(h + 1) * DH] * x.dtype.type(
                    SCALE)
                k = qkv_ref[b, :, D + h * DH:D + (h + 1) * DH]
                scores_ref[h - g] = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            for h in heads:
                s = jnp.clip(scores_ref[h - g], -70.0, 80.0) + colbias
                e = jnp.exp(s)
                denom = jnp.sum(e, axis=-1, keepdims=True)
                v = qkv_ref[b, :, 2 * D + h * DH:2 * D + (h + 1) * DH]
                pv = jnp.dot(e.astype(x.dtype), v,
                             preferred_element_type=jnp.float32)
                ao_ref[b * N_PAD:(b + 1) * N_PAD,
                       h * DH:(h + 1) * DH] = (
                    pv * jax.lax.reciprocal(denom)).astype(x.dtype)
    _epilogue(x, ao_ref, wo_ref, bo_ref, o_ref)


def make_pack_kernel(pk: int, n_slots: int):
    """pk heads packed per GEMM; n_slots packed score slots per phase
    group (n_slots * pk heads per group)."""
    dw = pk * DH          # packed lane width

    def kern(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
             o_ref, qkv_ref, scores_ref, ao_ref):
        x = _prologue(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, qkv_ref)
        coli = jax.lax.broadcasted_iota(jnp.int32, (1, pk * KV), 1)
        colbias = jnp.where(coli % KV < N, 0.0, NEG)
        # which 64-lane sub-block each packed lane belongs to
        lanei = jax.lax.broadcasted_iota(jnp.int32, (KV, dw), 1) // DH
        for b in range(IMGS):
            for g in range(0, H, n_slots * pk):
                for sl in range(n_slots):
                    h = g + sl * pk
                    q2 = qkv_ref[b, :N_PAD, h * DH:(h + pk) * DH] * (
                        x.dtype.type(SCALE))
                    ks = qkv_ref[b, :, D + h * DH:D + (h + pk) * DH]
                    kbd = jnp.concatenate(
                        [jnp.where(lanei == j, ks, 0) for j in range(pk)],
                        axis=0)                       # (pk*KV, dw)
                    scores_ref[sl] = jax.lax.dot_general(
                        q2, kbd, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                lane_sm = jax.lax.broadcasted_iota(
                    jnp.int32, (N_PAD, dw), 1) // DH
                for sl in range(n_slots):
                    h = g + sl * pk
                    s = jnp.clip(scores_ref[sl], -70.0, 80.0) + colbias
                    e = jnp.exp(s)                    # (N_PAD, pk*KV)
                    # per-head denominators from 256-lane-aligned slices,
                    # then a (N_PAD, dw) divisor tile via selects (Mosaic
                    # has no lane-splitting reshape)
                    recs = [jax.lax.reciprocal(
                        jnp.sum(e[:, j * KV:(j + 1) * KV], axis=-1,
                                keepdims=True)) for j in range(pk)]
                    div = recs[-1]
                    for j in range(pk - 2, -1, -1):
                        div = jnp.where(lane_sm == j, recs[j], div)
                    vs = qkv_ref[b, :, 2 * D + h * DH:2 * D + (h + pk) * DH]
                    vbd = jnp.concatenate(
                        [jnp.where(lanei == j, vs, 0) for j in range(pk)],
                        axis=0)                       # (pk*KV, dw)
                    pv = jnp.dot(e.astype(x.dtype), vbd,
                                 preferred_element_type=jnp.float32)
                    ao_ref[b * N_PAD:(b + 1) * N_PAD,
                           h * DH:(h + pk) * DH] = (pv * div).astype(
                        x.dtype)
        _epilogue(x, ao_ref, wo_ref, bo_ref, o_ref)

    return kern


def _const(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


_XTILE = pl.BlockSpec((IMGS, N_PAD, D), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
_WSPECS = [_const((1, D)), _const((1, D)), _const((D, 3 * D)),
           _const((1, 3 * D)), _const((D, D)), _const((1, D))]
_CP = pltpu.CompilerParams(dimension_semantics=("parallel",),
                           vmem_limit_bytes=VMEM48)


def make_stack(kernel, n_slots, pk):
    scratch = [pltpu.VMEM((IMGS, KV, 3 * D), jnp.bfloat16),
               pltpu.VMEM((n_slots, N_PAD, pk * KV), jnp.float32),
               pltpu.VMEM((IMGS * N_PAD, D), jnp.bfloat16)]

    def layer(x, w):
        return pl.pallas_call(
            kernel, grid=(B // IMGS,),
            in_specs=[_XTILE] + _WSPECS,
            out_specs=_XTILE,
            out_shape=jax.ShapeDtypeStruct((B, N_PAD, D), jnp.bfloat16),
            scratch_shapes=scratch, compiler_params=_CP,
        )(x, *w)

    def stack(x, *w):
        for _ in range(L):
            x = layer(x, w)
        return x

    return jax.jit(stack)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N_PAD, D)) * 0.3, jnp.bfloat16)
    w = (jnp.asarray(rng.normal(size=(1, D)) * 0.1 + 1, jnp.float32),
         jnp.asarray(rng.normal(size=(1, D)) * 0.1, jnp.float32),
         jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.03, jnp.bfloat16),
         jnp.asarray(rng.normal(size=(1, 3 * D)) * 0.02, jnp.float32),
         jnp.asarray(rng.normal(size=(D, D)) * 0.03, jnp.bfloat16),
         jnp.asarray(rng.normal(size=(1, D)) * 0.02, jnp.float32))

    fp = make_stack(attn_k_prod, NSC, 1)
    variants = {
        "PAIR2g3": make_stack(make_pack_kernel(2, 3), 3, 2),
        "PAIR2g6": make_stack(make_pack_kernel(2, 6), 6, 2),
        "PAIR2g2": make_stack(make_pack_kernel(2, 2), 2, 2),
    }

    yp = np.asarray(fp(x, *w), np.float32)
    for name, f in variants.items():
        yv = np.asarray(f(x, *w), np.float32)
        print(f"{name} max abs diff vs P (12L bf16): "
              f"{np.abs(yv - yp).max():.2e}")

    for rnd in range(4):
        tp = time_device_loop_single(fp, (x, *w), n=8)
        line = f"round {rnd}: P {tp * 1e3:7.3f}"
        for name, f in variants.items():
            tv = time_device_loop_single(f, (x, *w), n=8)
            line += f"  {name} {tv * 1e3:7.3f} ({(tp - tv) * 1e3:+6.3f})"
        print(line + "  ms/12L")


if __name__ == "__main__":
    main()
