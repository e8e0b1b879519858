"""Softmax pass-diet, continued: colbias -> denominator correction.

With the zero-tailed K/V panel, a pad key column produces score 0 for
every row, exp(0) = 1, and contributes 0 to PV (v rows are zero).  So
the (n_pad, 2kv) colbias ADD pass per pair is redundant: drop it and
subtract the constant pad-column count from each row's denominator
(exact modulo one f32 rounding; the pad columns' exp(clip(0))=1 terms
are integral).  Also measures a clip-free variant (valid only for
calibrated checkpoints — the window check utils/calibrate.py already
performs) and a no-softmax lower bound.

Variants (12-layer pair-packed attention-only stacks, ViT-B b64):
  A : production pair kernel (clip + colbias + exp + sums + div)
  B : no colbias; denom -= (2kv - ... pad count)   [exact]
  C : B + no clip                                   [calibrated only]
  D : e = s (no softmax at all)                     [lower bound]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H = 64, 197, 768, 12
DH = D // H
N_PAD, KV, IMGS = 208, 256, 4
EPS = 1e-6
SCALE = 1.0 / (DH ** 0.5)
NEG = -1e30
VMEM48 = 48 * 1024 * 1024
L = 12
NPADCOL = float(KV - N)     # pad key columns per head


def _ln(xf):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True)
                      - mu * mu, 0.0)
    return (xf - mu) * jax.lax.rsqrt(var + EPS)


def make_kernel(mode: str):
    kv = N_PAD if mode == "E" else KV

    def kern(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
             o_ref, qkv_ref, scores_ref, ao_ref):
        x = x_ref[:].reshape(IMGS * N_PAD, D)
        if mode == "G":      # no LN at all: pure-GEMM bound
            xn = x
        elif mode == "I":    # LN affine folded into wqkv (ls/lb staged)
            xn = _ln(x.astype(jnp.float32)).astype(x.dtype)
        else:
            xn = (_ln(x.astype(jnp.float32)) * ls_ref[0]
                  + lb_ref[0]).astype(x.dtype)
        if mode == "E":
            # kv panel = n_pad rows: zero the 11 pad-token rows in the
            # VALUE (one select pass) so every pad key/value column is
            # exactly zero; scores/PV GEMMs then run at N,K = 2*208
            # instead of 2*256 (-19% score MACs)
            rowi = jax.lax.broadcasted_iota(
                jnp.int32, (N_PAD, 3 * D), 0)
            for b in range(IMGS):
                qkv_b = (jnp.dot(xn[b * N_PAD:(b + 1) * N_PAD],
                                 wqkv_ref[:],
                                 preferred_element_type=jnp.float32)
                         + bqkv_ref[0]).astype(x.dtype)
                qkv_ref[b] = jnp.where(rowi < N, qkv_b, 0)
        else:
            for b in range(IMGS):
                qkv_b = (jnp.dot(xn[b * N_PAD:(b + 1) * N_PAD],
                                 wqkv_ref[:],
                                 preferred_element_type=jnp.float32)
                         + bqkv_ref[0]).astype(x.dtype)
                qkv_ref[b, :N_PAD] = qkv_b
                qkv_ref[b, N_PAD:] = jnp.zeros((KV - N_PAD, 3 * D),
                                               x.dtype)
        lanei = jax.lax.broadcasted_iota(jnp.int32, (kv, 2 * DH), 1) // DH
        lane_sm = jax.lax.broadcasted_iota(
            jnp.int32, (N_PAD, 2 * DH), 1) // DH
        coli = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * kv), 1)
        colbias = jnp.where(coli % kv < N, 0.0, NEG)
        for b in range(IMGS):
            for g in range(0, H, 6):
                for sl in range(3):
                    h = g + 2 * sl
                    q2 = qkv_ref[b, :N_PAD, h * DH:(h + 2) * DH] * (
                        x.dtype.type(SCALE))
                    ks = qkv_ref[b, :, D + h * DH:D + (h + 2) * DH]
                    kbd = jnp.concatenate(
                        [jnp.where(lanei == 0, ks, 0),
                         jnp.where(lanei == 1, ks, 0)], axis=0)
                    scores_ref[sl] = jax.lax.dot_general(
                        q2, kbd, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                for sl in range(3):
                    h = g + 2 * sl
                    s = scores_ref[sl]
                    corr = 0.0
                    if mode in ("A", "E"):
                        e = jnp.exp(jnp.clip(s, -70.0, 80.0) + colbias)
                    elif mode == "B":
                        e = jnp.exp(jnp.clip(s, -70.0, 80.0))
                        corr = NPADCOL
                    elif mode == "C":
                        e = jnp.exp(s)
                        corr = NPADCOL
                    else:                  # D/G/I: no softmax
                        e = s
                        corr = 0.0
                    r0 = jax.lax.reciprocal(
                        jnp.sum(e[:, :kv], axis=-1, keepdims=True)
                        - corr)
                    r1 = jax.lax.reciprocal(
                        jnp.sum(e[:, kv:], axis=-1, keepdims=True)
                        - corr)
                    div = jnp.where(lane_sm == 0, r0, r1)
                    vs = qkv_ref[b, :,
                                 2 * D + h * DH:2 * D + (h + 2) * DH]
                    vbd = jnp.concatenate(
                        [jnp.where(lanei == 0, vs, 0),
                         jnp.where(lanei == 1, vs, 0)], axis=0)
                    pv = jnp.dot(e.astype(x.dtype), vbd,
                                 preferred_element_type=jnp.float32)
                    ao_ref[b * N_PAD:(b + 1) * N_PAD,
                           h * DH:(h + 2) * DH] = (pv * div).astype(
                        x.dtype)
        y = jnp.dot(ao_ref[:], wo_ref[:],
                    preferred_element_type=jnp.float32) + bo_ref[0]
        o_ref[:] = (x + y.astype(x.dtype)).reshape(IMGS, N_PAD, D)

    return kern


def _const(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


_XTILE = pl.BlockSpec((IMGS, N_PAD, D), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)


def make_stack(kernel, kv=KV):
    def layer(x, w):
        return pl.pallas_call(
            kernel, grid=(B // IMGS,),
            in_specs=[_XTILE, _const((1, D)), _const((1, D)),
                      _const((D, 3 * D)), _const((1, 3 * D)),
                      _const((D, D)), _const((1, D))],
            out_specs=_XTILE,
            out_shape=jax.ShapeDtypeStruct((B, N_PAD, D), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((IMGS, kv, 3 * D), jnp.bfloat16),
                pltpu.VMEM((3, N_PAD, 2 * kv), jnp.float32),
                pltpu.VMEM((IMGS * N_PAD, D), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=VMEM48),
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

    fns = {m: make_stack(make_kernel(m),
                         kv=N_PAD if m == "E" else KV)
           for m in "ADGI"}

    for rnd in range(4):
        line = f"round {rnd}:"
        ts = {}
        for m, f in fns.items():
            ts[m] = time_device_loop_single(f, (x, *w), n=8)
            line += f"  {m} {ts[m] * 1e3:6.3f}"
        line += (f"   D-A {(ts['A'] - ts['D']) * 1e3:+5.3f}"
                 f"  G-D {(ts['D'] - ts['G']) * 1e3:+5.3f}"
                 f"  I-D {(ts['D'] - ts['I']) * 1e3:+5.3f}")
        print(line)


if __name__ == "__main__":
    main()
