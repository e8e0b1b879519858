"""LN-epilogue experiment (VERDICT r2 weak#1 avenue (a)).

Hypothesis: each half-block kernel's LayerNorm (2 f32 reduction passes over
the tile, strictly serial with the MXU inside the consumer's preamble) can
move to the PRODUCER kernel's tail, where its VPU work is independent of
the producer's remaining per-image out-projection GEMMs — Mosaic can then
dual-issue them.  The producer emits per-row (mu, rstd) stats alongside its
output; the consumer normalizes elementwise (no reductions) — bit-exact
same math, +0.5 MB/layer HBM for the stats tile.

Variants (12-layer ViT-B/16 b64 bf16 stacks, production geometry:
4-img cells, 6 score slots, 48MB plan, block_t 512):
  P : production pair (attn_block_pallas + fused_mlp_pallas)
  A : attn emits LN2 stats at tail; MLP consumes stats (no reductions)
  B : MLP emits LN1 stats at tail; attn consumes stats
  AB: both
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops.attn_block import attn_block_pallas
from vit_fpga_tpu.ops.fused_mlp import fused_mlp_pallas
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H, M = 64, 197, 768, 12, 3072
DH = D // H
N_PAD, KV, IMGS, NSC = 208, 256, 4, 6
EPS = 1e-6
SCALE = 1.0 / (DH ** 0.5)
NEG = -1e30
VMEM48 = 48 * 1024 * 1024
SLANE = 128   # stats tile lane width (col0=mu, col1=rstd)


def _ln_rows(xf):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True)
                      - mu * mu, 0.0)
    return mu, jax.lax.rsqrt(var + EPS)


def _attn_core(x, xn, qkv_ref, scores_ref, ao_ref, wqkv_ref, bqkv_ref,
               wo_ref, bo_ref):
    """Shared attention math: xn (IMGS*N_PAD, D) normalized input."""
    for b in range(IMGS):
        qkv_b = (jnp.dot(xn[b * N_PAD:(b + 1) * N_PAD], wqkv_ref[:],
                         preferred_element_type=jnp.float32)
                 + bqkv_ref[0]).astype(x.dtype)
        qkv_ref[b, :N_PAD] = qkv_b
        qkv_ref[b, N_PAD:] = jnp.zeros((KV - N_PAD, 3 * D), x.dtype)
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
    y = jnp.dot(ao_ref[:], wo_ref[:],
                preferred_element_type=jnp.float32) + bo_ref[0]
    return x + y.astype(x.dtype)


# ---- variant kernels ----

def attn_k_emit(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                o_ref, st_ref, qkv_ref, scores_ref, ao_ref):
    """attn computes own LN (reduction), emits LN2 stats of its output."""
    x = x_ref[:].reshape(IMGS * N_PAD, D)
    xf = x.astype(jnp.float32)
    mu, rstd = _ln_rows(xf)
    xn = ((xf - mu) * rstd * ls_ref[0] + lb_ref[0]).astype(x.dtype)
    out = _attn_core(x, xn, qkv_ref, scores_ref, ao_ref, wqkv_ref,
                     bqkv_ref, wo_ref, bo_ref)
    o_ref[:] = out.reshape(IMGS, N_PAD, D)
    mu2, rstd2 = _ln_rows(out.astype(jnp.float32))
    st_ref[:, :, 0:1] = mu2.reshape(IMGS, N_PAD, 1)
    st_ref[:, :, 1:2] = rstd2.reshape(IMGS, N_PAD, 1)


def attn_k_consume(x_ref, st_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref,
                   wo_ref, bo_ref, o_ref, qkv_ref, scores_ref, ao_ref):
    """attn consumes LN1 stats (elementwise normalize, no reductions)."""
    x = x_ref[:].reshape(IMGS * N_PAD, D)
    xf = x.astype(jnp.float32)
    mu = st_ref[:, :, 0:1].reshape(IMGS * N_PAD, 1)
    rstd = st_ref[:, :, 1:2].reshape(IMGS * N_PAD, 1)
    xn = ((xf - mu) * rstd * ls_ref[0] + lb_ref[0]).astype(x.dtype)
    out = _attn_core(x, xn, qkv_ref, scores_ref, ao_ref, wqkv_ref,
                     bqkv_ref, wo_ref, bo_ref)
    o_ref[:] = out.reshape(IMGS, N_PAD, D)


def attn_k_consume_emit(x_ref, st_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref,
                        wo_ref, bo_ref, o_ref, sto_ref, qkv_ref,
                        scores_ref, ao_ref):
    x = x_ref[:].reshape(IMGS * N_PAD, D)
    xf = x.astype(jnp.float32)
    mu = st_ref[:, :, 0:1].reshape(IMGS * N_PAD, 1)
    rstd = st_ref[:, :, 1:2].reshape(IMGS * N_PAD, 1)
    xn = ((xf - mu) * rstd * ls_ref[0] + lb_ref[0]).astype(x.dtype)
    out = _attn_core(x, xn, qkv_ref, scores_ref, ao_ref, wqkv_ref,
                     bqkv_ref, wo_ref, bo_ref)
    o_ref[:] = out.reshape(IMGS, N_PAD, D)
    mu2, rstd2 = _ln_rows(out.astype(jnp.float32))
    sto_ref[:, :, 0:1] = mu2.reshape(IMGS, N_PAD, 1)
    sto_ref[:, :, 1:2] = rstd2.reshape(IMGS, N_PAD, 1)


def mlp_k_consume(x_ref, st_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref,
                  b2_ref, o_ref):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mu = st_ref[:, 0:1]
    rstd = st_ref[:, 1:2]
    xn = ((xf - mu) * rstd * ls_ref[0] + lb_ref[0]).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32
                ) + b1_ref[0]
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32
                ) + b2_ref[0]
    o_ref[:] = x + y.astype(x.dtype)


def mlp_k_emit(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               o_ref, st_ref):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mu, rstd = _ln_rows(xf)
    xn = ((xf - mu) * rstd * ls_ref[0] + lb_ref[0]).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32
                ) + b1_ref[0]
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32
                ) + b2_ref[0]
    out = x + y.astype(x.dtype)
    o_ref[:] = out
    mu2, rstd2 = _ln_rows(out.astype(jnp.float32))
    st_ref[:, 0:1] = mu2
    st_ref[:, 1:2] = rstd2


def mlp_k_consume_emit(x_ref, st_ref, ls_ref, lb_ref, w1_ref, b1_ref,
                       w2_ref, b2_ref, o_ref, sto_ref):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mu = st_ref[:, 0:1]
    rstd = st_ref[:, 1:2]
    xn = ((xf - mu) * rstd * ls_ref[0] + lb_ref[0]).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32
                ) + b1_ref[0]
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32
                ) + b2_ref[0]
    out = x + y.astype(x.dtype)
    o_ref[:] = out
    mu2, rstd2 = _ln_rows(out.astype(jnp.float32))
    sto_ref[:, 0:1] = mu2
    sto_ref[:, 1:2] = rstd2


# ---- pallas_call wrappers ----

def _const(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


_XTILE = pl.BlockSpec((IMGS, N_PAD, D), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
_STILE = pl.BlockSpec((IMGS, N_PAD, SLANE), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
_ASCRATCH = [pltpu.VMEM((IMGS, KV, 3 * D), jnp.bfloat16),
             pltpu.VMEM((NSC, N_PAD, KV), jnp.float32),
             pltpu.VMEM((IMGS * N_PAD, D), jnp.bfloat16)]
_AWSPECS = [_const((1, D)), _const((1, D)), _const((D, 3 * D)),
            _const((1, 3 * D)), _const((D, D)), _const((1, D))]
_CP = pltpu.CompilerParams(dimension_semantics=("parallel",),
                           vmem_limit_bytes=VMEM48)

BT = 512
T_PAD = ((B * N_PAD + BT - 1) // BT) * BT
_MTILE = pl.BlockSpec((BT, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
_MSTILE = pl.BlockSpec((BT, SLANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
_MWSPECS = [_const((1, D)), _const((1, D)), _const((D, M)),
            _const((1, M)), _const((M, D)), _const((1, D))]
_MCP = pltpu.CompilerParams(dimension_semantics=("parallel",))


def attn_emit(x, w):
    return pl.pallas_call(
        attn_k_emit, grid=(B // IMGS,),
        in_specs=[_XTILE] + _AWSPECS,
        out_specs=[_XTILE, _STILE],
        out_shape=[jax.ShapeDtypeStruct((B, N_PAD, D), jnp.bfloat16),
                   jax.ShapeDtypeStruct((B, N_PAD, SLANE), jnp.float32)],
        scratch_shapes=_ASCRATCH, compiler_params=_CP,
    )(x, *w)


def attn_consume(x, st, w):
    return pl.pallas_call(
        attn_k_consume, grid=(B // IMGS,),
        in_specs=[_XTILE, _STILE] + _AWSPECS,
        out_specs=_XTILE,
        out_shape=jax.ShapeDtypeStruct((B, N_PAD, D), jnp.bfloat16),
        scratch_shapes=_ASCRATCH, compiler_params=_CP,
    )(x, st, *w)


def attn_consume_emit(x, st, w):
    return pl.pallas_call(
        attn_k_consume_emit, grid=(B // IMGS,),
        in_specs=[_XTILE, _STILE] + _AWSPECS,
        out_specs=[_XTILE, _STILE],
        out_shape=[jax.ShapeDtypeStruct((B, N_PAD, D), jnp.bfloat16),
                   jax.ShapeDtypeStruct((B, N_PAD, SLANE), jnp.float32)],
        scratch_shapes=_ASCRATCH, compiler_params=_CP,
    )(x, st, *w)


def mlp_consume(x, st, w):
    return pl.pallas_call(
        mlp_k_consume, grid=(T_PAD // BT,),
        in_specs=[_MTILE, _MSTILE] + _MWSPECS,
        out_specs=_MTILE,
        out_shape=jax.ShapeDtypeStruct((T_PAD, D), jnp.bfloat16),
        compiler_params=_MCP,
    )(x, st, *w)


def mlp_emit(x, w):
    return pl.pallas_call(
        mlp_k_emit, grid=(T_PAD // BT,),
        in_specs=[_MTILE] + _MWSPECS,
        out_specs=[_MTILE, _MSTILE],
        out_shape=[jax.ShapeDtypeStruct((T_PAD, D), jnp.bfloat16),
                   jax.ShapeDtypeStruct((T_PAD, SLANE), jnp.float32)],
        compiler_params=_MCP,
    )(x, *w)


def mlp_consume_emit(x, st, w):
    return pl.pallas_call(
        mlp_k_consume_emit, grid=(T_PAD // BT,),
        in_specs=[_MTILE, _MSTILE] + _MWSPECS,
        out_specs=[_MTILE, _MSTILE],
        out_shape=[jax.ShapeDtypeStruct((T_PAD, D), jnp.bfloat16),
                   jax.ShapeDtypeStruct((T_PAD, SLANE), jnp.float32)],
        compiler_params=_MCP,
    )(x, st, *w)


def main():
    # weights passed as ARGS (shared across the 12 layers, like every
    # perf_* experiment here — closure constants bloat the HLO)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N_PAD, D)) * 0.5, jnp.bfloat16)
    aw = (jnp.ones((1, D), jnp.float32),
          jnp.zeros((1, D), jnp.float32),
          jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.02, jnp.bfloat16),
          jnp.zeros((1, 3 * D), jnp.float32),
          jnp.asarray(rng.normal(size=(D, D)) * 0.02, jnp.bfloat16),
          jnp.zeros((1, D), jnp.float32))
    mw = (jnp.ones((1, D), jnp.float32),
          jnp.zeros((1, D), jnp.float32),
          jnp.asarray(rng.normal(size=(D, M)) * 0.02, jnp.bfloat16),
          jnp.zeros((1, M), jnp.float32),
          jnp.asarray(rng.normal(size=(M, D)) * 0.02, jnp.bfloat16),
          jnp.zeros((1, D), jnp.float32))
    args = aw + mw + (x,)

    def ln_stats_xla(x):
        xf = x.astype(jnp.float32).reshape(-1, D)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(xf * xf, -1, keepdims=True)
                          - mu * mu, 0.0)
        st = jnp.zeros((xf.shape[0], SLANE), jnp.float32)
        st = st.at[:, 0:1].set(mu)
        st = st.at[:, 1:2].set(jax.lax.rsqrt(var + EPS))
        return st

    @jax.jit
    def stack_P(*a):
        aw, mw, x = a[:6], a[6:12], a[12]
        for _ in range(12):
            x = attn_block_pallas(
                x, aw[0].reshape(-1), aw[1].reshape(-1), aw[2],
                aw[3].reshape(-1), aw[4], aw[5].reshape(-1), H,
                eps=EPS, n_valid=N)
            t = fused_mlp_pallas(
                x.reshape(B * N_PAD, D), mw[0].reshape(-1),
                mw[1].reshape(-1), mw[2], mw[3].reshape(-1),
                mw[4], mw[5].reshape(-1), eps=EPS, act="gelu_tanh")
            x = t.reshape(B, N_PAD, D)
        return x

    @jax.jit
    def stack_A(*a):
        """attn emits LN2 stats; mlp consumes."""
        aw, mw, x = a[:6], a[6:12], a[12]
        for _ in range(12):
            x, st = attn_emit(x, aw)
            t = mlp_consume(x.reshape(B * N_PAD, D),
                            st.reshape(B * N_PAD, SLANE), mw)
            x = t.reshape(B, N_PAD, D)
        return x

    @jax.jit
    def stack_AB(*a):
        """both directions: every kernel consumes stats and emits next."""
        aw, mw, x = a[:6], a[6:12], a[12]
        st = ln_stats_xla(x).reshape(B, N_PAD, SLANE)
        for _ in range(12):
            x, st2 = attn_consume_emit(x, st, aw)
            t, st3 = mlp_consume_emit(x.reshape(B * N_PAD, D),
                                      st2.reshape(B * N_PAD, SLANE), mw)
            x = t.reshape(B, N_PAD, D)
            st = st3.reshape(B, N_PAD, SLANE)
        return x

    @jax.jit
    def stack_B(*a):
        """mlp emits LN1 stats; attn consumes (first stats from XLA)."""
        aw, mw, x = a[:6], a[6:12], a[12]
        st = ln_stats_xla(x).reshape(B, N_PAD, SLANE)
        for _ in range(12):
            x = attn_consume(x, st, aw)
            t, st2 = mlp_emit(x.reshape(B * N_PAD, D), mw)
            x = t.reshape(B, N_PAD, D)
            st = st2.reshape(B, N_PAD, SLANE)
        return x

    # correctness: A/B/AB vs P
    ref = np.asarray(stack_P(*args), np.float32)
    for name, fn in (("A", stack_A), ("B", stack_B), ("AB", stack_AB)):
        got = np.asarray(fn(*args), np.float32)
        err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-6)
        print(f"variant {name}: max rel err vs P = {err:.3e}", flush=True)

    for rnd in range(4):
        for name, fn in (("P ", stack_P), ("A ", stack_A),
                         ("B ", stack_B), ("AB", stack_AB)):
            t = time_device_loop_single(fn, args, n=8)
            print(f"round {rnd} {name}: {t * 1e3:8.3f} ms / 12 layers",
                  flush=True)




# ---------------------------------------------------------------------------
# Variant C (appended after A/B/AB measured): PAIR kernel — attn + LN2
# (inline, no stats round-trip) + MLP in ONE kernel per layer; consumes
# LN1 stats from the previous layer and emits the next layer's.  The
# earlier whole-block-fusion experiment predates the softmax diet and the
# stats-epilogue idea; this is the untried combination.
# ---------------------------------------------------------------------------

def pair_k(x_ref, st_ref, ls1, lb1, wqkv, bqkv, wo, bo, ls2, lb2, w1, b1,
           w2, b2, o_ref, sto_ref, qkv_ref, scores_ref, ao_ref):
    x = x_ref[:].reshape(IMGS * N_PAD, D)
    xf = x.astype(jnp.float32)
    mu = st_ref[:, :, 0:1].reshape(IMGS * N_PAD, 1)
    rstd = st_ref[:, :, 1:2].reshape(IMGS * N_PAD, 1)
    xn = ((xf - mu) * rstd * ls1[0] + lb1[0]).astype(x.dtype)
    xa = _attn_core(x, xn, qkv_ref, scores_ref, ao_ref, wqkv, bqkv,
                    wo, bo)
    # LN2 inline (reductions can overlap the tail out-proj MXU work)
    xf2 = xa.astype(jnp.float32)
    mu2, rstd2 = _ln_rows(xf2)
    xn2 = ((xf2 - mu2) * rstd2 * ls2[0] + lb2[0]).astype(x.dtype)
    h = jnp.dot(xn2, w1[:], preferred_element_type=jnp.float32) + b1[0]
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    y = jnp.dot(h, w2[:], preferred_element_type=jnp.float32) + b2[0]
    out = xa + y.astype(x.dtype)
    o_ref[:] = out.reshape(IMGS, N_PAD, D)
    mu3, rstd3 = _ln_rows(out.astype(jnp.float32))
    sto_ref[:, :, 0:1] = mu3.reshape(IMGS, N_PAD, 1)
    sto_ref[:, :, 1:2] = rstd3.reshape(IMGS, N_PAD, 1)


def pair_call(x, st, aw, mw):
    return pl.pallas_call(
        pair_k, grid=(B // IMGS,),
        in_specs=[_XTILE, _STILE] + _AWSPECS + _MWSPECS,
        out_specs=[_XTILE, _STILE],
        out_shape=[jax.ShapeDtypeStruct((B, N_PAD, D), jnp.bfloat16),
                   jax.ShapeDtypeStruct((B, N_PAD, SLANE), jnp.float32)],
        scratch_shapes=_ASCRATCH,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM48),
    )(x, st, *aw, *mw)


def main_c():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N_PAD, D)) * 0.5, jnp.bfloat16)
    aw = (jnp.ones((1, D), jnp.float32),
          jnp.zeros((1, D), jnp.float32),
          jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.02, jnp.bfloat16),
          jnp.zeros((1, 3 * D), jnp.float32),
          jnp.asarray(rng.normal(size=(D, D)) * 0.02, jnp.bfloat16),
          jnp.zeros((1, D), jnp.float32))
    mw = (jnp.ones((1, D), jnp.float32),
          jnp.zeros((1, D), jnp.float32),
          jnp.asarray(rng.normal(size=(D, M)) * 0.02, jnp.bfloat16),
          jnp.zeros((1, M), jnp.float32),
          jnp.asarray(rng.normal(size=(M, D)) * 0.02, jnp.bfloat16),
          jnp.zeros((1, D), jnp.float32))
    args = aw + mw + (x,)

    def ln_stats_xla(x):
        xf = x.astype(jnp.float32).reshape(-1, D)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(xf * xf, -1, keepdims=True)
                          - mu * mu, 0.0)
        st = jnp.zeros((xf.shape[0], SLANE), jnp.float32)
        st = st.at[:, 0:1].set(mu)
        st = st.at[:, 1:2].set(jax.lax.rsqrt(var + EPS))
        return st

    @jax.jit
    def stack_P(*a):
        aw, mw, x = a[:6], a[6:12], a[12]
        for _ in range(12):
            x = attn_block_pallas(
                x, aw[0].reshape(-1), aw[1].reshape(-1), aw[2],
                aw[3].reshape(-1), aw[4], aw[5].reshape(-1), H,
                eps=EPS, n_valid=N)
            t = fused_mlp_pallas(
                x.reshape(B * N_PAD, D), mw[0].reshape(-1),
                mw[1].reshape(-1), mw[2], mw[3].reshape(-1),
                mw[4], mw[5].reshape(-1), eps=EPS, act="gelu_tanh")
            x = t.reshape(B, N_PAD, D)
        return x

    @jax.jit
    def stack_C(*a):
        aw, mw, x = a[:6], a[6:12], a[12]
        st = ln_stats_xla(x).reshape(B, N_PAD, SLANE)
        for _ in range(12):
            x, st = pair_call(x, st, aw, mw)
        return x

    ref = np.asarray(stack_P(*args), np.float32)
    got = np.asarray(stack_C(*args), np.float32)
    err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-6)
    print(f"variant C: max rel err vs P = {err:.3e}", flush=True)
    for rnd in range(4):
        for name, fn in (("P ", stack_P), ("C ", stack_C)):
            t = time_device_loop_single(fn, args, n=8)
            print(f"round {rnd} {name}: {t * 1e3:8.3f} ms / 12 layers",
                  flush=True)




if __name__ == "__main__":
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    if len(sys.argv) > 1 and sys.argv[1] == "C":
        main_c()
    else:
        main()
