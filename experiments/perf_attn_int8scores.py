"""int8 attention math experiment (VERDICT r2 #5): int8 QK^T and PV inside
the int8 attention mega-kernel.

The production int8 kernel (ops/quant_block.py) keeps the score/PV GEMMs
bf16 ("int8 would add quantize steps for ~0 MXU win" — untested claim the
roadmap calls 'unexplored').  This measures it:

  I : production int8 attention kernel (int8 projections, bf16 scores/PV)
  S : int8 scores variant —
        q,k quantized per ROW (absmax over the full d row -> rank-1 score
        dequant  s_ij = int32 * sq_i * sk_j, two broadcast mults);
        max-subtract softmax (p in (0,1] -> FIXED 1/127 p-quant scale, no
        reduce);
        v quantized per COLUMN per head -> rank-1 PV dequant.
      Both QK^T (K=dh) and PV (K=kv_pad) run on the int8 MXU at 2x rate.

Accuracy: cosine + max-rel-err of S vs the f32 oracle, compared against
I's own error (the quantization noise budget).
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops import quant_block as qb
from vit_fpga_tpu.ops.quant_fused import QMAX, quantize_weight_colwise
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H = 64, 197, 768, 12
DH = D // H
N_PAD, KV, IMGS, NSC = 208, 256, 4, 6
EPS = 1e-6
SCALE = 1.0 / (DH ** 0.5)
NEG = -1e30
VMEM48 = 48 * 1024 * 1024


def main():
    # Phase 1 (this file): decide cheaply.  (a) Is an int8 GEMM at the
    # attention shapes (K=dh=64 QK^T, K=kv PV) actually ~2x bf16 on this
    # chip?  (b) Is row-quant q/k + fixed-scale p-quant accurate enough?
    # Only if both hold does the full in-kernel int8-scores variant get
    # built (quant_block.py).
    # --- microbenchmark: int8 vs bf16 GEMM at attention shapes ---
    rng = np.random.default_rng(0)

    def mk(shape, dt):
        a = rng.normal(size=shape)
        if dt == jnp.int8:
            return jnp.asarray(np.clip(np.rint(a * 20), -127, 127),
                               jnp.int8)
        return jnp.asarray(a, dt)

    def gemm_kernel(a_ref, b_ref, o_ref, *, trans_b, out_t):
        dims = (((1,), (1,)), ((), ())) if trans_b else \
            (((1,), (0,)), ((), ()))
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], dims, preferred_element_type=out_t)

    def bench_gemm(m, k, n, dt, out_t, trans_b, reps=256):
        a = mk((m, k), dt)
        bmat = mk((n, k) if trans_b else (k, n), dt)

        def run(a, bmat):
            out = None
            for _ in range(reps):
                out = pl.pallas_call(
                    functools.partial(gemm_kernel, trans_b=trans_b,
                                      out_t=out_t),
                    out_shape=jax.ShapeDtypeStruct((m, n), out_t),
                )(a, bmat)
                a = a + (out[:1, :1] * 0).astype(a.dtype)
            return out

        f = jax.jit(run)
        t = time_device_loop_single(f, (a, bmat), n=4) / reps
        flops = 2 * m * k * n
        return t, flops / t / 1e12

    for name, dt, out_t in (("bf16", jnp.bfloat16, jnp.float32),
                            ("int8", jnp.int8, jnp.int32)):
        for (m, k, n, tb, what) in ((N_PAD, DH, KV, True, "QK^T"),
                                    (N_PAD, KV, DH, False, "PV"),
                                    (832, D, 3 * D, False, "QKVproj")):
            t, tf = bench_gemm(m, k, n, dt, out_t, tb)
            print(f"{name} {what} ({m}x{k}x{n}): {t * 1e6:7.2f} us "
                  f"({tf:6.1f} T/s)", flush=True)

    # --- accuracy probe: int8 q/k row-quant + fixed-scale p-quant vs f32
    x = rng.normal(size=(N_PAD, D)).astype(np.float32) * 0.5
    w = rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.05
    qkv = x @ w
    q, k, v = np.split(qkv, 3, axis=1)
    q = q.reshape(N_PAD, H, DH) * SCALE
    k = k.reshape(N_PAD, H, DH)
    v = v.reshape(N_PAD, H, DH)

    def rowq(a):
        s = np.maximum(np.abs(a).max(-1, keepdims=True), 1e-12) / 127
        return np.clip(np.rint(a / s), -127, 127), s

    outs, refs = [], []
    for h in range(H):
        s_ref = q[:, h] @ k[:, h].T
        p_ref = np.exp(s_ref - s_ref.max(-1, keepdims=True))
        p_ref /= p_ref.sum(-1, keepdims=True)
        o_ref = p_ref @ v[:, h]
        qq, sq = rowq(q[:, h].reshape(N_PAD, DH))
        kq, sk = rowq(k[:, h].reshape(N_PAD, DH))
        s_i8 = (qq @ kq.T) * sq * sk.T
        e = np.exp(s_i8 - s_i8.max(-1, keepdims=True))
        denom = e.sum(-1, keepdims=True)
        pq = np.rint(e * 127)
        vmax = np.maximum(np.abs(v[:, h]).max(0, keepdims=True), 1e-12)
        sv = vmax / 127
        vq = np.clip(np.rint(v[:, h] / sv), -127, 127)
        o_i8 = (pq @ vq) * sv / (denom * 127)
        outs.append(o_i8)
        refs.append(o_ref)
    o_i8 = np.stack(outs)
    o_ref = np.stack(refs)
    cos = (o_i8 * o_ref).sum() / (np.linalg.norm(o_i8)
                                  * np.linalg.norm(o_ref))
    rel = np.abs(o_i8 - o_ref).max() / np.abs(o_ref).max()
    print(f"int8-scores accuracy: cosine={cos:.6f} max_rel={rel:.4f}",
          flush=True)


if __name__ == "__main__":
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    main()


# ---------------------------------------------------------------------------
# Phase 2: the full int8-scores attention-half kernel (S) vs the
# production int8 kernel (I), 12-layer stacks at ViT-B b64 geometry.
# Design (accuracy-probed above): row-quant q (softmax scale folded
# pre-quant) and k -> rank-1 score dequant; max-subtract softmax -> p in
# (0,1] quantized at FIXED 1/127; v quantized per column per image ->
# rank-1 PV dequant (sv folded into ao before the out-proj quant).
# ---------------------------------------------------------------------------


def _s_kernel(x_ref, ls_ref, lb_ref, wqkv_ref, sqkv_ref, bqkv_ref,
              wo_ref, so_ref, bo_ref, o_ref, qkv_ref, qs_ref, sv_ref,
              scores_ref, ao_ref):
    x = x_ref[:].reshape(IMGS * N_PAD, D)
    xn = qb._ln_f32(x, ls_ref, lb_ref, EPS)
    xq, sx = qb._row_quant(xn)
    for b in range(IMGS):
        r0, r1 = b * N_PAD, (b + 1) * N_PAD
        acc = jax.lax.dot_general(xq[r0:r1], wqkv_ref[:],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        qkv_f = acc.astype(jnp.float32) * (sx[r0:r1] * sqkv_ref[0]) \
            + bqkv_ref[0]
        qf = qkv_f[:, :D] * SCALE
        kf = qkv_f[:, D:2 * D]
        vf = qkv_f[:, 2 * D:]
        qq, sq = qb._row_quant(qf)
        kq, sk = qb._row_quant(kf)
        vmax = jnp.maximum(jnp.max(jnp.abs(vf), axis=0, keepdims=True),
                           1e-12)
        sv = vmax / QMAX
        vq = jnp.clip(jnp.rint(vf / sv), -QMAX, QMAX).astype(jnp.int8)
        qkv_ref[b, :N_PAD, :D] = qq
        qkv_ref[b, :N_PAD, D:2 * D] = kq
        qkv_ref[b, :N_PAD, 2 * D:] = vq
        qkv_ref[b, N_PAD:] = jnp.zeros((KV - N_PAD, 3 * D), jnp.int8)
        qs_ref[b, :N_PAD, 0:1] = sq
        qs_ref[b, :N_PAD, 1:2] = sk
        qs_ref[b, N_PAD:, :] = jnp.zeros((KV - N_PAD, 128), jnp.float32)
        sv_ref[b, 0:1, :] = sv
    colbias = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, KV), 1) < N, 0.0, NEG)
    for b in range(IMGS):
        sq_col = qs_ref[b, :N_PAD, 0:1]
        sk_row = qs_ref[b, :, 1:2].reshape(1, KV)
        for g in range(0, H, NSC):
            heads = range(g, min(g + NSC, H))
            for h in heads:
                qh = qkv_ref[b, :N_PAD, h * DH:(h + 1) * DH]
                kh = qkv_ref[b, :, D + h * DH:D + (h + 1) * DH]
                scores_ref[h - g] = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            for h in heads:
                s = scores_ref[h - g] * sq_col * sk_row + colbias
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                denom = jnp.sum(e, axis=-1, keepdims=True)
                pq = jnp.rint(e * QMAX).astype(jnp.int8)
                vh = qkv_ref[b, :, 2 * D + h * DH:2 * D + (h + 1) * DH]
                acc = jax.lax.dot_general(
                    pq, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                ao_ref[b * N_PAD:(b + 1) * N_PAD,
                       h * DH:(h + 1) * DH] = (
                    acc.astype(jnp.float32)
                    * jax.lax.reciprocal(denom * QMAX))
    # fold per-column v scales, then the production int8 out-projection
    src = ao_ref[:]
    parts = []
    for b in range(IMGS):
        parts.append(src[b * N_PAD:(b + 1) * N_PAD] * sv_ref[b, 0:1, :])
    srcf = jnp.concatenate(parts, axis=0)
    aoq, sa = qb._row_quant(srcf)
    acc_o = jax.lax.dot_general(aoq, wo_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    y = acc_o.astype(jnp.float32) * (sa * so_ref[0]) + bo_ref[0]
    o_ref[:] = (x + y.astype(x.dtype)).reshape(IMGS, N_PAD, D)


def main_s():
    rng = np.random.default_rng(0)
    xr = rng.normal(size=(B, N_PAD, D)) * 0.5
    xr[:, N:, :] = 0.0   # padded-residency tail rows are zero
    x = jnp.asarray(xr, jnp.bfloat16)
    ls = jnp.ones((1, D), jnp.float32)
    lb = jnp.zeros((1, D), jnp.float32)
    wq, wqs = quantize_weight_colwise(
        rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.05)
    wo, wos = quantize_weight_colwise(
        rng.normal(size=(D, D)).astype(np.float32) * 0.05)
    wq, wqs, wo, wos = map(jnp.asarray, (wq, wqs, wo, wos))
    bq = jnp.zeros((1, 3 * D), jnp.float32)
    bo = jnp.zeros((1, D), jnp.float32)

    def _const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    xtile = pl.BlockSpec((IMGS, N_PAD, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def s_call(x):
        return pl.pallas_call(
            _s_kernel, grid=(B // IMGS,),
            in_specs=[xtile, _const((1, D)), _const((1, D)),
                      _const((D, 3 * D)), _const((1, 3 * D)),
                      _const((1, 3 * D)), _const((D, D)),
                      _const((1, D)), _const((1, D))],
            out_specs=xtile,
            out_shape=jax.ShapeDtypeStruct((B, N_PAD, D), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((IMGS, KV, 3 * D), jnp.int8),
                pltpu.VMEM((IMGS, KV, 128), jnp.float32),
                pltpu.VMEM((IMGS, 8, D), jnp.float32),
                pltpu.VMEM((NSC, N_PAD, KV), jnp.float32),
                pltpu.VMEM((IMGS * N_PAD, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=VMEM48),
        )(x, ls, lb, wq, jnp.reshape(wqs, (1, -1)), bq, wo,
          jnp.reshape(wos, (1, -1)), bo)

    @jax.jit
    def stack_I(x):
        for _ in range(12):
            x = qb.attn_block_int8(
                x, ls.reshape(-1), lb.reshape(-1), wq, wqs, bq.reshape(-1),
                wo, wos, bo.reshape(-1), H, eps=EPS, n_valid=N)
        return x

    @jax.jit
    def stack_S(x):
        for _ in range(12):
            x = s_call(x)
        return x

    # parity vs the production int8 kernel (both approximate the same
    # f32 math; difference = score/PV quantization noise)
    a = np.asarray(stack_I(x[:, :N, :].astype(jnp.bfloat16)), np.float32) \
        if False else None
    ref1 = np.asarray(qb.attn_block_int8(
        x[:, :N, :], ls.reshape(-1), lb.reshape(-1), wq, wqs,
        bq.reshape(-1), wo, wos, bo.reshape(-1), H, eps=EPS),
        np.float32)
    got1 = np.asarray(s_call(x)[:, :N, :], np.float32)
    cos = (ref1 * got1).sum() / (np.linalg.norm(ref1)
                                 * np.linalg.norm(got1) + 1e-9)
    print(f"S vs I single-layer cosine: {cos:.6f}", flush=True)

    for rnd in range(4):
        tI = time_device_loop_single(stack_I, (x,), n=8)
        tS = time_device_loop_single(stack_S, (x,), n=8)
        print(f"round {rnd}: I {tI * 1e3:7.3f} ms  S {tS * 1e3:7.3f} ms "
              f" d={1e3 * (tI - tS):+6.3f}", flush=True)


if __name__ == "__main__" and "S" in sys.argv[1:]:
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    main_s()
    sys.exit(0)
