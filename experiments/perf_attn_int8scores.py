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
                a = a + out[:1, :k].astype(a.dtype) * 0
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
