"""Whole-attention-half mega-kernel: LN -> QKV GEMM -> MHA -> out-proj ->
residual, fused over a small group of images per grid cell.

Why: on ViT-B/16 batch 64 the unfused attention half costs ~9.8 ms/step
(qkv GEMM 2.4, attention 5.5, out-proj 0.9, LN 1.1) while its MXU-bound
floor is ~5 ms.  Fusing the whole half into one Pallas kernel keeps the
qkv tensor, score matrices, and attention output entirely in VMEM, and
gives Mosaic one big instruction stream to overlap MXU (projections,
QK^T, PV) with VPU (LayerNorm, softmax) work across heads.

v2 design decisions (round 2; every line A/B-measured on v5e —
experiments/perf_attn_v2.py, perf_attn_bigvmem.py, perf_attn_tune2.py):

  * Token ROWS (the GEMM M dim) are padded only to the sublane multiple
    from ops/common.pad_sublane (the source of truth; round 3 tightened
    bf16 to 8-row masked half-tiles) instead of the 128 lane width: seq
    197 runs on 200 rows, not 256 — ~22% of projection FLOPs saved.
    Only the scores' LANE dim needs 128 alignment, so the kernel keeps a
    separate 128-padded K/V panel (``qkv_s`` scratch, tail zeroed) that
    the score and PV contractions read; the zeroed tail + the column
    mask keep the math exact.  0.705 -> 0.490 ms per layer at ViT-B/16
    b64 when first landed at pad-16, bit-exact; pad-8 added another 3%
    end-to-end (experiments/perf_pad200.py).
  * Softmax stays PHASE-SPLIT (all QK^T of a head group, then all
    softmax+PV): an interleaved "rolling" schedule measured 3x slower —
    Mosaic schedules the straight-line phases better than a hand pipeline.
  * MULTI-IMAGE cells: processing 4 images per grid cell (projections on
    4*n_pad rows, per-image attention reusing 6 score slots) measured
    0.525 vs 0.596 ms/layer — fewer cells amortize per-cell overhead and
    bigger GEMM M dims feed the MXU better.  Needs the VMEM limit raised
    (see below); used only in the fast tier.
  * The compiler's 16MB scoped-VMEM limit is a DEFAULT, not the
    hardware: ``vmem_limit_bytes`` up to ~100MB compiles and runs on
    v5e.  Raising it when not needed regresses (~6%), so each tier
    requests only what it needs.
  * q-slot reuse (each head's attention output overwriting its dead q
    slot in the panel) causes write-after-read aliasing that serializes
    Mosaic's schedule (0.49 -> 1.20 ms at ViT-B) — it is strictly the
    VMEM-tight fallback, where it still wins big (CLIP-L: 1.03 ms vs
    2.59 unfused XLA).

Weights ride constant-index BlockSpecs, so Mosaic's revolving buffers
fetch them once for the whole batch sweep.

Differentiable via custom VJP (Pallas forward, XLA-recompute backward).
Reference parity hook: this kernel is the ViT-scope "network_v1" device
program the reference dispatched but never shipped (SURVEY.md §2.2 item 4;
/root/reference/src/netFPGA.cpp:250,388).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import LANE, round_up

_NEG_INF = -1e30
# max-free softmax clip window (see _attn_block_kernel): exp must not
# overflow f32 (88) and must keep >= one valid key above underflow
_EXP_LO, _EXP_HI = -70.0, 80.0


def _sublane(dtype) -> int:
    from .common import pad_sublane
    return pad_sublane(dtype)


_BIG_VMEM_BYTES = 100 * 1024 * 1024    # v5e has 128MB physical VMEM
_MULTI_VMEM_BYTES = 48 * 1024 * 1024   # multi-image fast tier (measured)


class AttnPlan(NamedTuple):
    imgs: int          # images per grid cell
    n_sc: int          # score slots (head-group size); 0 = does not fit
    reuse_q: bool      # attention out overwrites dead q slots (tight tier)
    vmem_limit: int    # vmem_limit_bytes override (0 = compiler default)


def attn_plan(n_heads: int, d: int, n_pad: int, kv_pad: int,
              itemsize: int, batch: int = 1,
              budget: int = 13 * 1024 * 1024,
              weight_itemsize: int | None = None,
              d_attn: int | None = None) -> AttnPlan:
    """Choose the VMEM tier (see module docstring) for this geometry.

    Tiers, in preference order:
      multi — 4 (or 2) images/cell, 6 score slots, separate ao scratch,
              48MB vmem plan.  ViT-B: 0.525 ms/layer.
      fast  — 1 image/cell, max slots + ao scratch under the default
              16MB plan.  ViT-B: 0.534-0.596 ms.
      tight — 1 image/cell, 2 slots, q-slot reuse (~14MB).  CLIP-L:
              1.03 ms.
      big   — 1 image/cell, full slots + ao, vmem raised to 100MB.
              ViT-L@384: 0.829 ms.

    ``d_attn`` is the attention width (n_heads*dh of the LOCAL head
    group); it differs from the model width ``d`` only in the
    tensor-parallel partial kernel (parallel/shard_model.py).
    """
    da = d_attn if d_attn is not None else d
    # weights may be narrower than activations (int8 kernels: int8
    # weights, bf16 activations)
    weights = (3 * d * da + da * d) * (weight_itemsize or itemsize)

    def fixed(imgs):
        panel = imgs * kv_pad * 3 * da * itemsize
        tiles = 4 * imgs * n_pad * d * itemsize   # in+out, double-buffered
        ao = imgs * n_pad * da * itemsize
        return weights + panel + tiles + ao

    slot = n_pad * kv_pad * 4
    # multi tier: only a clear win for small-d geometries that already
    # fit the fast tier comfortably (measured at ViT-B; bigger models
    # fall through to their measured-best tiers)
    if fixed(1) + n_heads * slot <= budget:
        for imgs in (4, 2):
            if batch % imgs == 0 and (fixed(imgs) + 6 * slot
                                      <= _MULTI_VMEM_BYTES * 0.8):
                return AttnPlan(imgs, min(n_heads, 6), False,
                                _MULTI_VMEM_BYTES)
    if fixed(1) + slot <= budget:       # fast tier
        n_sc = min(n_heads, (budget - fixed(1)) // slot)
        # Mosaic's true stack demand can exceed this tile model near the
        # 16 MB default plan, and it varies with the GRID COUNT: ViT-H
        # int8 (est. 12.7 MiB) compiles at grid=32 but demands 18.77 MB
        # at grid=4 (extra in-flight windows at short grids).  The
        # vmem_limit is enforcement-only — raise it whenever the
        # estimate is within ~2 MiB of the default so small-batch
        # dispatch cannot compile-OOM on a kernel the model accepts.
        vmem = (_MULTI_VMEM_BYTES
                if fixed(1) + n_sc * slot > 11 * 1024 * 1024 else 0)
        return AttnPlan(1, n_sc, False, vmem)
    ao1 = n_pad * da * itemsize
    tight = budget + 1024 * 1024
    if fixed(1) - ao1 + slot <= tight:  # tight-eligible geometry
        # upgrade: 2-image cells + ao scratch under the raised plan beat
        # q-slot reuse when they fit (CLIP-L same-run A/B: 1.10 vs 1.22)
        if (batch % 2 == 0
                and fixed(2) + 4 * slot <= _MULTI_VMEM_BYTES * 0.8):
            return AttnPlan(2, min(n_heads, 4), False, _MULTI_VMEM_BYTES)
        return AttnPlan(1, min(n_heads, 2,
                               (tight - (fixed(1) - ao1)) // slot), True, 0)
    big = int(_BIG_VMEM_BYTES * 0.8)    # leave pipelining headroom
    if fixed(1) + slot <= big:          # big tier
        return AttnPlan(1, min(n_heads, (big - fixed(1)) // slot), False,
                        _BIG_VMEM_BYTES)
    return AttnPlan(1, 0, True, 0)


def pair_pack_ok(dh: int, n_heads: int, n_sc: int) -> bool:
    """Head-PAIR-packed score GEMMs apply when every phase group has an
    even head count and dh == 64 (the half-lane case they exist for)."""
    return (dh == 64 and n_sc >= 2 and n_sc % 2 == 0
            and (n_heads % n_sc) % 2 == 0)


def _mha_loop(x, qkv_ref, scores_ref, ao_ref, *, imgs: int, n_pad: int,
              kv_pad: int, n_heads: int, dh: int, n_sc: int, scale: float,
              n_valid: int, safe_softmax: bool, pairs: bool,
              out_scale=None):
    """Per-image multi-head attention over the zero-tailed K/V panel.

    ``out_scale`` (traced f32 scalar or None) multiplies the attention
    output — the static-scale int8 kernels (ops/quant_block.py) fold
    their activation quantization scale 1/a_ao here, into the post-PV
    reciprocal that already runs on the tiny (rows, 1) denominator
    vector, so pre-scaling for quantization costs zero extra VPU passes.

    ``ao_ref is None`` selects the q-slot-reuse tier (pv overwrites the
    dead q lanes).  ``pairs`` packs head PAIRS per score GEMM: at dh=64
    the per-head QK^T (K=64) and PV (N=64) GEMMs use half the MXU lanes,
    so computing two heads block-diagonally costs the same MXU cycles
    while halving GEMM count — and every q/k/v slice becomes 128-lane
    aligned, deleting the half-tile relayout glue (+0.3 ms / 12 ViT-B
    layers, bit-exact; experiments/perf_attn_pair.py).  The block-diag
    panels need no transposes: adjacent heads already live in their own
    64-lane halves, so kbd/vbd are two lane-masked selects stacked on
    the sublane axis.
    """
    d = n_heads * dh
    q_scaled = (x.dtype != jnp.bfloat16
                or math.frexp(scale)[0] == 0.5)
    if not pairs:
        if n_valid < kv_pad:
            coli = jax.lax.broadcasted_iota(jnp.int32, (1, kv_pad), 1)
            colbias = jnp.where(coli < n_valid, 0.0, _NEG_INF)
        else:
            colbias = None
        for b in range(imgs):
            for g in range(0, n_heads, n_sc):
                heads = range(g, min(g + n_sc, n_heads))
                for h in heads:
                    q = qkv_ref[b, :n_pad, h * dh:(h + 1) * dh]
                    if q_scaled:
                        q = q * x.dtype.type(scale)
                    k = qkv_ref[b, :, d + h * dh:d + (h + 1) * dh]
                    scores_ref[h - g] = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                for h in heads:
                    s = scores_ref[h - g]
                    if not q_scaled:
                        s = s * scale
                    if safe_softmax:
                        if colbias is not None:
                            s = s + colbias
                        s = s - jnp.max(s, axis=-1, keepdims=True)
                        e = jnp.exp(s)
                    else:
                        s = jnp.clip(s, _EXP_LO, _EXP_HI)
                        if colbias is not None:
                            s = s + colbias
                        e = jnp.exp(s)
                    denom = jnp.sum(e, axis=-1, keepdims=True)
                    v = qkv_ref[b, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
                    pv = jnp.dot(
                        e.astype(x.dtype), v,
                        preferred_element_type=jnp.float32)
                    r = jax.lax.reciprocal(denom)
                    if out_scale is not None:
                        r = r * out_scale
                    pv = (pv * r).astype(x.dtype)
                    if ao_ref is not None:
                        ao_ref[b * n_pad:(b + 1) * n_pad,
                               h * dh:(h + 1) * dh] = pv
                    else:
                        qkv_ref[b, :n_pad, h * dh:(h + 1) * dh] = pv
        return

    dw = 2 * dh
    if n_valid < kv_pad:
        coli = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * kv_pad), 1)
        colbias = jnp.where(coli % kv_pad < n_valid, 0.0, _NEG_INF)
    else:
        colbias = None
    # which head of the pair each panel lane / output lane belongs to
    lanei = jax.lax.broadcasted_iota(jnp.int32, (kv_pad, dw), 1) // dh
    lane_sm = jax.lax.broadcasted_iota(jnp.int32, (n_pad, dw), 1) // dh
    if safe_softmax:
        lane_kv = jax.lax.broadcasted_iota(
            jnp.int32, (n_pad, 2 * kv_pad), 1) < kv_pad
    for b in range(imgs):
        for g in range(0, n_heads, n_sc):
            npair = (min(g + n_sc, n_heads) - g) // 2
            for sl in range(npair):
                h = g + 2 * sl
                q2 = qkv_ref[b, :n_pad, h * dh:(h + 2) * dh]
                if q_scaled:
                    q2 = q2 * x.dtype.type(scale)
                ks = qkv_ref[b, :, d + h * dh:d + (h + 2) * dh]
                kbd = jnp.concatenate(
                    [jnp.where(lanei == 0, ks, 0),
                     jnp.where(lanei == 1, ks, 0)], axis=0)
                scores_ref[sl] = jax.lax.dot_general(
                    q2, kbd, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            for sl in range(npair):
                h = g + 2 * sl
                s = scores_ref[sl]            # (n_pad, 2*kv_pad)
                if not q_scaled:
                    s = s * scale
                if safe_softmax:
                    if colbias is not None:
                        s = s + colbias
                    m0 = jnp.max(s[:, :kv_pad], axis=-1, keepdims=True)
                    m1 = jnp.max(s[:, kv_pad:], axis=-1, keepdims=True)
                    e = jnp.exp(s - jnp.where(lane_kv, m0, m1))
                else:
                    s = jnp.clip(s, _EXP_LO, _EXP_HI)
                    if colbias is not None:
                        s = s + colbias
                    e = jnp.exp(s)
                # per-head denominators from lane-aligned halves; the
                # (n_pad, dw) divisor tile is one select (Mosaic has no
                # lane-splitting reshape)
                r0 = jax.lax.reciprocal(
                    jnp.sum(e[:, :kv_pad], axis=-1, keepdims=True))
                r1 = jax.lax.reciprocal(
                    jnp.sum(e[:, kv_pad:], axis=-1, keepdims=True))
                if out_scale is not None:
                    r0 = r0 * out_scale
                    r1 = r1 * out_scale
                div = jnp.where(lane_sm == 0, r0, r1)
                vs = qkv_ref[b, :, 2 * d + h * dh:2 * d + (h + 2) * dh]
                vbd = jnp.concatenate(
                    [jnp.where(lanei == 0, vs, 0),
                     jnp.where(lanei == 1, vs, 0)], axis=0)
                pv = jnp.dot(e.astype(x.dtype), vbd,
                             preferred_element_type=jnp.float32)
                pv = (pv * div).astype(x.dtype)
                if ao_ref is not None:
                    ao_ref[b * n_pad:(b + 1) * n_pad,
                           h * dh:(h + 2) * dh] = pv
                else:
                    qkv_ref[b, :n_pad, h * dh:(h + 2) * dh] = pv


def _mha_loop_int8s(qkv_ref, scores_ref, ao_ref, sc_qk, pv_fold, *,
                    imgs: int, n_pad: int, kv_pad: int, n_heads: int,
                    dh: int, n_sc: int, scale: float, n_valid: int):
    """Pair-packed MHA over an INT8 q/k/v panel — static-scale int8
    scores (round 5b).  QK^T and PV run on the int8 MXU at 2x the bf16
    rate; all dequants are SCALARS (``sc_qk`` = s_q*s_k, multiplied by
    1/sqrt(dh) here; ``pv_fold`` = s_p*s_v/s_ao so the attention output
    lands directly in the out-projection's quant domain).  p is
    normalized BEFORE quantization (p = e*r in [0, 1]), so the fixed
    127 p-scale needs no reduce — the lever that made dynamic int8
    scores a measured loss (experiments/perf_attn_int8scores.py) was
    exactly the per-row/per-column quant work static calibration
    deletes.  dh must be 64 with an even head count (pair packing)."""
    d = n_heads * dh
    dw = 2 * dh
    sdq = sc_qk * jnp.float32(scale)
    lanei = jax.lax.broadcasted_iota(jnp.int32, (kv_pad, dw), 1) // dh
    lane_kv = jax.lax.broadcasted_iota(
        jnp.int32, (n_pad, 2 * kv_pad), 1) < kv_pad
    if n_valid < kv_pad:
        coli = jax.lax.broadcasted_iota(
            jnp.int32, (1, 2 * kv_pad), 1)
        colbias = jnp.where(coli % kv_pad < n_valid, 0.0, _NEG_INF)
    else:
        colbias = None
    zero = jnp.int8(0)
    for b in range(imgs):
        for g in range(0, n_heads, n_sc):
            npair = (min(g + n_sc, n_heads) - g) // 2
            for sl in range(npair):
                h = g + 2 * sl
                q2 = qkv_ref[b, :n_pad, h * dh:(h + 2) * dh]
                ks = qkv_ref[b, :, d + h * dh:d + (h + 2) * dh]
                kbd = jnp.concatenate(
                    [jnp.where(lanei == 0, ks, zero),
                     jnp.where(lanei == 1, ks, zero)], axis=0)
                scores_ref[sl] = jax.lax.dot_general(
                    q2, kbd, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            for sl in range(npair):
                h = g + 2 * sl
                s = scores_ref[sl] * sdq
                s = jnp.clip(s, _EXP_LO, _EXP_HI)
                if colbias is not None:
                    s = s + colbias
                e = jnp.exp(s)
                r0 = jax.lax.reciprocal(
                    jnp.sum(e[:, :kv_pad], axis=-1, keepdims=True))
                r1 = jax.lax.reciprocal(
                    jnp.sum(e[:, kv_pad:], axis=-1, keepdims=True))
                # normalized-then-quantized probabilities: p = e*r <= 1
                pq = jnp.clip(
                    jnp.rint(e * (127.0 * jnp.where(lane_kv, r0, r1))),
                    0.0, 127.0).astype(jnp.int8)
                vs = qkv_ref[b, :, 2 * d + h * dh:2 * d + (h + 2) * dh]
                vbd = jnp.concatenate(
                    [jnp.where(lanei == 0, vs, zero),
                     jnp.where(lanei == 1, vs, zero)], axis=0)
                pv = jax.lax.dot_general(
                    pq, vbd, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                ao_ref[b * n_pad:(b + 1) * n_pad,
                       h * dh:(h + 2) * dh] = (
                    pv.astype(jnp.float32) * pv_fold).astype(ao_ref.dtype)


def _attn_block_kernel(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wo_ref,
                       bo_ref, o_ref, qkv_ref, scores_ref, *maybe_ao,
                       eps: float, scale: float, n_valid: int, n_pad: int,
                       kv_pad: int, n_heads: int, dh: int, n_sc: int,
                       imgs: int, residual: bool = True,
                       safe_softmax: bool = False, pairs: bool = False):
    ao_ref = maybe_ao[0] if maybe_ao else None
    d = n_heads * dh            # attention width (= dm except under tp)
    dm = x_ref.shape[-1]        # model width
    x = x_ref[:].reshape(imgs * n_pad, dm)

    # LayerNorm (f32 statistics) + QKV projection on all imgs*n_pad rows
    # (one big MXU GEMM), written into the 128-aligned per-image K/V
    # panels; zeroed tails keep PV exact (masked scores make P's tail
    # columns exactly 0, and 0 * 0 = 0 — never 0 * garbage).
    xf = x.astype(jnp.float32)
    # One-pass variance (E[x^2] - mu^2) saves a full traversal of xf vs
    # jnp.var's two-pass form (-0.17 ms / 12 layers, experiments/
    # perf_attn_micro.py); the clamp guards the cancellation-negative
    # case (constant rows) on the tiny (rows, 1) vector.
    # Precision envelope (ADVICE r2): in f32 the E[x²]-µ² form loses
    # ~log2(µ²/σ²) bits to cancellation, so rows need |µ|/σ ≲ 2^9 for
    # ~14-bit-accurate variance — residual-stream activations sit at
    # |µ|/σ < 10 (they are LayerNormed every half-block), 4+ orders
    # inside the envelope; the two-pass jnp.var stays in the XLA
    # reference and every backward pass, so parity tests would catch a
    # model family that ever leaves it.
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ls_ref[0] +
          lb_ref[0]).astype(x.dtype)
    # Per-image GEMMs write straight into the K/V panel — no (rows, 3d)
    # intermediate + copy (-0.1 ms / 12 layers, bit-identical).
    for b in range(imgs):
        qkv_b = (jnp.dot(xn[b * n_pad:(b + 1) * n_pad], wqkv_ref[:],
                         preferred_element_type=jnp.float32)
                 + bqkv_ref[0]).astype(x.dtype)
        if kv_pad != n_pad:
            qkv_ref[b, :n_pad] = qkv_b
            qkv_ref[b, n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d),
                                           x.dtype)
        else:
            qkv_ref[b] = qkv_b

    # Attention per image, phase-split in head groups of n_sc: all QK^T
    # of the group first (MXU), then softmax+PV per head (VPU feeds MXU).
    # Softmax diet (~0.15 ms / 12 layers at ViT-B b64, measured in
    # experiments/perf_attn_softmax2.py):
    #   * the 1/sqrt(dh) scale rides the small (n_pad, dh) q tile — 16x
    #     cheaper than scaling the score tile, exact for pow2 dh;
    #   * the pad-key mask is a (1, kv_pad) column-bias vector built ONCE
    #     per cell and broadcast-added per head (one fused pass) instead
    #     of per-head iota + where (two passes) — same exact -inf
    #     semantics, so no denominator tricks with cancellation hazards;
    #   * the normalizing divide moves AFTER PV: a (n_pad, dh) broadcast
    #     multiply instead of a (n_pad, kv_pad) one.
    # safe_softmax selects the exact max-subtract softmax (checkpoints
    # outside the max-free clip window per utils/calibrate.py, and
    # training); the default max-free path drops the per-row max reduce
    # (exp(clip(s)) — exact while scores stay in [-70, 80], measured
    # +0.33 ms / 12 layers, experiments/perf_attn_softmax3.py).
    # ``pairs`` head-pair-packs the score GEMMs (see _mha_loop).
    _mha_loop(x, qkv_ref, scores_ref, ao_ref, imgs=imgs, n_pad=n_pad,
              kv_pad=kv_pad, n_heads=n_heads, dh=dh, n_sc=n_sc,
              scale=scale, n_valid=n_valid, safe_softmax=safe_softmax,
              pairs=pairs)

    # Output projection + residual (all rows in one GEMM)
    if ao_ref is not None:
        src = ao_ref[:]
    else:
        src = qkv_ref[:, :n_pad, :d].reshape(imgs * n_pad, d)
    y = jnp.dot(src, wo_ref[:],
                preferred_element_type=jnp.float32) + bo_ref[0]
    if residual:
        y = x + y.astype(x.dtype)
    else:
        y = y.astype(x.dtype)   # tp partial output; psum + residual outside
    o_ref[:] = y.reshape(imgs, n_pad, dm)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "n_valid",
                                             "residual", "safe_softmax",
                                             "interpret"))
def attn_block_pallas(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                      num_heads: int, eps: float = 1e-6,
                      n_valid: int | None = None,
                      residual: bool = True,
                      safe_softmax: bool = False,
                      interpret: bool = False):
    """x: (B, N, D) -> x + OutProj(MHA(QKV(LN(x)))). Weights any dtype
    (cast to x.dtype); biases f32.

    The attention width may be NARROWER than the model width (wqkv
    (D, 3*Da), wo (Da, D) with Da = local-head-group width): that is the
    tensor-parallel partial kernel, which runs ``num_heads/tp`` heads per
    device under shard_map and psums the partial out-projections
    (parallel/shard_model.py).  ``residual=False`` returns just the
    projected attention output so the psum + residual happen once."""
    b, n, d = x.shape
    da = wqkv.shape[-1] // 3
    dh = da // num_heads
    if n_valid is None:
        n_valid = n
    n_pad = round_up(n, _sublane(x.dtype))
    kv_pad = round_up(n, LANE)
    if n_pad != n:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])
    plan = attn_plan(num_heads, d, n_pad, kv_pad, x.dtype.itemsize,
                     batch=b, d_attn=da)
    if plan.n_sc < 1:
        raise ValueError(
            f"attn_block does not fit VMEM at d={d}, seq={n}; "
            "use flash_attention / the XLA path")
    imgs, n_sc = plan.imgs, plan.n_sc

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_attn_block_kernel, eps=eps,
                          scale=1.0 / (dh ** 0.5),
                          n_valid=min(n_valid, n), n_pad=n_pad,
                          kv_pad=kv_pad, n_heads=num_heads, dh=dh,
                          n_sc=n_sc, imgs=imgs, residual=residual,
                          safe_softmax=safe_softmax,
                          pairs=pair_pack_ok(dh, num_heads, plan.n_sc)),
        grid=(b // imgs,),
        in_specs=[
            pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, d)), const((1, d)),
            const((d, 3 * da)), const((1, 3 * da)),
            const((da, d)), const((1, d)),
        ],
        out_specs=pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((imgs, kv_pad, 3 * da), x.dtype),
            (pltpu.VMEM((n_sc // 2, n_pad, 2 * kv_pad), jnp.float32)
             if pair_pack_ok(dh, num_heads, n_sc)
             else pltpu.VMEM((n_sc, n_pad, kv_pad), jnp.float32)),
        ] + ([] if plan.reuse_q
             else [pltpu.VMEM((imgs * n_pad, da), x.dtype)]),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * d * (3 * da + da)
            + 4 * b * num_heads * n_pad * kv_pad * dh,
            bytes_accessed=2 * b * n_pad * d * x.dtype.itemsize
            + (3 * d * da + da * d) * 2,
            transcendentals=b * num_heads * n_pad * kv_pad),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            **({"vmem_limit_bytes": plan.vmem_limit}
               if plan.vmem_limit else {})),
        interpret=interpret,
    )(x, ln_scale.reshape(1, -1).astype(jnp.float32),
      ln_bias.reshape(1, -1).astype(jnp.float32),
      wqkv.astype(x.dtype), bqkv.reshape(1, -1).astype(jnp.float32),
      wo.astype(x.dtype), bo.reshape(1, -1).astype(jnp.float32))
    return out[:, :n, :]


# ---------------------------------------------------------------------------
# Stats-epilogue variant (round 3; experiments/perf_attn_lnepi.py): the
# kernel CONSUMES the previous half's LayerNorm (mu, rstd) stats — its
# VPU preamble is elementwise, no reductions before the QKV GEMM — and
# EMITS the next half's LN2 stats at its tail, where the reductions are
# independent of the remaining out-projection MXU work.  Bit-identical
# one-pass f32 stats on both sides; measured -0.21 ms / 12 ViT-B layers
# for the AB chain.  Inference-only (models/vit.py wraps the chained
# encoder in a whole-chain custom VJP); max-free softmax tiers with an
# ao scratch only.
# ---------------------------------------------------------------------------

STATS_LANES = 128   # (rows, 128) f32 stats tile: col 0 = mu, col 1 = rstd


def _attn_stats_kernel(x_ref, st_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref,
                       wo_ref, bo_ref, o_ref, *rest, eps: float,
                       scale: float, n_valid: int, n_pad: int,
                       kv_pad: int, n_heads: int, dh: int, n_sc: int,
                       imgs: int, emit_stats: bool, pairs: bool = False):
    if emit_stats:
        sto_ref, qkv_ref, scores_ref, ao_ref = rest
    else:
        sto_ref = None
        qkv_ref, scores_ref, ao_ref = rest
    d = n_heads * dh
    x = x_ref[:].reshape(imgs * n_pad, d)
    xf = x.astype(jnp.float32)
    mu = st_ref[:].reshape(imgs * n_pad, STATS_LANES)[:, 0:1]
    rstd = st_ref[:].reshape(imgs * n_pad, STATS_LANES)[:, 1:2]
    xn = ((xf - mu) * rstd * ls_ref[0] + lb_ref[0]).astype(x.dtype)
    for b in range(imgs):
        qkv_b = (jnp.dot(xn[b * n_pad:(b + 1) * n_pad], wqkv_ref[:],
                         preferred_element_type=jnp.float32)
                 + bqkv_ref[0]).astype(x.dtype)
        if kv_pad != n_pad:
            qkv_ref[b, :n_pad] = qkv_b
            qkv_ref[b, n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d),
                                           x.dtype)
        else:
            qkv_ref[b] = qkv_b
    _mha_loop(x, qkv_ref, scores_ref, ao_ref, imgs=imgs, n_pad=n_pad,
              kv_pad=kv_pad, n_heads=n_heads, dh=dh, n_sc=n_sc,
              scale=scale, n_valid=n_valid, safe_softmax=False,
              pairs=pairs)
    y = jnp.dot(ao_ref[:], wo_ref[:],
                preferred_element_type=jnp.float32) + bo_ref[0]
    out = x + y.astype(x.dtype)
    o_ref[:] = out.reshape(imgs, n_pad, d)
    if emit_stats:
        of = out.astype(jnp.float32)
        mu2 = jnp.mean(of, axis=-1, keepdims=True)
        var2 = jnp.maximum(
            jnp.mean(of * of, axis=-1, keepdims=True) - mu2 * mu2, 0.0)
        rstd2 = jax.lax.rsqrt(var2 + eps)
        sto_ref[:, :, 0:1] = mu2.reshape(imgs, n_pad, 1)
        sto_ref[:, :, 1:2] = rstd2.reshape(imgs, n_pad, 1)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "n_valid",
                                             "emit_stats", "interpret"))
def attn_block_stats_pallas(x, stats, ln_scale, ln_bias, wqkv, bqkv, wo,
                            bo, num_heads: int, eps: float = 1e-6,
                            n_valid: int | None = None,
                            emit_stats: bool = True,
                            interpret: bool = False):
    """Stats-epilogue attention half: (x, stats) -> (out, stats_out|None).
    ``stats`` is the (B, n_pad, STATS_LANES) f32 tile from the previous
    half (col 0 = mu, col 1 = rstd of each token row)."""
    b, n, d = x.shape
    dh = d // num_heads
    if n_valid is None:
        n_valid = n
    n_pad = round_up(n, _sublane(x.dtype))
    kv_pad = round_up(n, LANE)
    assert x.shape[1] == n_pad == stats.shape[1], (
        "stats chain runs on padded-residency tokens")
    plan = attn_plan(num_heads, d, n_pad, kv_pad, x.dtype.itemsize,
                     batch=b)
    if plan.n_sc < 1 or plan.reuse_q:
        raise ValueError("stats-epilogue attention needs an ao-scratch "
                         f"tier (d={d}, seq={n})")
    imgs, n_sc = plan.imgs, plan.n_sc

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    xtile = pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    stile = pl.BlockSpec((imgs, n_pad, STATS_LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    out_specs = [xtile] + ([stile] if emit_stats else [])
    out_shape = [jax.ShapeDtypeStruct((b, n_pad, d), x.dtype)] + (
        [jax.ShapeDtypeStruct((b, n_pad, STATS_LANES), jnp.float32)]
        if emit_stats else [])
    outs = pl.pallas_call(
        functools.partial(_attn_stats_kernel, eps=eps,
                          scale=1.0 / (dh ** 0.5),
                          n_valid=min(n_valid, n), n_pad=n_pad,
                          kv_pad=kv_pad, n_heads=num_heads, dh=dh,
                          n_sc=n_sc, imgs=imgs, emit_stats=emit_stats,
                          pairs=pair_pack_ok(dh, num_heads, n_sc)),
        grid=(b // imgs,),
        in_specs=[xtile, stile, const((1, d)), const((1, d)),
                  const((d, 3 * d)), const((1, 3 * d)),
                  const((d, d)), const((1, d))],
        out_specs=out_specs if emit_stats else out_specs[0],
        out_shape=out_shape if emit_stats else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((imgs, kv_pad, 3 * d), x.dtype),
            (pltpu.VMEM((n_sc // 2, n_pad, 2 * kv_pad), jnp.float32)
             if pair_pack_ok(dh, num_heads, n_sc)
             else pltpu.VMEM((n_sc, n_pad, kv_pad), jnp.float32)),
            pltpu.VMEM((imgs * n_pad, d), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * d * (3 * d + d)
            + 4 * b * num_heads * n_pad * kv_pad * dh,
            bytes_accessed=2 * b * n_pad * d * x.dtype.itemsize
            + (4 * d * d + 3 * d * d) * 2,
            transcendentals=b * num_heads * n_pad * kv_pad),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            **({"vmem_limit_bytes": plan.vmem_limit}
               if plan.vmem_limit else {})),
        interpret=interpret,
    )(x, stats, ln_scale.reshape(1, -1).astype(jnp.float32),
      ln_bias.reshape(1, -1).astype(jnp.float32),
      wqkv.astype(x.dtype), bqkv.reshape(1, -1).astype(jnp.float32),
      wo.astype(x.dtype), bo.reshape(1, -1).astype(jnp.float32))
    if emit_stats:
        return outs[0], outs[1]
    return outs, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def attn_block(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, num_heads: int,
               eps: float, n_valid: int | None = None,
               safe_softmax: bool = False):
    """Differentiable fused attention half: Pallas forward, XLA-recompute
    backward (rematerialization; see ops/fused_mlp.py).  ``n_valid``
    supports padded-residency encoders (tokens kept sublane-padded across
    layers; key/value columns >= n_valid are masked).  ``safe_softmax``
    selects the exact max-subtract softmax for checkpoints outside the
    max-free clip window (utils/calibrate.py) and for training."""
    return attn_block_pallas(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                             num_heads, eps=eps, n_valid=n_valid,
                             safe_softmax=safe_softmax)


def _attn_block_fwd(x, ls, lb, wqkv, bqkv, wo, bo, num_heads, eps,
                    n_valid, safe_softmax):
    out = attn_block_pallas(x, ls, lb, wqkv, bqkv, wo, bo, num_heads,
                            eps=eps, n_valid=n_valid,
                            safe_softmax=safe_softmax)
    return out, (x, ls, lb, wqkv, bqkv, wo, bo)


def _attn_block_bwd(num_heads, eps, n_valid, safe_softmax, res, g):
    x, ls, lb, wqkv, bqkv, wo, bo = res
    d = x.shape[-1]
    n_pad = round_up(x.shape[1], _sublane(x.dtype))
    kv_pad = round_up(x.shape[1], LANE)
    fits = _bwd_fits(num_heads, d, n_pad, kv_pad, x.dtype.itemsize)
    if jax.default_backend() == "tpu" and fits:
        dx, dls, dlb, dwqkv, dbqkv, dwo, dbo = attn_block_bwd_pallas(
            x, ls, lb, wqkv, bqkv, wo, g, num_heads, eps=eps,
            n_valid=n_valid)
        grads = (dx, dls, dlb, dwqkv, dbqkv, dwo, dbo)
        return tuple(gr.astype(p.dtype) for gr, p in zip(grads, res))
    _, vjp = jax.vjp(
        lambda *a: attn_block_xla(*a, num_heads=num_heads, eps=eps,
                                  n_valid=n_valid), *res)
    return vjp(g)


attn_block.defvjp(_attn_block_fwd, _attn_block_bwd)


# ---------------------------------------------------------------------------
# Native backward kernel (round 2): recomputes the forward per image
# in-kernel (LN, qkv panel, per-head softmax) and chains the gradients —
# dP -> dS -> dq/dk/dv -> dxn -> LN backward — with dWqkv/dWo/biases
# accumulated in VMEM f32 scratch across the batch sweep.  Replaces the
# XLA-recompute VJP, whose unfused recompute+backward dominated training
# step time.
# ---------------------------------------------------------------------------


def _bwd_fits(n_heads: int, d: int, n_pad: int, kv_pad: int,
              itemsize: int) -> bool:
    """The backward keeps both weight mats + their f32 grads resident."""
    resident = (4 * d * d * itemsize          # wqkv + wo
                + 4 * d * d * 4               # dwqkv + dwo (f32)
                + 2 * kv_pad * 3 * d * itemsize   # qkv + dqkv panels
                + 6 * n_pad * d * itemsize)   # x/g/dx tiles + ao
    return resident + 2 * n_pad * kv_pad * 4 <= 64 * 1024 * 1024


def _attn_bwd_kernel(x_ref, g_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref,
                     wo_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref,
                     dbo_ref, dls_ref, dlb_ref, qkv_ref, dqkv_ref, ao_ref,
                     *, eps: float, scale: float, n_valid: int,
                     n_pad: int, kv_pad: int, n_heads: int, dh: int,
                     pairs: bool = False):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)
        dls_ref[:] = jnp.zeros_like(dls_ref)
        dlb_ref[:] = jnp.zeros_like(dlb_ref)

    d = n_heads * dh
    x = x_ref[0]
    g = g_ref[0]

    # ---- recompute forward intermediates (in-kernel remat) ----
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    xn = (xhat * ls_ref[0] + lb_ref[0]).astype(x.dtype)
    # bqkv shifts q/k/v and therefore the scores (q_i·δk does not cancel
    # in softmax) — the recompute must match the forward exactly.
    qkv = (jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
           + bqkv_ref[0])
    qkv_ref[:n_pad] = qkv.astype(x.dtype)
    if kv_pad != n_pad:
        qkv_ref[n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d), x.dtype)

    # dao for all heads at once: attention-out cotangent through Wo
    gw = jax.lax.dot_general(g, wo_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (n, d)
    gwc = gw.astype(x.dtype)

    if pairs:
        # Head-PAIR-packed score-space backward (round 5): the forward's
        # block-diagonal packing (_mha_loop pairs=True) propagated to
        # ALL SIX score-space GEMMs of the gradient chain — at dh=64
        # every per-head contraction (QK^T, PV, dv, dP, dq, dk) runs
        # half the MXU lanes; packing two heads block-diagonally makes
        # each slice 128-lane aligned and halves GEMM count.  dv/dk
        # come out with cross-head garbage blocks that one lane-masked
        # select discards; dP/dq are exact because the zero-masked
        # panels kill the cross terms.
        dw = 2 * dh
        lanei = jax.lax.broadcasted_iota(jnp.int32, (kv_pad, dw), 1) // dh
        lane_kv = jax.lax.broadcasted_iota(
            jnp.int32, (n_pad, 2 * kv_pad), 1) < kv_pad
        if n_valid < kv_pad:
            col2 = jax.lax.broadcasted_iota(
                jnp.int32, (n_pad, 2 * kv_pad), 1) % kv_pad
            colv = col2 < n_valid
        else:
            colv = None
        for h in range(0, n_heads, 2):
            q2 = qkv_ref[:n_pad, h * dh:(h + 2) * dh]
            ks = qkv_ref[:, d + h * dh:d + (h + 2) * dh]
            kbd = jnp.concatenate([jnp.where(lanei == 0, ks, 0),
                                   jnp.where(lanei == 1, ks, 0)], axis=0)
            s = jax.lax.dot_general(
                q2, kbd, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if colv is not None:
                s = jnp.where(colv, s, _NEG_INF)
            m0 = jnp.max(s[:, :kv_pad], axis=-1, keepdims=True)
            m1 = jnp.max(s[:, kv_pad:], axis=-1, keepdims=True)
            e = jnp.exp(s - jnp.where(lane_kv, m0, m1))
            r0 = jax.lax.reciprocal(
                jnp.sum(e[:, :kv_pad], axis=-1, keepdims=True))
            r1 = jax.lax.reciprocal(
                jnp.sum(e[:, kv_pad:], axis=-1, keepdims=True))
            p = e * jnp.where(lane_kv, r0, r1)      # (n_pad, 2*kv) f32
            pc = p.astype(x.dtype)

            vs = qkv_ref[:, 2 * d + h * dh:2 * d + (h + 2) * dh]
            vbd = jnp.concatenate([jnp.where(lanei == 0, vs, 0),
                                   jnp.where(lanei == 1, vs, 0)], axis=0)
            gw2 = gwc[:, h * dh:(h + 2) * dh]       # (n_pad, 2*dh)
            ao_ref[:, h * dh:(h + 2) * dh] = jnp.dot(
                pc, vbd, preferred_element_type=jnp.float32).astype(
                    x.dtype)
            # dv: block rows of p^T @ gw2; keep the block-diag lanes
            dv2 = jax.lax.dot_general(pc, gw2, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dqkv_ref[:, 2 * d + h * dh:2 * d + (h + 2) * dh] = jnp.where(
                lanei == 0, dv2[:kv_pad], dv2[kv_pad:]).astype(x.dtype)
            # dP: exact — vbd's zero lanes kill the cross-head terms
            dp = jax.lax.dot_general(gw2, vbd, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            rs0 = jnp.sum(dp[:, :kv_pad] * p[:, :kv_pad], axis=-1,
                          keepdims=True)
            rs1 = jnp.sum(dp[:, kv_pad:] * p[:, kv_pad:], axis=-1,
                          keepdims=True)
            ds = (p * (dp - jnp.where(lane_kv, rs0, rs1))
                  * scale).astype(x.dtype)
            # dq: exact — kbd's zero lanes kill the cross terms
            dqkv_ref[:n_pad, h * dh:(h + 2) * dh] = jnp.dot(
                ds, kbd, preferred_element_type=jnp.float32).astype(
                    x.dtype)
            # dk: block rows of dS^T @ q2; keep the block-diag lanes
            dk2 = jax.lax.dot_general(ds, q2, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dqkv_ref[:, d + h * dh:d + (h + 2) * dh] = jnp.where(
                lanei == 0, dk2[:kv_pad], dk2[kv_pad:]).astype(x.dtype)
    else:
        for h in range(n_heads):
            q = qkv_ref[:n_pad, h * dh:(h + 1) * dh]
            k = qkv_ref[:, d + h * dh:d + (h + 1) * dh]
            v = qkv_ref[:, 2 * d + h * dh:2 * d + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if n_valid < kv_pad:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n_valid, s, _NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)  # (n_pad, kv) f32
            pc = p.astype(x.dtype)

            gw_h = gwc[:, h * dh:(h + 1) * dh]          # (n_pad, dh)
            # ao for dWo accumulation
            ao_ref[:, h * dh:(h + 1) * dh] = jnp.dot(
                pc, v, preferred_element_type=jnp.float32).astype(x.dtype)
            # dv = p^T @ dao
            dv = jax.lax.dot_general(pc, gw_h, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            # dP = dao @ v^T
            dp = jax.lax.dot_general(gw_h, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            # softmax backward: dS = p * (dP - rowsum(dP * p)), * scale
            ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                  * scale).astype(x.dtype)
            # dq = dS @ k ; dk = dS^T @ q
            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dqkv_ref[:n_pad, h * dh:(h + 1) * dh] = dq.astype(x.dtype)
            dqkv_ref[:, d + h * dh:d + (h + 1) * dh] = dk.astype(x.dtype)
            dqkv_ref[:, 2 * d + h * dh:2 * d + (h + 1) * dh] = dv.astype(
                x.dtype)

    # out-projection grads
    dwo_ref[:] += jax.lax.dot_general(ao_ref[:], g,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dbo_ref[:] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    # qkv-projection grads + dxn
    dqkv = dqkv_ref[:n_pad]
    dwqkv_ref[:] += jax.lax.dot_general(xn, dqkv, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    dbqkv_ref[:] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                            keepdims=True)
    dxn = jax.lax.dot_general(dqkv, wqkv_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    # LayerNorm backward + residual
    dls_ref[:] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dlb_ref[:] += jnp.sum(dxn, axis=0, keepdims=True)
    dxhat = dxn * ls_ref[0]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = (dxhat - m1 - xhat * m2) * rstd
    dx_ref[0] = (g.astype(jnp.float32) + dx_ln).astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "n_valid",
                                             "pairs", "interpret"))
def attn_block_bwd_pallas(x, ln_scale, ln_bias, wqkv, bqkv, wo, g,
                          num_heads: int, eps: float = 1e-6,
                          n_valid: int | None = None,
                          pairs: bool | None = None,
                          interpret: bool = False):
    """Backward of the attention half: returns
    (dx, dls, dlb, dwqkv, dbqkv, dwo, dbo).  ``g`` is the output
    cotangent (B, N, D); weight grads are f32.  ``pairs`` head-pair-packs
    the six score-space GEMMs (None = auto: on at dh==64 with an even
    head count, the geometry the forward packing measured wins at)."""
    b, n, d = x.shape
    dh = d // num_heads
    if pairs is None:
        pairs = dh == 64 and num_heads % 2 == 0
    if n_valid is None:
        n_valid = n
    n_pad = round_up(n, _sublane(x.dtype))
    kv_pad = round_up(n, LANE)
    if n_pad != n:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])
        g = jnp.pad(g, [(0, 0), (0, n_pad - n), (0, 0)])

    tile = pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, eps=eps,
                          scale=1.0 / (dh ** 0.5),
                          n_valid=min(n_valid, n), n_pad=n_pad,
                          kv_pad=kv_pad, n_heads=num_heads, dh=dh,
                          pairs=pairs),
        grid=(b,),
        in_specs=[tile, tile, const((1, d)), const((1, d)),
                  const((d, 3 * d)), const((1, 3 * d)), const((d, d))],
        out_specs=[tile, const((d, 3 * d)), const((1, 3 * d)),
                   const((d, d)), const((1, d)), const((1, d)),
                   const((1, d))],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
            jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((d, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((kv_pad, 3 * d), x.dtype),
            pltpu.VMEM((kv_pad, 3 * d), x.dtype),
            pltpu.VMEM((n_pad, d), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, g, ln_scale.reshape(1, -1).astype(jnp.float32),
      ln_bias.reshape(1, -1).astype(jnp.float32),
      wqkv.astype(x.dtype), bqkv.reshape(1, -1).astype(jnp.float32),
      wo.astype(x.dtype))
    dx, dwqkv, dbqkv, dwo, dbo, dls, dlb = outs
    return (dx[:, :n, :], dls.reshape(-1), dlb.reshape(-1), dwqkv,
            dbqkv.reshape(-1), dwo, dbo.reshape(-1))


def attn_block_xla(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                   num_heads: int, eps: float = 1e-6,
                   n_valid: int | None = None):
    """Reference implementation with identical semantics."""
    from .attention import mha_qkv_xla
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ln_scale +
          ln_bias).astype(x.dtype)
    qkv = (jnp.dot(xn, wqkv.astype(x.dtype),
                   preferred_element_type=jnp.float32)
           + bqkv).astype(x.dtype)
    o = mha_qkv_xla(qkv, num_heads, n_valid=n_valid)
    y = jnp.dot(o, wo.astype(x.dtype),
                preferred_element_type=jnp.float32) + bo
    return x + y.astype(x.dtype)
