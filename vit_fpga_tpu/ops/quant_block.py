"""Int8 transformer-block mega-kernels — the fast quantized datapath.

Round-1's int8 fast path ran one fused int8 linear per projection
(ops/quant_fused.py); each kernel still round-tripped bf16 activations
through HBM and paid quantize/dequantize VPU work serialized against its
own GEMM, landing SLOWER than bf16 (21.4 vs 17.9 ms/step on ViT-B/16 b64).

These kernels quantize at block granularity instead, mirroring the bf16
mega-kernels (ops/attn_block.py v2 design, ops/fused_mlp.py):

  * ``mlp_block_int8``: LN -> row-quant -> int8 GEMM1 (int32 acc, 2x bf16
    MXU rate) -> dequant+bias -> activation -> row-quant -> int8 GEMM2 ->
    dequant+bias -> +residual, one VMEM pass per token tile.  The (t, M)
    hidden tile never touches HBM in EITHER precision.
  * ``attn_block_int8``: the attention-half mega-kernel with int8
    QKV/out projections (attention math itself stays bf16 — its GEMMs are
    64-deep and VMEM-resident; int8 would add quantize steps for ~0 MXU
    win).  Same sublane row padding, zero-tailed K/V panel, head-group
    schedule, and q-slot reuse as the bf16 kernel.

Weights are int8 per-output-column (quantize_weight_colwise); activations
per-row (per-token) dynamic, computed in-kernel — no extra HBM passes.
Int8 weights also halve the VMEM weight footprint, so CLIP-L geometries
fit with more score slots than bf16.

Contract: tolerance parity vs the row-wise quantized reference
(ops/quant_fused.int8_linear_rowwise_ref composition); the bit-exact
fixed-point contract stays with ops/quant.py.  Reference hook: the int8
datapath the reference's FPGA bitstream advertised (SURVEY.md §2.2 item 4).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attn_block import _mha_loop, pair_pack_ok
from .common import LANE, pad_sublane, round_up
from .quant_fused import QMAX

_NEG_INF = -1e30
_EXP_LO, _EXP_HI = -70.0, 80.0   # max-free softmax window (attn_block.py)


def _row_quant(xf):
    """(t, k) f32 -> int8 rows + (t, 1) f32 scales (symmetric absmax)."""
    absmax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
    sx = absmax / QMAX
    xq = jnp.clip(jnp.rint(xf / sx), -QMAX, QMAX).astype(jnp.int8)
    return xq, sx


def _ln_f32(x, s_ref, b_ref, eps):
    xf = x.astype(jnp.float32)
    # one-pass variance (E[x^2] - mu^2), clamped on the tiny stats
    # vector — saves a full traversal of xf (see ops/attn_block.py)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * s_ref[0] + b_ref[0]


def _apply_act(h, act: str):
    if act == "gelu_tanh":
        # fma-reassociated tanh-GELU (see ops/fused_mlp._act)
        h2 = h * h
        u = h * (0.7978845608028654 + 0.035677408136300125 * h2)
        hh = 0.5 * h
        return hh + hh * jnp.tanh(u)
    if act == "quick_gelu":
        return h * jax.nn.sigmoid(1.702 * h)
    if act == "relu":
        return jnp.maximum(h, 0.0)
    raise ValueError(act)


# ---------------------------------------------------------------------------
# MLP half
# ---------------------------------------------------------------------------

def _mlp_int8_kernel(x_ref, ls_ref, lb_ref, w1_ref, s1_ref, b1_ref,
                     w2_ref, s2_ref, b2_ref, o_ref, *, eps: float,
                     act: str):
    x = x_ref[:]
    xn = _ln_f32(x, ls_ref, lb_ref, eps)
    xq, sx = _row_quant(xn)
    acc1 = jax.lax.dot_general(xq, w1_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    h = acc1.astype(jnp.float32) * (sx * s1_ref[0]) + b1_ref[0]
    h = _apply_act(h, act)
    hq, sh = _row_quant(h)
    acc2 = jax.lax.dot_general(hq, w2_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    y = acc2.astype(jnp.float32) * (sh * s2_ref[0]) + b2_ref[0]
    o_ref[:] = x + y.astype(x.dtype)


def mlp_block_t(t: int, d: int, m: int, budget: int = 17 << 20) -> int:
    """Pick the int8 MLP row-tile for T=t total rows.

    Measured at ViT-B b64 (12800 rows): 640 beats 256 by 2-4% 4/4
    rounds, 512 by ~2%, 384/768 lose, 1024 VMEM-OOMs
    (experiments/perf_int8_r4b.py, perf_int8_r4c.py — all bit-exact;
    row-tiling is exact because LN and row-quant are per-row).  The
    scoped-VMEM model counts the full per-tile footprint (ADVICE r4):
    2*d*m int8 weight bytes + 4*bt*m f32 hidden tile + bt*m int8 hq +
    bt*d*(2+2+1) x/out bf16 + xq int8; the 17 MB budget keeps every
    MEASURED decision (640 at ViT-B b64 = 16.3 MiB passes; CLIP-L's
    8.4 MB weights push 512 to 21.5 MB, so it keeps 256) while an
    untested mid geometry near the cutoff (e.g. d=896/m=3584 at 512 =
    17.9 MB) now falls back to 256 instead of gambling on compile-time
    OOM.  Bigger tiles also need pad <=2% of rows — batch-1 (200 rows)
    keeps 256.  Tiering pinned by tests/test_quant_block.py."""
    for bt in (640, 512):
        if 2 * d * m + bt * (5 * m + 5 * d) > budget:
            continue
        if round_up(t, bt) - t <= t // 50:
            return bt
    return 256


# Oversize-weight int8 MLPs (ViT-H: 12.5 MB int8 weights > the 11 MB
# default-plan gate) run under a RAISED scoped-VMEM plan — the same
# compiler-default-not-hardware fact the bf16 path exploits at 48 MB
# (ops/fused_mlp.MLP_BIG_VMEM).  The plan budget leaves the measured
# headroom Mosaic's pipeline buffers need on top of the tile model.
MLP_INT8_BIG_VMEM = 40 * 1024 * 1024


def mlp_plan_int8(t: int, d: int, m: int) -> tuple[int, int]:
    """(block_t, vmem_limit) for the int8 MLP mega-kernels.  Default-
    plan geometries keep the measured mlp_block_t tiering with no
    override; oversize weights (> 11 MB int8) get the largest row tile
    whose full footprint fits the raised plan, or (0, 0) if nothing
    fits even raised — callers fall back to the per-linear path."""
    if 2 * d * m <= 11 * 1024 * 1024:
        return mlp_block_t(t, d, m), 0
    budget = MLP_INT8_BIG_VMEM - (4 << 20)   # pipeline-buffer headroom
    for bt in (512, 384, 256, 128):
        if 2 * d * m + bt * (5 * m + 5 * d) > budget:
            continue
        if round_up(t, bt) - t <= max(t // 50, bt):
            return bt, MLP_INT8_BIG_VMEM
    return 0, 0


@functools.partial(jax.jit, static_argnames=("eps", "act", "block_t",
                                             "vmem_limit", "interpret"))
def mlp_block_int8(x, ln_scale, ln_bias, w1q, w1s, b1, w2q, w2s, b2,
                   eps: float = 1e-6, act: str = "gelu_tanh",
                   block_t: int = 256, vmem_limit: int = 0,
                   interpret: bool = False):
    """x: (T, D) bf16 tokens -> x + MLP_int8(LN(x)).  w*q int8 (K, N),
    w*s f32 (N,) column scales."""
    t, d = x.shape
    m = w1q.shape[1]
    tp = round_up(t, block_t)
    if tp != t:
        x = jnp.pad(x, ((0, tp - t), (0, 0)))

    tile = pl.BlockSpec((block_t, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_mlp_int8_kernel, eps=eps, act=act),
        grid=(tp // block_t,),
        in_specs=[tile, const((1, d)), const((1, d)),
                  const((d, m)), const((1, m)), const((1, m)),
                  const((m, d)), const((1, d)), const((1, d))],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((tp, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * tp * d * m,
            bytes_accessed=2 * tp * d * x.dtype.itemsize + 2 * d * m,
            transcendentals=2 * tp * m),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            **({"vmem_limit_bytes": vmem_limit} if vmem_limit else {})),
        interpret=interpret,
    )(x, ln_scale.reshape(1, -1).astype(jnp.float32),
      ln_bias.reshape(1, -1).astype(jnp.float32),
      w1q, w1s.reshape(1, -1).astype(jnp.float32),
      b1.reshape(1, -1).astype(jnp.float32),
      w2q, w2s.reshape(1, -1).astype(jnp.float32),
      b2.reshape(1, -1).astype(jnp.float32))
    return out[:t]


def mlp_block_int8_ref(x, ln_scale, ln_bias, w1q, w1s, b1, w2q, w2s, b2,
                       eps: float = 1e-6, act: str = "gelu_tanh"):
    """Reference semantics (jnp, any backend)."""
    from .quant_fused import int8_linear_rowwise_ref
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
    h = int8_linear_rowwise_ref(xn, w1q, w1s, b1, act=act)
    y = int8_linear_rowwise_ref(h, w2q, w2s, b2)
    return x + y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Attention half
# ---------------------------------------------------------------------------

def score_slots_int8(n_heads: int, d: int, n_pad: int, kv_pad: int,
                     budget: int = 13 * 1024 * 1024,
                     batch: int = 1) -> tuple[int, int, bool, int]:
    """VMEM plan (imgs, head-group size, reuse_q, vmem_limit) for the int8
    attention kernel — the bf16 tier planner (ops/attn_block.attn_plan)
    with int8 weight residency (activations stay bf16).  Int8 weights
    halve the footprint, so more geometries land in the fast tiers."""
    from .attn_block import attn_plan
    plan = attn_plan(n_heads, d, n_pad, kv_pad, itemsize=2, batch=batch,
                     budget=budget, weight_itemsize=1)
    return plan.imgs, plan.n_sc, plan.reuse_q, plan.vmem_limit


def _attn_int8_kernel(x_ref, ls_ref, lb_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                      wo_ref, so_ref, bo_ref, o_ref, qkv_ref, scores_ref,
                      *maybe_ao, eps: float, scale: float, n_valid: int,
                      n_pad: int, kv_pad: int, n_heads: int, dh: int,
                      n_sc: int, imgs: int, pairs: bool = False):
    ao_ref = maybe_ao[0] if maybe_ao else None
    d = n_heads * dh
    x = x_ref[:].reshape(imgs * n_pad, d)

    xn = _ln_f32(x, ls_ref, lb_ref, eps)
    xq, sx = _row_quant(xn)
    # per-image GEMMs write straight into the K/V panel (no (rows, 3d)
    # intermediate + copy; see ops/attn_block.py)
    for b in range(imgs):
        r0, r1 = b * n_pad, (b + 1) * n_pad
        acc = jax.lax.dot_general(xq[r0:r1], wqkv_ref[:],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        qkv_b = (acc.astype(jnp.float32) * (sx[r0:r1] * sqkv_ref[0])
                 + bqkv_ref[0]).astype(x.dtype)
        if kv_pad != n_pad:
            qkv_ref[b, :n_pad] = qkv_b
            qkv_ref[b, n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d),
                                           x.dtype)
        else:
            qkv_ref[b] = qkv_b

    # Softmax diet + max-free softmax, same design as attn_block.py
    # bf16 score GEMMs head-pair-packed when eligible — shared with the
    # bf16 kernel (ops/attn_block._mha_loop; the int8 halves keep bf16
    # scores/PV per the measured int8-scores negative result)
    _mha_loop(x, qkv_ref, scores_ref, ao_ref, imgs=imgs, n_pad=n_pad,
              kv_pad=kv_pad, n_heads=n_heads, dh=dh, n_sc=n_sc,
              scale=scale, n_valid=n_valid, safe_softmax=False,
              pairs=pairs)

    if ao_ref is not None:
        src = ao_ref[:]
    else:
        src = qkv_ref[:, :n_pad, :d].reshape(imgs * n_pad, d)
    aoq, sa = _row_quant(src.astype(jnp.float32))
    acc_o = jax.lax.dot_general(aoq, wo_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    y = acc_o.astype(jnp.float32) * (sa * so_ref[0]) + bo_ref[0]
    o_ref[:] = (x + y.astype(x.dtype)).reshape(imgs, n_pad, d)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "n_valid",
                                             "interpret"))
def attn_block_int8(x, ln_scale, ln_bias, wqkvq, wqkvs, bqkv, woq, wos, bo,
                    num_heads: int, eps: float = 1e-6,
                    n_valid: int | None = None, interpret: bool = False):
    """x: (B, N, D) bf16 -> x + OutProj_int8(MHA(QKV_int8(LN(x))))."""
    b, n, d = x.shape
    dh = d // num_heads
    if n_valid is None:
        n_valid = n
    sub = pad_sublane(x.dtype)
    n_pad = round_up(n, sub)
    kv_pad = round_up(n, LANE)
    if n_pad != n:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])
    imgs, n_sc, reuse_q, vmem_limit = score_slots_int8(
        num_heads, d, n_pad, kv_pad, batch=b)
    if n_sc < 1:
        raise ValueError(f"attn_block_int8 does not fit VMEM at d={d}, "
                         f"seq={n}")

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_attn_int8_kernel, eps=eps,
                          scale=1.0 / (dh ** 0.5), n_valid=min(n_valid, n),
                          n_pad=n_pad, kv_pad=kv_pad, n_heads=num_heads,
                          dh=dh, n_sc=n_sc, imgs=imgs,
                          pairs=pair_pack_ok(dh, num_heads, n_sc)),
        grid=(b // imgs,),
        in_specs=[
            pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, d)), const((1, d)),
            const((d, 3 * d)), const((1, 3 * d)), const((1, 3 * d)),
            const((d, d)), const((1, d)), const((1, d)),
        ],
        out_specs=pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((imgs, kv_pad, 3 * d), x.dtype),
            (pltpu.VMEM((n_sc // 2, n_pad, 2 * kv_pad), jnp.float32)
             if pair_pack_ok(dh, num_heads, n_sc)
             else pltpu.VMEM((n_sc, n_pad, kv_pad), jnp.float32)),
        ] + ([] if reuse_q
             else [pltpu.VMEM((imgs * n_pad, d), x.dtype)]),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * d * (3 * d + d)
            + 4 * b * num_heads * n_pad * kv_pad * dh,
            bytes_accessed=2 * b * n_pad * d * x.dtype.itemsize
            + 4 * d * d,
            transcendentals=b * num_heads * n_pad * kv_pad),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            **({"vmem_limit_bytes": vmem_limit} if vmem_limit else {})),
        interpret=interpret,
    )(x, ln_scale.reshape(1, -1).astype(jnp.float32),
      ln_bias.reshape(1, -1).astype(jnp.float32),
      wqkvq, wqkvs.reshape(1, -1).astype(jnp.float32),
      bqkv.reshape(1, -1).astype(jnp.float32),
      woq, wos.reshape(1, -1).astype(jnp.float32),
      bo.reshape(1, -1).astype(jnp.float32))
    return out[:, :n, :]


def attn_block_int8_ref(x, ln_scale, ln_bias, wqkvq, wqkvs, bqkv, woq, wos,
                        bo, num_heads: int, eps: float = 1e-6):
    """Reference semantics (jnp, any backend)."""
    from .attention import mha_qkv_xla
    from .quant_fused import int8_linear_rowwise_ref
    b, n, d = x.shape
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
    qkv = int8_linear_rowwise_ref(xn.reshape(b * n, d), wqkvq, wqkvs,
                                  bqkv).astype(x.dtype).reshape(b, n, 3 * d)
    o = mha_qkv_xla(qkv, num_heads)
    y = int8_linear_rowwise_ref(
        o.reshape(b * n, d).astype(jnp.float32), woq, wos, bo)
    return x + y.reshape(b, n, d).astype(x.dtype)


# ---------------------------------------------------------------------------
# Stats-epilogue variants (round 3): the int8 halves are VPU-bound (the
# int8 MXU runs 2x while quant/LN/softmax VPU work stays), so removing
# each half's LN reduction preamble attacks the binding resource
# directly.  Same contract as the bf16 chain (ops/attn_block.py
# attn_block_stats_pallas / ops/fused_mlp.py fused_mlp_stats_pallas):
# consume the producer's (mu, rstd) stats tile, normalize elementwise,
# emit stats of this half's output from registers in the epilogue where
# the reduction overlaps the tail GEMM.
# ---------------------------------------------------------------------------

def _mlp_int8_stats_kernel(x_ref, st_ref, ls_ref, lb_ref, w1_ref, s1_ref,
                           b1_ref, w2_ref, s2_ref, b2_ref, o_ref,
                           *maybe_sto, eps: float, act: str,
                           emit_stats: bool):
    from .attn_block import STATS_LANES  # noqa: F401  (lane layout doc)
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    # stats tile may be bf16 (round-4 probe: halves the boundary HBM)
    mu = st_ref[:, 0:1].astype(jnp.float32)
    rstd = st_ref[:, 1:2].astype(jnp.float32)
    xn = (xf - mu) * rstd * ls_ref[0] + lb_ref[0]
    xq, sx = _row_quant(xn)
    acc1 = jax.lax.dot_general(xq, w1_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    h = acc1.astype(jnp.float32) * (sx * s1_ref[0]) + b1_ref[0]
    h = _apply_act(h, act)
    hq, sh = _row_quant(h)
    acc2 = jax.lax.dot_general(hq, w2_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    y = acc2.astype(jnp.float32) * (sh * s2_ref[0]) + b2_ref[0]
    out = x + y.astype(x.dtype)
    o_ref[:] = out
    if emit_stats:
        of = out.astype(jnp.float32)
        mu2 = jnp.mean(of, axis=-1, keepdims=True)
        var2 = jnp.maximum(
            jnp.mean(of * of, axis=-1, keepdims=True) - mu2 * mu2, 0.0)
        maybe_sto[0][:, 0:1] = mu2.astype(maybe_sto[0].dtype)
        maybe_sto[0][:, 1:2] = jax.lax.rsqrt(var2 + eps).astype(
            maybe_sto[0].dtype)


@functools.partial(jax.jit, static_argnames=("eps", "act", "block_t",
                                             "emit_stats", "interpret"))
def mlp_block_int8_stats(x, stats, ln_scale, ln_bias, w1q, w1s, b1, w2q,
                         w2s, b2, eps: float = 1e-6,
                         act: str = "gelu_tanh", block_t: int = 256,
                         emit_stats: bool = True,
                         interpret: bool = False):
    """Stats-epilogue int8 MLP half: (x, stats) -> (out, stats_out|None).
    ``stats`` is the (T, STATS_LANES) f32 tile from the producer half
    (col 0 = mu, col 1 = rstd per token row)."""
    from .attn_block import STATS_LANES
    t, d = x.shape
    m = w1q.shape[1]
    tp = round_up(t, block_t)
    if tp != t:
        x = jnp.pad(x, ((0, tp - t), (0, 0)))
        stats = jnp.pad(stats, ((0, tp - t), (0, 0)), constant_values=1.0)

    tile = pl.BlockSpec((block_t, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    stile = pl.BlockSpec((block_t, STATS_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    out_specs = [tile] + ([stile] if emit_stats else [])
    out_shape = [jax.ShapeDtypeStruct((tp, d), x.dtype)] + (
        [jax.ShapeDtypeStruct((tp, STATS_LANES), stats.dtype)]
        if emit_stats else [])
    outs = pl.pallas_call(
        functools.partial(_mlp_int8_stats_kernel, eps=eps, act=act,
                          emit_stats=emit_stats),
        grid=(tp // block_t,),
        in_specs=[tile, stile, const((1, d)), const((1, d)),
                  const((d, m)), const((1, m)), const((1, m)),
                  const((m, d)), const((1, d)), const((1, d))],
        out_specs=out_specs if emit_stats else out_specs[0],
        out_shape=out_shape if emit_stats else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=4 * tp * d * m,
            bytes_accessed=2 * tp * d * x.dtype.itemsize + 2 * d * m,
            transcendentals=2 * tp * m),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, stats, ln_scale.reshape(1, -1).astype(jnp.float32),
      ln_bias.reshape(1, -1).astype(jnp.float32),
      w1q, w1s.reshape(1, -1).astype(jnp.float32),
      b1.reshape(1, -1).astype(jnp.float32),
      w2q, w2s.reshape(1, -1).astype(jnp.float32),
      b2.reshape(1, -1).astype(jnp.float32))
    if emit_stats:
        return outs[0][:t], outs[1][:t]
    return outs[:t], None


def _attn_int8_stats_kernel(x_ref, st_ref, ls_ref, lb_ref, wqkv_ref,
                            sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
                            o_ref, *rest, eps: float, scale: float,
                            n_valid: int, n_pad: int, kv_pad: int,
                            n_heads: int, dh: int, n_sc: int, imgs: int,
                            emit_stats: bool, pairs: bool = False):
    from .attn_block import STATS_LANES
    if emit_stats:
        sto_ref, qkv_ref, scores_ref, ao_ref = rest
    else:
        sto_ref = None
        qkv_ref, scores_ref, ao_ref = rest
    d = n_heads * dh
    x = x_ref[:].reshape(imgs * n_pad, d)
    xf = x.astype(jnp.float32)
    mu = st_ref[:].reshape(imgs * n_pad, STATS_LANES)[:, 0:1].astype(
        jnp.float32)
    rstd = st_ref[:].reshape(imgs * n_pad, STATS_LANES)[:, 1:2].astype(
        jnp.float32)
    xn = (xf - mu) * rstd * ls_ref[0] + lb_ref[0]
    xq, sx = _row_quant(xn)
    for b in range(imgs):
        r0, r1 = b * n_pad, (b + 1) * n_pad
        acc = jax.lax.dot_general(xq[r0:r1], wqkv_ref[:],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        qkv_b = (acc.astype(jnp.float32) * (sx[r0:r1] * sqkv_ref[0])
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
    aoq, sa = _row_quant(ao_ref[:].astype(jnp.float32))
    acc_o = jax.lax.dot_general(aoq, wo_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    y = acc_o.astype(jnp.float32) * (sa * so_ref[0]) + bo_ref[0]
    out = x + y.astype(x.dtype)
    o_ref[:] = out.reshape(imgs, n_pad, d)
    if emit_stats:
        of = out.astype(jnp.float32)
        mu2 = jnp.mean(of, axis=-1, keepdims=True)
        var2 = jnp.maximum(
            jnp.mean(of * of, axis=-1, keepdims=True) - mu2 * mu2, 0.0)
        sto_ref[:, :, 0:1] = mu2.reshape(imgs, n_pad, 1).astype(
            sto_ref.dtype)
        sto_ref[:, :, 1:2] = jax.lax.rsqrt(
            var2 + eps).reshape(imgs, n_pad, 1).astype(sto_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "n_valid",
                                             "emit_stats", "interpret"))
def attn_block_int8_stats(x, stats, ln_scale, ln_bias, wqkvq, wqkvs, bqkv,
                          woq, wos, bo, num_heads: int, eps: float = 1e-6,
                          n_valid: int | None = None,
                          emit_stats: bool = True,
                          interpret: bool = False):
    """Stats-epilogue int8 attention half: (x, stats) ->
    (out, stats_out|None).  Requires the ao-scratch tier (reuse_q off)."""
    from .attn_block import STATS_LANES
    b, n, d = x.shape
    dh = d // num_heads
    if n_valid is None:
        n_valid = n
    sub = pad_sublane(x.dtype)
    n_pad = round_up(n, sub)
    kv_pad = round_up(n, LANE)
    assert x.shape[1] == n_pad == stats.shape[1], (
        "int8 stats chain runs on padded-residency tokens")
    imgs, n_sc, reuse_q, vmem_limit = score_slots_int8(
        num_heads, d, n_pad, kv_pad, batch=b)
    if n_sc < 1 or reuse_q:
        raise ValueError("int8 stats-epilogue attention needs an "
                         f"ao-scratch tier (d={d}, seq={n})")

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    xtile = pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    stile = pl.BlockSpec((imgs, n_pad, STATS_LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    out_specs = [xtile] + ([stile] if emit_stats else [])
    out_shape = [jax.ShapeDtypeStruct((b, n_pad, d), x.dtype)] + (
        [jax.ShapeDtypeStruct((b, n_pad, STATS_LANES), stats.dtype)]
        if emit_stats else [])
    outs = pl.pallas_call(
        functools.partial(_attn_int8_stats_kernel, eps=eps,
                          scale=1.0 / (dh ** 0.5),
                          n_valid=min(n_valid, n), n_pad=n_pad,
                          kv_pad=kv_pad, n_heads=num_heads, dh=dh,
                          n_sc=n_sc, imgs=imgs, emit_stats=emit_stats,
                          pairs=pair_pack_ok(dh, num_heads, n_sc)),
        grid=(b // imgs,),
        in_specs=[xtile, stile, const((1, d)), const((1, d)),
                  const((d, 3 * d)), const((1, 3 * d)), const((1, 3 * d)),
                  const((d, d)), const((1, d)), const((1, d))],
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
            + 4 * d * d,
            transcendentals=b * num_heads * n_pad * kv_pad),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            **({"vmem_limit_bytes": vmem_limit} if vmem_limit else {})),
        interpret=interpret,
    )(x, stats, ln_scale.reshape(1, -1).astype(jnp.float32),
      ln_bias.reshape(1, -1).astype(jnp.float32),
      wqkvq, wqkvs.reshape(1, -1).astype(jnp.float32),
      bqkv.reshape(1, -1).astype(jnp.float32),
      woq, wos.reshape(1, -1).astype(jnp.float32),
      bo.reshape(1, -1).astype(jnp.float32))
    if emit_stats:
        return outs[0][:, :], outs[1]
    return outs, None


# ---------------------------------------------------------------------------
# Static-scale (calibrated) variants — the reference-faithful fixed-point
# datapath.  The reference's quantized range is STATIC
# (/root/reference/def/defines.h:11-12: MAX_RANGE/MIN_RANGE are compile-
# time constants), while the kernels above quantize dynamically per row.
# The dynamic path's measured bound is "per-row quant VPU work the 2x-rate
# MXU cannot hide" (docs/perf.md round-4 int8 section): each half pays two
# absmax reduces + divides that exist ONLY because the scale is computed
# at runtime.  With calibrated per-tensor-per-layer activation scales
# (utils/calibrate.activation_absmax_stats) every one of those passes
# folds away:
#
#   * the LN affine absorbs 1/a_x  (ls' = ls/a_x, lb' = lb/a_x) — the
#     quantize step collapses to rint+saturate, zero extra passes;
#   * the dequant column scales absorb a_x (s' = a_x * s) host-side;
#   * the attention-output scale 1/a_ao rides the post-PV reciprocal
#     that already runs on the (rows, 1) denominator (_mha_loop
#     out_scale) — zero extra passes;
#   * the MLP hidden scale 1/a_h folds into the GELU emission constants
#     (_apply_act_scaled: the existing 0.5*h multiply becomes
#     (0.5/a_h)*h) — zero extra passes.
#
# Unlike dynamic row-quant (where |x|/sx <= 127 by construction), the
# saturating clip in _rint_i8 is LIVE: runtime activations may exceed the
# calibration absmax, and int8 saturation is the graceful-degradation
# contract (same semantics as the reference's fixed-point range clamp).
# Accuracy is gated by tests/test_int8_static.py (cosine vs f32).
# ---------------------------------------------------------------------------


def _rint_i8(x):
    """f32 already in the quant domain -> int8 (round + saturate)."""
    return jnp.clip(jnp.rint(x), -QMAX, QMAX).astype(jnp.int8)


def _apply_act_scaled(h, act: str, s):
    """act(h) * s with the scale folded into the emission constants —
    for gelu_tanh the existing 0.5*h multiply absorbs it (free); for
    relu, s > 0 commutes with max."""
    if act == "gelu_tanh":
        h2 = h * h
        u = h * (0.7978845608028654 + 0.035677408136300125 * h2)
        hh = (0.5 * s) * h
        return hh + hh * jnp.tanh(u)
    if act == "quick_gelu":
        return (s * h) * jax.nn.sigmoid(1.702 * h)
    if act == "relu":
        return jnp.maximum(s * h, 0.0)
    raise ValueError(act)


def _mlp_int8_static_kernel(qs_ref, x_ref, ls_ref, lb_ref, w1_ref, s1_ref,
                            b1_ref, w2_ref, s2_ref, b2_ref, o_ref, *,
                            eps: float, act: str):
    x = x_ref[:]
    # ls/lb are pre-folded with 1/a_x: LN emits straight in quant domain
    xn = _ln_f32(x, ls_ref, lb_ref, eps)
    xq = _rint_i8(xn)
    acc1 = jax.lax.dot_general(xq, w1_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    # s1 is pre-folded a_x * s1 -> h lands in the TRUE domain
    h = acc1.astype(jnp.float32) * s1_ref[0] + b1_ref[0]
    h = _apply_act_scaled(h, act, qs_ref[0, 0])    # * 1/a_h, free
    hq = _rint_i8(h)
    acc2 = jax.lax.dot_general(hq, w2_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    y = acc2.astype(jnp.float32) * s2_ref[0] + b2_ref[0]   # s2' = a_h*s2
    o_ref[:] = x + y.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "act", "block_t",
                                             "vmem_limit", "interpret"))
def mlp_block_int8_static(x, inv_ah, ln_scale, ln_bias, w1q, w1s, b1, w2q,
                          w2s, b2, eps: float = 1e-6,
                          act: str = "gelu_tanh", block_t: int = 256,
                          vmem_limit: int = 0,
                          interpret: bool = False):
    """Static-scale int8 MLP half.  Pre-folded arguments (see
    models/quantized.quantize_vit_static): ``ln_scale``/``ln_bias``
    carry 1/a_x, ``w1s`` carries a_x, ``w2s`` carries a_h; ``inv_ah``
    is the (1, 1) f32 hidden-activation quant scale 1/a_h."""
    t, d = x.shape
    m = w1q.shape[1]
    tp = round_up(t, block_t)
    if tp != t:
        x = jnp.pad(x, ((0, tp - t), (0, 0)))

    tile = pl.BlockSpec((block_t, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        functools.partial(_mlp_int8_static_kernel, eps=eps, act=act),
        grid=(tp // block_t,),
        in_specs=[smem, tile, const((1, d)), const((1, d)),
                  const((d, m)), const((1, m)), const((1, m)),
                  const((m, d)), const((1, d)), const((1, d))],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((tp, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * tp * d * m,
            bytes_accessed=2 * tp * d * x.dtype.itemsize + 2 * d * m,
            transcendentals=2 * tp * m),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            **({"vmem_limit_bytes": vmem_limit} if vmem_limit else {})),
        interpret=interpret,
    )(jnp.asarray(inv_ah, jnp.float32).reshape(1, 1),
      x, ln_scale.reshape(1, -1).astype(jnp.float32),
      ln_bias.reshape(1, -1).astype(jnp.float32),
      w1q, w1s.reshape(1, -1).astype(jnp.float32),
      b1.reshape(1, -1).astype(jnp.float32),
      w2q, w2s.reshape(1, -1).astype(jnp.float32),
      b2.reshape(1, -1).astype(jnp.float32))
    return out[:t]


def mlp_block_int8_static_ref(x, inv_ah, ln_scale, ln_bias, w1q, w1s, b1,
                              w2q, w2s, b2, eps: float = 1e-6,
                              act: str = "gelu_tanh"):
    """Reference semantics (jnp, any backend); same pre-folded args."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
    xq = _rint_i8(xn)
    acc1 = jax.lax.dot_general(xq, w1q, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    h = acc1.astype(jnp.float32) * w1s + b1
    h = _apply_act_scaled(h, act, jnp.float32(inv_ah))
    hq = _rint_i8(h)
    acc2 = jax.lax.dot_general(hq, w2q, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    y = acc2.astype(jnp.float32) * w2s + b2
    return x + y.astype(x.dtype)


def _attn_int8_static_kernel(qs_ref, x_ref, ls_ref, lb_ref, wqkv_ref,
                             sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
                             o_ref, qkv_ref, scores_ref, *maybe_ao,
                             eps: float, scale: float, n_valid: int,
                             n_pad: int, kv_pad: int, n_heads: int,
                             dh: int, n_sc: int, imgs: int,
                             pairs: bool = False):
    ao_ref = maybe_ao[0] if maybe_ao else None
    d = n_heads * dh
    x = x_ref[:].reshape(imgs * n_pad, d)

    # ls/lb pre-folded with 1/a_x -> rint+saturate only
    xn = _ln_f32(x, ls_ref, lb_ref, eps)
    xq = _rint_i8(xn)
    for b in range(imgs):
        r0, r1 = b * n_pad, (b + 1) * n_pad
        acc = jax.lax.dot_general(xq[r0:r1], wqkv_ref[:],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        # sqkv pre-folded a_x * sqkv -> TRUE-domain qkv
        qkv_b = (acc.astype(jnp.float32) * sqkv_ref[0]
                 + bqkv_ref[0]).astype(x.dtype)
        if kv_pad != n_pad:
            qkv_ref[b, :n_pad] = qkv_b
            qkv_ref[b, n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d),
                                           x.dtype)
        else:
            qkv_ref[b] = qkv_b

    # 1/a_ao rides the post-PV reciprocal (zero extra passes): the
    # attention output lands in scratch already in the quant domain
    _mha_loop(x, qkv_ref, scores_ref, ao_ref, imgs=imgs, n_pad=n_pad,
              kv_pad=kv_pad, n_heads=n_heads, dh=dh, n_sc=n_sc,
              scale=scale, n_valid=n_valid, safe_softmax=False,
              pairs=pairs, out_scale=qs_ref[0, 0])

    if ao_ref is not None:
        src = ao_ref[:]
    else:
        src = qkv_ref[:, :n_pad, :d].reshape(imgs * n_pad, d)
    aoq = _rint_i8(src.astype(jnp.float32))
    acc_o = jax.lax.dot_general(aoq, wo_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    y = acc_o.astype(jnp.float32) * so_ref[0] + bo_ref[0]  # so' = a_ao*so
    o_ref[:] = (x + y.astype(x.dtype)).reshape(imgs, n_pad, d)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "n_valid",
                                             "interpret"))
def attn_block_int8_static(x, inv_ao, ln_scale, ln_bias, wqkvq, wqkvs,
                           bqkv, woq, wos, bo, num_heads: int,
                           eps: float = 1e-6, n_valid: int | None = None,
                           interpret: bool = False):
    """Static-scale int8 attention half.  Pre-folded arguments (see
    models/quantized.quantize_vit_static); ``inv_ao`` is the (1, 1)
    f32 attention-output quant scale 1/a_ao."""
    b, n, d = x.shape
    dh = d // num_heads
    if n_valid is None:
        n_valid = n
    sub = pad_sublane(x.dtype)
    n_pad = round_up(n, sub)
    kv_pad = round_up(n, LANE)
    if n_pad != n:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])
    imgs, n_sc, reuse_q, vmem_limit = score_slots_int8(
        num_heads, d, n_pad, kv_pad, batch=b)
    if n_sc < 1:
        raise ValueError(f"attn_block_int8_static does not fit VMEM at "
                         f"d={d}, seq={n}")

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        functools.partial(_attn_int8_static_kernel, eps=eps,
                          scale=1.0 / (dh ** 0.5), n_valid=min(n_valid, n),
                          n_pad=n_pad, kv_pad=kv_pad, n_heads=num_heads,
                          dh=dh, n_sc=n_sc, imgs=imgs,
                          pairs=pair_pack_ok(dh, num_heads, n_sc)),
        grid=(b // imgs,),
        in_specs=[
            smem,
            pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, d)), const((1, d)),
            const((d, 3 * d)), const((1, 3 * d)), const((1, 3 * d)),
            const((d, d)), const((1, d)), const((1, d)),
        ],
        out_specs=pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((imgs, kv_pad, 3 * d), x.dtype),
            (pltpu.VMEM((n_sc // 2, n_pad, 2 * kv_pad), jnp.float32)
             if pair_pack_ok(dh, num_heads, n_sc)
             else pltpu.VMEM((n_sc, n_pad, kv_pad), jnp.float32)),
        ] + ([] if reuse_q
             else [pltpu.VMEM((imgs * n_pad, d), x.dtype)]),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * d * (3 * d + d)
            + 4 * b * num_heads * n_pad * kv_pad * dh,
            bytes_accessed=2 * b * n_pad * d * x.dtype.itemsize
            + 4 * d * d,
            transcendentals=b * num_heads * n_pad * kv_pad),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            **({"vmem_limit_bytes": vmem_limit} if vmem_limit else {})),
        interpret=interpret,
    )(jnp.asarray(inv_ao, jnp.float32).reshape(1, 1),
      x, ln_scale.reshape(1, -1).astype(jnp.float32),
      ln_bias.reshape(1, -1).astype(jnp.float32),
      wqkvq, wqkvs.reshape(1, -1).astype(jnp.float32),
      bqkv.reshape(1, -1).astype(jnp.float32),
      woq, wos.reshape(1, -1).astype(jnp.float32),
      bo.reshape(1, -1).astype(jnp.float32))
    return out[:, :n, :]


def _attn_int8s_static_kernel(sqk_ref, pvf_ref, x_ref, ls_ref, lb_ref,
                              wqkv_ref, sqkv_ref, bqkv_ref, wo_ref,
                              so_ref, bo_ref, o_ref, qkv_ref, scores_ref,
                              ao_ref, *, eps: float, scale: float,
                              n_valid: int, n_pad: int, kv_pad: int,
                              n_heads: int, dh: int, n_sc: int,
                              imgs: int):
    """Static-scale attention half with INT8 SCORES (round 5b): the
    q/k/v panel is emitted straight in the quant domain (sqkv/bqkv carry
    the per-third 1/s_q,1/s_k,1/s_v on top of the a_x1 fold), so QK^T
    and PV run on the int8 MXU; _mha_loop_int8s dequants with the two
    scalars and lands ao in the out-projection's quant domain."""
    from .attn_block import _mha_loop_int8s
    d = n_heads * dh
    x = x_ref[:].reshape(imgs * n_pad, d)

    xn = _ln_f32(x, ls_ref, lb_ref, eps)
    xq = _rint_i8(xn)
    for b in range(imgs):
        r0, r1 = b * n_pad, (b + 1) * n_pad
        acc = jax.lax.dot_general(xq[r0:r1], wqkv_ref[:],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        qkv_b = _rint_i8(acc.astype(jnp.float32) * sqkv_ref[0]
                         + bqkv_ref[0])
        if kv_pad != n_pad:
            qkv_ref[b, :n_pad] = qkv_b
            qkv_ref[b, n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d),
                                           jnp.int8)
        else:
            qkv_ref[b] = qkv_b

    _mha_loop_int8s(qkv_ref, scores_ref, ao_ref, sqk_ref[0, 0],
                    pvf_ref[0, 0], imgs=imgs, n_pad=n_pad, kv_pad=kv_pad,
                    n_heads=n_heads, dh=dh, n_sc=n_sc, scale=scale,
                    n_valid=n_valid)

    aoq = _rint_i8(ao_ref[:].astype(jnp.float32))
    acc_o = jax.lax.dot_general(aoq, wo_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    y = acc_o.astype(jnp.float32) * so_ref[0] + bo_ref[0]
    o_ref[:] = (x + y.astype(x.dtype)).reshape(imgs, n_pad, d)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "n_valid",
                                             "interpret"))
def attn_block_int8_static_scores(x, sc_qk, pv_fold, ln_scale, ln_bias,
                                  wqkvq, wqkv_qs, bqkv_qs, woq, wos, bo,
                                  num_heads: int, eps: float = 1e-6,
                                  n_valid: int | None = None,
                                  interpret: bool = False):
    """Static-scale int8 attention half with int8 score/PV GEMMs.
    ``wqkv_qs``/``bqkv_qs`` are the quant-domain panel scales from
    models/quantized._fold_static_scales; ``sc_qk``/``pv_fold`` the
    per-layer scalar dequants.  Requires dh == 64 with an even head
    count (the pair-packed geometry)."""
    b, n, d = x.shape
    dh = d // num_heads
    if dh != 64 or num_heads % 2:
        raise ValueError("int8-scores path requires dh=64, even heads")
    if n_valid is None:
        n_valid = n
    sub = pad_sublane(x.dtype)
    n_pad = round_up(n, sub)
    kv_pad = round_up(n, LANE)
    if n_pad != n:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])
    imgs, n_sc, reuse_q, vmem_limit = score_slots_int8(
        num_heads, d, n_pad, kv_pad, batch=b)
    if n_sc < 2:
        raise ValueError(f"attn_block_int8_static_scores does not fit "
                         f"VMEM at d={d}, seq={n}")
    n_sc -= n_sc % 2

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        functools.partial(_attn_int8s_static_kernel, eps=eps,
                          scale=1.0 / (dh ** 0.5), n_valid=min(n_valid, n),
                          n_pad=n_pad, kv_pad=kv_pad, n_heads=num_heads,
                          dh=dh, n_sc=n_sc, imgs=imgs),
        grid=(b // imgs,),
        in_specs=[
            smem, smem,
            pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, d)), const((1, d)),
            const((d, 3 * d)), const((1, 3 * d)), const((1, 3 * d)),
            const((d, d)), const((1, d)), const((1, d)),
        ],
        out_specs=pl.BlockSpec((imgs, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((imgs, kv_pad, 3 * d), jnp.int8),
            pltpu.VMEM((n_sc // 2, n_pad, 2 * kv_pad), jnp.float32),
            # f32 ao: quant-domain magnitudes (up to ~127) would lose
            # low bits in bf16 and drift the rint vs the f32 reference
            pltpu.VMEM((imgs * n_pad, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * d * (3 * d + d)
            + 4 * b * num_heads * n_pad * kv_pad * dh,
            bytes_accessed=2 * b * n_pad * d * x.dtype.itemsize
            + 4 * d * d,
            transcendentals=b * num_heads * n_pad * kv_pad),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            **({"vmem_limit_bytes": vmem_limit} if vmem_limit else {})),
        interpret=interpret,
    )(jnp.asarray(sc_qk, jnp.float32).reshape(1, 1),
      jnp.asarray(pv_fold, jnp.float32).reshape(1, 1),
      x, ln_scale.reshape(1, -1).astype(jnp.float32),
      ln_bias.reshape(1, -1).astype(jnp.float32),
      wqkvq, wqkv_qs.reshape(1, -1).astype(jnp.float32),
      bqkv_qs.reshape(1, -1).astype(jnp.float32),
      woq, wos.reshape(1, -1).astype(jnp.float32),
      bo.reshape(1, -1).astype(jnp.float32))
    return out[:, :n, :]


def attn_block_int8s_static_ref(x, sc_qk, pv_fold, ln_scale, ln_bias,
                                wqkvq, wqkv_qs, bqkv_qs, woq, wos, bo,
                                num_heads: int, eps: float = 1e-6,
                                n_valid: int | None = None):
    """Reference semantics of the int8-scores static path (jnp, any
    backend): int8 panel, scalar score dequant, normalized-then-
    quantized probabilities at the fixed 127 scale."""
    b, n, d = x.shape
    nh = num_heads
    dh = d // nh
    scale = 1.0 / (dh ** 0.5)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
    xq = _rint_i8(xn)
    acc = jax.lax.dot_general(xq.reshape(b * n, d), wqkvq,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    qkv_q = _rint_i8(acc.astype(jnp.float32) * wqkv_qs
                     + bqkv_qs).reshape(b, n, 3 * d)
    q = qkv_q[..., :d].reshape(b, n, nh, dh)
    k = qkv_q[..., d:2 * d].reshape(b, n, nh, dh)
    v = qkv_q[..., 2 * d:].reshape(b, n, nh, dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.int32),
                   k.astype(jnp.int32)).astype(jnp.float32)
    s = s * (jnp.float32(sc_qk) * scale)
    s = jnp.clip(s, -70.0, 80.0)
    if n_valid is not None and n_valid < n:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        s = jnp.where(col < n_valid, s, -1e30)
    e = jnp.exp(s)
    r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
    pq = jnp.clip(jnp.rint(e * (127.0 * r)), 0.0, 127.0)
    pv = jnp.einsum("bhqk,bkhd->bqhd", pq.astype(jnp.int32),
                    v.astype(jnp.int32)).astype(jnp.float32)
    ao = (pv * jnp.float32(pv_fold)).reshape(b, n, d)
    aoq = _rint_i8(ao)
    acc_o = jax.lax.dot_general(aoq.reshape(b * n, d), woq,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    y = acc_o.astype(jnp.float32) * wos + bo
    return x + y.reshape(b, n, d).astype(x.dtype)


def attn_block_int8_static_ref(x, inv_ao, ln_scale, ln_bias, wqkvq, wqkvs,
                               bqkv, woq, wos, bo, num_heads: int,
                               eps: float = 1e-6,
                               n_valid: int | None = None):
    """Reference semantics (jnp, any backend); same pre-folded args.
    Quantizes the attention output with the STATIC scale (matching the
    kernel), everything else exact f32."""
    from .attention import mha_qkv_xla
    b, n, d = x.shape
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
    xq = _rint_i8(xn)
    acc = jax.lax.dot_general(xq.reshape(b * n, d), wqkvq,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    qkv = (acc.astype(jnp.float32) * wqkvs + bqkv).astype(
        x.dtype).reshape(b, n, 3 * d)
    o = mha_qkv_xla(qkv, num_heads, n_valid=n_valid).astype(jnp.float32)
    oq = _rint_i8(o.reshape(b * n, d) * jnp.float32(inv_ao))
    acc_o = jax.lax.dot_general(oq, woq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    y = acc_o.astype(jnp.float32) * wos + bo
    return x + y.reshape(b, n, d).astype(x.dtype)
