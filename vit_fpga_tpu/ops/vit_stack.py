"""Whole-encoder mega-kernel for LATENCY serving: every transformer layer
runs inside ONE pallas_call with the layer index on the grid.

At batch 1 the per-layer kernels leave the chip idle: the step is
dominated by ~24 kernel launches and un-overlapped HBM weight fetches
(measured 671 µs p50 at ViT-B vs ~210 µs of pure weight traffic).  Here
the depth dimension IS the grid: each grid step's weight blocks are
indexed by layer, so Mosaic's revolving buffers prefetch layer i+1's
weights (~14 MB) while layer i computes, and the token state lives in a
VMEM scratch carried across grid steps ("arbitrary" semantics — scratch
persists).  One launch, fully pipelined weight streaming.

Geometry limit: one layer's weights x2 buffers + tokens + scores must fit
VMEM (~35 MB at ViT-B, under the raised 100 MB plan); batch is small by
design (latency mode, b*seq tokens VMEM-resident).
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

_NEG_INF = -1e30
_EXP_LO, _EXP_HI = -70.0, 80.0   # max-free softmax window (attn_block.py)


def _layer_math(x, l1s, l1b, wqkv, bqkv, wo, bo, l2s, l2b, w1, b1,
                w2, b2, qkv_s, sc, ao, *, eps: float, scale: float,
                n_valid: int, n_pad: int, kv_pad: int, n_heads: int,
                dh: int, batch: int, act: str, n_sc: int,
                pairs: bool = False):
    """One bf16/f32 transformer layer on (batch*n_pad, D) rows; weight
    args are the per-layer refs (block shape (1, ...)).  Shared by the
    layers-only and the full (embed+head) single-launch kernels."""
    d = n_heads * dh

    # ---- attention half ----
    xf = x.astype(jnp.float32)
    # one-pass LN variance, as in the per-layer kernels (attn_block.py)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * l1s[0]
          + l1b[0]).astype(x.dtype)
    qkv = (jnp.dot(xn, wqkv[0], preferred_element_type=jnp.float32)
           + bqkv[0]).astype(x.dtype)
    for b in range(batch):
        if kv_pad != n_pad:
            qkv_s[b, :n_pad] = qkv[b * n_pad:(b + 1) * n_pad]
            qkv_s[b, n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d), x.dtype)
        else:
            qkv_s[b] = qkv[b * n_pad:(b + 1) * n_pad]
    # Softmax diet + max-free softmax, same design as attn_block.py
    # (colbias mask in one fused pass, pow2 scale on the q tile,
    # exp(clip(s)) with no per-row max reduce, divide after PV).
    _mha_loop(x, qkv_s, sc, ao, imgs=batch, n_pad=n_pad, kv_pad=kv_pad,
              n_heads=n_heads, dh=dh, n_sc=n_sc, scale=scale,
              n_valid=n_valid, safe_softmax=False, pairs=pairs)
    y = jnp.dot(ao[:], wo[0], preferred_element_type=jnp.float32) + bo[0]
    xa = x + y.astype(x.dtype)

    # ---- MLP half ----
    xf2 = xa.astype(jnp.float32)
    mu2 = jnp.mean(xf2, axis=-1, keepdims=True)
    var2 = jnp.maximum(
        jnp.mean(xf2 * xf2, axis=-1, keepdims=True) - mu2 * mu2, 0.0)
    xn2 = ((xf2 - mu2) * jax.lax.rsqrt(var2 + eps) * l2s[0]
           + l2b[0]).astype(x.dtype)
    h = jnp.dot(xn2, w1[0], preferred_element_type=jnp.float32) + b1[0]
    if act == "gelu_tanh":
        # fma-reassociated tanh-GELU (see ops/fused_mlp._act)
        h2 = h * h
        u = h * (0.7978845608028654 + 0.035677408136300125 * h2)
        hh = 0.5 * h
        h = hh + hh * jnp.tanh(u)
    elif act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        raise ValueError(act)
    h = h.astype(x.dtype)
    y2 = jnp.dot(h, w2[0], preferred_element_type=jnp.float32) + b2[0]
    return xa + y2.astype(x.dtype)


def _stack_kernel(x_ref, l1s, l1b, wqkv, bqkv, wo, bo, l2s, l2b, w1, b1,
                  w2, b2, o_ref, tok, qkv_s, sc, ao, *, eps: float,
                  scale: float, n_valid: int, n_pad: int, kv_pad: int,
                  n_heads: int, dh: int, batch: int, depth: int,
                  act: str, n_sc: int, pairs: bool = False):
    i = pl.program_id(0)
    d = n_heads * dh

    @pl.when(i == 0)
    def _():
        tok[:] = x_ref[:].reshape(batch * n_pad, d)

    out = _layer_math(tok[:], l1s, l1b, wqkv, bqkv, wo, bo, l2s, l2b,
                      w1, b1, w2, b2, qkv_s, sc, ao, eps=eps, scale=scale,
                      n_valid=n_valid, n_pad=n_pad, kv_pad=kv_pad,
                      n_heads=n_heads, dh=dh, batch=batch, act=act,
                      n_sc=n_sc, pairs=pairs)
    tok[:] = out

    @pl.when(i == depth - 1)
    def _():
        o_ref[:] = out.reshape(batch, n_pad, d)


def stack_plan(n_heads: int, d: int, mlp_dim: int, n_pad: int,
               kv_pad: int, batch: int, itemsize: int = 2) -> int:
    """Score-slot count (head-group size) for the layers-on-grid kernel,
    or 0 if one layer's double-buffered weights + token state + hidden
    tile can't fit the raised VMEM plan at even 2 slots."""
    weights = (4 * d * d + 2 * d * mlp_dim) * itemsize * 2   # 2 buffers
    tokens = 2 * batch * n_pad * d * itemsize                # tok + ao
    panel = batch * kv_pad * 3 * d * itemsize
    hidden = batch * n_pad * mlp_dim * 4
    fixed = weights + tokens + panel + hidden
    slot = n_pad * kv_pad * 4
    budget = int(100 * 1024 * 1024 * 0.8)
    if fixed + 2 * slot > budget:
        return 0
    return min(n_heads, (budget - fixed) // slot)


def stack_fits(n_heads: int, d: int, mlp_dim: int, n_pad: int,
               kv_pad: int, batch: int, itemsize: int = 2) -> bool:
    return stack_plan(n_heads, d, mlp_dim, n_pad, kv_pad, batch,
                      itemsize) >= 2


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "act",
                                             "n_valid", "interpret"))
def vit_layers_pallas(x, blocks, num_heads: int, eps: float = 1e-6,
                      act: str = "gelu_tanh", n_valid: int | None = None,
                      interpret: bool = False):
    """x: (B, N, D) embedded tokens; blocks: the stacked per-layer param
    dict (models/vit.py layout).  Returns pre-final-LN tokens."""
    b, n, d = x.shape
    depth = blocks["wqkv"].shape[0]
    m = blocks["w1"].shape[2]
    dh = d // num_heads
    if n_valid is None:
        n_valid = n
    sub = pad_sublane(x.dtype)
    n_pad = round_up(n, sub)
    kv_pad = round_up(n, LANE)
    if n_pad != n:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    def per_layer(*trailing):
        return pl.BlockSpec((1,) + trailing,
                            lambda i: (i,) + tuple(0 for _ in trailing),
                            memory_space=pltpu.VMEM)

    n_sc = stack_plan(num_heads, d, m, n_pad, kv_pad, b,
                      x.dtype.itemsize)
    if n_sc < 2:
        raise ValueError(f"vit_layers does not fit VMEM at d={d}, seq={n}")
    dt = x.dtype
    f32 = jnp.float32

    def vec(a):
        # (L, k) -> (L, 1, k): Mosaic requires the last two block dims to
        # equal the array dims (or be (8,128)-aligned); a (1, k) block of
        # an (L, k) array violates that, a (1, 1, k) block of (L, 1, k)
        # doesn't.
        return a.reshape(a.shape[0], 1, a.shape[1])

    out = pl.pallas_call(
        functools.partial(_stack_kernel, eps=eps, scale=1.0 / (dh ** 0.5),
                          n_valid=min(n_valid, n), n_pad=n_pad,
                          kv_pad=kv_pad, n_heads=num_heads, dh=dh,
                          batch=b, depth=depth, act=act, n_sc=n_sc,
                          pairs=pair_pack_ok(dh, num_heads, n_sc)),
        grid=(depth,),
        in_specs=[const((b, n_pad, d)),
                  per_layer(1, d), per_layer(1, d),
                  per_layer(d, 3 * d), per_layer(1, 3 * d),
                  per_layer(d, d), per_layer(1, d),
                  per_layer(1, d), per_layer(1, d),
                  per_layer(d, m), per_layer(1, m),
                  per_layer(m, d), per_layer(1, d)],
        out_specs=const((b, n_pad, d)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), dt),
        scratch_shapes=[
            pltpu.VMEM((b * n_pad, d), dt),
            pltpu.VMEM((b, kv_pad, 3 * d), dt),
            (pltpu.VMEM((n_sc // 2, n_pad, 2 * kv_pad), f32)
             if pair_pack_ok(dh, num_heads, n_sc)
             else pltpu.VMEM((n_sc, n_pad, kv_pad), f32)),
            pltpu.VMEM((b * n_pad, d), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x,
      vec(blocks["ln1_scale"].astype(f32)),
      vec(blocks["ln1_bias"].astype(f32)),
      blocks["wqkv"].astype(dt), vec(blocks["bqkv"].astype(f32)),
      blocks["wo"].astype(dt), vec(blocks["bo"].astype(f32)),
      vec(blocks["ln2_scale"].astype(f32)),
      vec(blocks["ln2_bias"].astype(f32)),
      blocks["w1"].astype(dt), vec(blocks["b1"].astype(f32)),
      blocks["w2"].astype(dt), vec(blocks["b2"].astype(f32)))
    return out[:, :n, :]


# ---------------------------------------------------------------------------
# Int8 variant: same layers-on-grid design with int8 weights — at batch 1
# the encoder is weight-READ bound (172 MB bf16 at ViT-B), so int8
# weights halve the stream the kernel is waiting on.
# ---------------------------------------------------------------------------

def _layer_math_int8(x, l1s, l1b, wqkv, sqkv, bqkv, wo, so, bo,
                     l2s, l2b, w1, s1, b1, w2, s2, b2, qkv_s, sc, ao, *,
                     eps: float, scale: float, n_valid: int, n_pad: int,
                     kv_pad: int, n_heads: int, dh: int, batch: int,
                     act: str, pairs: bool = False):
    """One int8-weight transformer layer on (batch*n_pad, D) rows (int8
    GEMMs with in-kernel row quantization, bf16 scores/PV)."""
    from .quant_block import _row_quant
    d = n_heads * dh
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps) * l1s[0] + l1b[0]
    xq, sx = _row_quant(xn)
    acc = jax.lax.dot_general(xq, wqkv[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    qkv = (acc.astype(jnp.float32) * (sx * sqkv[0])
           + bqkv[0]).astype(x.dtype)
    for b in range(batch):
        if kv_pad != n_pad:
            qkv_s[b, :n_pad] = qkv[b * n_pad:(b + 1) * n_pad]
            qkv_s[b, n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d), x.dtype)
        else:
            qkv_s[b] = qkv[b * n_pad:(b + 1) * n_pad]
    _mha_loop(x, qkv_s, sc, ao, imgs=batch, n_pad=n_pad, kv_pad=kv_pad,
              n_heads=n_heads, dh=dh, n_sc=n_heads, scale=scale,
              n_valid=n_valid, safe_softmax=False, pairs=pairs)
    aoq, sa = _row_quant(ao[:].astype(jnp.float32))
    acc_o = jax.lax.dot_general(aoq, wo[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    y = acc_o.astype(jnp.float32) * (sa * so[0]) + bo[0]
    xa = x + y.astype(x.dtype)

    xf2 = xa.astype(jnp.float32)
    mu2 = jnp.mean(xf2, axis=-1, keepdims=True)
    var2 = jnp.maximum(
        jnp.mean(xf2 * xf2, axis=-1, keepdims=True) - mu2 * mu2, 0.0)
    xn2 = (xf2 - mu2) * jax.lax.rsqrt(var2 + eps) * l2s[0] + l2b[0]
    hq, sh = _row_quant(xn2)
    acc1 = jax.lax.dot_general(hq, w1[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    h = acc1.astype(jnp.float32) * (sh * s1[0]) + b1[0]
    if act == "gelu_tanh":
        # fma-reassociated tanh-GELU (see ops/fused_mlp._act)
        h2 = h * h
        u = h * (0.7978845608028654 + 0.035677408136300125 * h2)
        hh = 0.5 * h
        h = hh + hh * jnp.tanh(u)
    elif act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        raise ValueError(act)
    gq, sg = _row_quant(h)
    acc2 = jax.lax.dot_general(gq, w2[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    y2 = acc2.astype(jnp.float32) * (sg * s2[0]) + b2[0]
    return xa + y2.astype(x.dtype)


def _stack_int8_kernel(x_ref, l1s, l1b, wqkv, sqkv, bqkv, wo, so, bo,
                       l2s, l2b, w1, s1, b1, w2, s2, b2, o_ref, tok,
                       qkv_s, sc, ao, *, eps: float, scale: float,
                       n_valid: int, n_pad: int, kv_pad: int,
                       n_heads: int, dh: int, batch: int, depth: int,
                       act: str, pairs: bool = False):
    i = pl.program_id(0)
    d = n_heads * dh

    @pl.when(i == 0)
    def _():
        tok[:] = x_ref[:].reshape(batch * n_pad, d)

    out = _layer_math_int8(tok[:], l1s, l1b, wqkv, sqkv, bqkv, wo, so,
                           bo, l2s, l2b, w1, s1, b1, w2, s2, b2, qkv_s,
                           sc, ao, eps=eps, scale=scale, n_valid=n_valid,
                           n_pad=n_pad, kv_pad=kv_pad, n_heads=n_heads,
                           dh=dh, batch=batch, act=act, pairs=pairs)
    tok[:] = out

    @pl.when(i == depth - 1)
    def _():
        o_ref[:] = out.reshape(batch, n_pad, d)


# --- static-scale variant (round 5): calibrated per-tensor activation
# scales delete the per-row quant work the batch-1 path serializes on —
# the row absmax reduces + divides vanish (LN affine pre-folded with
# 1/s_x, 1/a_ao riding the post-PV reciprocal, 1/a_h folded into the
# GELU emission).  See ops/quant_block.py "Static-scale variants".


def _layer_math_int8_static(x, qao, qah, l1s, l1b, wqkv, sqkv, bqkv, wo,
                            so, bo, l2s, l2b, w1, s1, b1, w2, s2, b2,
                            qkv_s, sc, ao, *, eps: float, scale: float,
                            n_valid: int, n_pad: int, kv_pad: int,
                            n_heads: int, dh: int, batch: int, act: str,
                            pairs: bool = False):
    """One static-scale int8 layer on (batch*n_pad, D) rows; ``qao``/
    ``qah`` are the per-layer SMEM scalars 1/s_ao and 1/s_h."""
    from .quant_block import _apply_act_scaled, _rint_i8
    d = n_heads * dh
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    # l1s/l1b pre-folded with 1/s_x1 -> quantize is rint+saturate only
    xn = (xf - mu) * jax.lax.rsqrt(var + eps) * l1s[0] + l1b[0]
    xq = _rint_i8(xn)
    acc = jax.lax.dot_general(xq, wqkv[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    qkv = (acc.astype(jnp.float32) * sqkv[0] + bqkv[0]).astype(x.dtype)
    for b in range(batch):
        if kv_pad != n_pad:
            qkv_s[b, :n_pad] = qkv[b * n_pad:(b + 1) * n_pad]
            qkv_s[b, n_pad:] = jnp.zeros((kv_pad - n_pad, 3 * d), x.dtype)
        else:
            qkv_s[b] = qkv[b * n_pad:(b + 1) * n_pad]
    _mha_loop(x, qkv_s, sc, ao, imgs=batch, n_pad=n_pad, kv_pad=kv_pad,
              n_heads=n_heads, dh=dh, n_sc=n_heads, scale=scale,
              n_valid=n_valid, safe_softmax=False, pairs=pairs,
              out_scale=qao)
    aoq = _rint_i8(ao[:].astype(jnp.float32))
    acc_o = jax.lax.dot_general(aoq, wo[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    y = acc_o.astype(jnp.float32) * so[0] + bo[0]
    xa = x + y.astype(x.dtype)

    xf2 = xa.astype(jnp.float32)
    mu2 = jnp.mean(xf2, axis=-1, keepdims=True)
    var2 = jnp.maximum(
        jnp.mean(xf2 * xf2, axis=-1, keepdims=True) - mu2 * mu2, 0.0)
    xn2 = (xf2 - mu2) * jax.lax.rsqrt(var2 + eps) * l2s[0] + l2b[0]
    hq = _rint_i8(xn2)
    acc1 = jax.lax.dot_general(hq, w1[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    h = acc1.astype(jnp.float32) * s1[0] + b1[0]
    h = _apply_act_scaled(h, act, qah)
    gq = _rint_i8(h)
    acc2 = jax.lax.dot_general(gq, w2[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    y2 = acc2.astype(jnp.float32) * s2[0] + b2[0]
    return xa + y2.astype(x.dtype)


def _stack_int8_static_kernel(x_ref, qao_ref, qah_ref, l1s, l1b, wqkv,
                              sqkv, bqkv, wo, so, bo, l2s, l2b, w1, s1,
                              b1, w2, s2, b2, o_ref, tok, qkv_s, sc, ao,
                              *, eps: float, scale: float, n_valid: int,
                              n_pad: int, kv_pad: int, n_heads: int,
                              dh: int, batch: int, depth: int, act: str,
                              pairs: bool = False):
    i = pl.program_id(0)
    d = n_heads * dh

    @pl.when(i == 0)
    def _():
        tok[:] = x_ref[:].reshape(batch * n_pad, d)

    out = _layer_math_int8_static(
        tok[:], qao_ref[i, 0], qah_ref[i, 0], l1s, l1b, wqkv, sqkv, bqkv,
        wo, so, bo, l2s, l2b, w1, s1, b1, w2, s2, b2, qkv_s, sc, ao,
        eps=eps, scale=scale, n_valid=n_valid, n_pad=n_pad, kv_pad=kv_pad,
        n_heads=n_heads, dh=dh, batch=batch, act=act, pairs=pairs)
    tok[:] = out

    @pl.when(i == depth - 1)
    def _():
        o_ref[:] = out.reshape(batch, n_pad, d)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "act",
                                             "n_valid", "interpret"))
def vit_layers_int8_static_pallas(x, qblocks, num_heads: int,
                                  eps: float = 1e-6,
                                  act: str = "gelu_tanh",
                                  n_valid: int | None = None,
                                  interpret: bool = False):
    """Static-scale int8 layers-on-grid encoder: ``qblocks`` is the
    quantize_vit_static blocks dict (pre-folded scales + per-layer
    inv_ao/inv_ah).  Returns pre-final-LN tokens."""
    b, n, d = x.shape
    depth = qblocks["wqkv_q"].shape[0]
    m = qblocks["w1_q"].shape[2]
    dh = d // num_heads
    if n_valid is None:
        n_valid = n
    sub = pad_sublane(x.dtype)
    n_pad = round_up(n, sub)
    kv_pad = round_up(n, LANE)
    if n_pad != n:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    def per_layer(*tr):
        return pl.BlockSpec((1,) + tr,
                            lambda i: (i,) + tuple(0 for _ in tr),
                            memory_space=pltpu.VMEM)

    # whole (depth, 1) scalar table stays SMEM-resident; the kernel
    # indexes row program_id(0).  A (1, 1) per-layer block would violate
    # the TPU lowering's block-shape rule (last two dims divisible by
    # 8/128 or equal to the array's), which interpret mode doesn't check.
    smem_table = pl.BlockSpec((depth, 1), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)

    def vec(a):
        return a.reshape(a.shape[0], 1, a.shape[1]).astype(jnp.float32)

    dt = x.dtype
    out = pl.pallas_call(
        functools.partial(_stack_int8_static_kernel, eps=eps,
                          scale=1.0 / (dh ** 0.5),
                          n_valid=min(n_valid, n), n_pad=n_pad,
                          kv_pad=kv_pad, n_heads=num_heads, dh=dh,
                          # pairs stay off: see vit_layers_int8_pallas
                          batch=b, depth=depth, act=act, pairs=False),
        grid=(depth,),
        in_specs=[const((b, n_pad, d)),
                  smem_table, smem_table,
                  per_layer(1, d), per_layer(1, d),
                  per_layer(d, 3 * d), per_layer(1, 3 * d),
                  per_layer(1, 3 * d),
                  per_layer(d, d), per_layer(1, d), per_layer(1, d),
                  per_layer(1, d), per_layer(1, d),
                  per_layer(d, m), per_layer(1, m), per_layer(1, m),
                  per_layer(m, d), per_layer(1, d), per_layer(1, d)],
        out_specs=const((b, n_pad, d)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), dt),
        scratch_shapes=[
            pltpu.VMEM((b * n_pad, d), dt),
            pltpu.VMEM((b, kv_pad, 3 * d), dt),
            pltpu.VMEM((num_heads, n_pad, kv_pad), jnp.float32),
            pltpu.VMEM((b * n_pad, d), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x,
      qblocks["inv_ao"].astype(jnp.float32),
      qblocks["inv_ah"].astype(jnp.float32),
      vec(qblocks["ln1_scale"]), vec(qblocks["ln1_bias"]),
      qblocks["wqkv_q"], vec(qblocks["wqkv_s"]), vec(qblocks["bqkv"]),
      qblocks["wo_q"], vec(qblocks["wo_s"]), vec(qblocks["bo"]),
      vec(qblocks["ln2_scale"]), vec(qblocks["ln2_bias"]),
      qblocks["w1_q"], vec(qblocks["w1_s"]), vec(qblocks["b1"]),
      qblocks["w2_q"], vec(qblocks["w2_s"]), vec(qblocks["b2"]))
    return out[:, :n, :]


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "act",
                                             "n_valid", "interpret"))
def vit_layers_int8_pallas(x, qblocks, num_heads: int, eps: float = 1e-6,
                           act: str = "gelu_tanh",
                           n_valid: int | None = None,
                           interpret: bool = False):
    """Int8 layers-on-grid encoder: ``qblocks`` is the quantize_vit_fast
    blocks dict (int8 weights + f32 column scales).  Returns pre-final-LN
    tokens."""
    b, n, d = x.shape
    depth = qblocks["wqkv_q"].shape[0]
    m = qblocks["w1_q"].shape[2]
    dh = d // num_heads
    if n_valid is None:
        n_valid = n
    sub = pad_sublane(x.dtype)
    n_pad = round_up(n, sub)
    kv_pad = round_up(n, LANE)
    if n_pad != n:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    def per_layer(*tr):
        return pl.BlockSpec((1,) + tr,
                            lambda i: (i,) + tuple(0 for _ in tr),
                            memory_space=pltpu.VMEM)

    def vec(a):
        return a.reshape(a.shape[0], 1, a.shape[1]).astype(jnp.float32)

    dt = x.dtype
    out = pl.pallas_call(
        functools.partial(_stack_int8_kernel, eps=eps,
                          scale=1.0 / (dh ** 0.5),
                          n_valid=min(n_valid, n), n_pad=n_pad,
                          kv_pad=kv_pad, n_heads=num_heads, dh=dh,
                          # batch-1 int8 is VPU-bound: the pair panels'
                          # select/concat passes are exposed (p50 181.6
                          # -> 190.0 us measured) — pairs stay off here
                          batch=b, depth=depth, act=act, pairs=False),
        grid=(depth,),
        in_specs=[const((b, n_pad, d)),
                  per_layer(1, d), per_layer(1, d),
                  per_layer(d, 3 * d), per_layer(1, 3 * d),
                  per_layer(1, 3 * d),
                  per_layer(d, d), per_layer(1, d), per_layer(1, d),
                  per_layer(1, d), per_layer(1, d),
                  per_layer(d, m), per_layer(1, m), per_layer(1, m),
                  per_layer(m, d), per_layer(1, d), per_layer(1, d)],
        out_specs=const((b, n_pad, d)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), dt),
        scratch_shapes=[
            pltpu.VMEM((b * n_pad, d), dt),
            pltpu.VMEM((b, kv_pad, 3 * d), dt),
            pltpu.VMEM((num_heads, n_pad, kv_pad), jnp.float32),
            pltpu.VMEM((b * n_pad, d), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x,
      vec(qblocks["ln1_scale"]), vec(qblocks["ln1_bias"]),
      qblocks["wqkv_q"], vec(qblocks["wqkv_s"]), vec(qblocks["bqkv"]),
      qblocks["wo_q"], vec(qblocks["wo_s"]), vec(qblocks["bo"]),
      vec(qblocks["ln2_scale"]), vec(qblocks["ln2_bias"]),
      qblocks["w1_q"], vec(qblocks["w1_s"]), vec(qblocks["b1"]),
      qblocks["w2_q"], vec(qblocks["w2_s"]), vec(qblocks["b2"]))
    return out[:, :n, :]


# ---------------------------------------------------------------------------
# Full-model single-launch kernels (round 3): patch-embed GEMM + every
# transformer layer + final-LN + classifier head in ONE pallas_call.
# The BASELINE north star asks for "a raw image tensor goes in and class
# logits come out in one XLA program"; at batch 1 this also deletes the
# separate embed and head kernel launches (~28 us of the 195 us int8
# p50 — experiments/perf_int8_lat_ablate.py).  The embed inputs (padded
# patch matrix, folded posb table — see ops/patch_embed.py) and the head
# weights ride constant-index BlockSpecs, so they are fetched once; the
# layer weights keep the per-layer revolving-buffer stream.
# ---------------------------------------------------------------------------


def _stack_full_kernel(pp_ref, wp, posb, l1s, l1b, wqkv, bqkv, wo, bo,
                       l2s, l2b, w1, b1, w2, b2, lfs, lfb, wh, bh,
                       o_ref, tok, qkv_s, sc, ao, *, eps: float,
                       scale: float, n_valid: int, n_pad: int,
                       kv_pad: int, n_heads: int, dh: int, batch: int,
                       depth: int, act: str, n_sc: int, npre: int, pairs: bool = False):
    i = pl.program_id(0)
    d = n_heads * dh

    @pl.when(i == 0)
    def _():
        for b in range(batch):
            acc = jnp.dot(pp_ref[b], wp[:],
                          preferred_element_type=jnp.float32)
            tok[b * n_pad:(b + 1) * n_pad] = (acc + posb[:]).astype(
                tok.dtype)

    out = _layer_math(tok[:], l1s, l1b, wqkv, bqkv, wo, bo, l2s, l2b,
                      w1, b1, w2, b2, qkv_s, sc, ao, eps=eps, scale=scale,
                      n_valid=n_valid, n_pad=n_pad, kv_pad=kv_pad,
                      n_heads=n_heads, dh=dh, batch=batch, act=act,
                      n_sc=n_sc, pairs=pairs)
    tok[:] = out

    @pl.when(i == depth - 1)
    def _():
        for b in range(batch):
            row = out[b * n_pad:b * n_pad + npre].astype(jnp.float32)
            mu = jnp.mean(row, axis=-1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(row * row, axis=-1, keepdims=True) - mu * mu,
                0.0)
            xn = (row - mu) * jax.lax.rsqrt(var + eps) * lfs[:] + lfb[:]
            logits = jnp.dot(xn.astype(wh.dtype), wh[:],
                             preferred_element_type=jnp.float32) + bh[:]
            o_ref[b * npre:(b + 1) * npre] = logits


def _stack_full_int8_kernel(pp_ref, wpq, wps, posb, l1s, l1b, wqkv, sqkv,
                            bqkv, wo, so, bo, l2s, l2b, w1, s1, b1, w2,
                            s2, b2, lfs, lfb, whq, whs, bh, o_ref, tok,
                            qkv_s, sc, ao, *, eps: float, scale: float,
                            n_valid: int, n_pad: int, kv_pad: int,
                            n_heads: int, dh: int, batch: int,
                            depth: int, act: str, npre: int,
                            pairs: bool = False):
    from .quant_block import _row_quant
    i = pl.program_id(0)
    d = n_heads * dh

    @pl.when(i == 0)
    def _():
        for b in range(batch):
            xq, sx = _row_quant(pp_ref[b].astype(jnp.float32))
            acc = jax.lax.dot_general(
                xq, wpq[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            tok[b * n_pad:(b + 1) * n_pad] = (
                acc.astype(jnp.float32) * (sx * wps[:]) + posb[:]
            ).astype(tok.dtype)

    out = _layer_math_int8(tok[:], l1s, l1b, wqkv, sqkv, bqkv, wo, so,
                           bo, l2s, l2b, w1, s1, b1, w2, s2, b2, qkv_s,
                           sc, ao, eps=eps, scale=scale, n_valid=n_valid,
                           n_pad=n_pad, kv_pad=kv_pad, n_heads=n_heads,
                           dh=dh, batch=batch, act=act, pairs=pairs)
    tok[:] = out

    @pl.when(i == depth - 1)
    def _():
        for b in range(batch):
            row = out[b * n_pad:b * n_pad + npre].astype(jnp.float32)
            mu = jnp.mean(row, axis=-1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(row * row, axis=-1, keepdims=True) - mu * mu,
                0.0)
            xn = (row - mu) * jax.lax.rsqrt(var + eps) * lfs[:] + lfb[:]
            rq, rs = _row_quant(xn)
            acc = jax.lax.dot_general(
                rq, whq[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[b * npre:(b + 1) * npre] = (
                acc.astype(jnp.float32) * (rs * whs[:]) + bh[:])


def stack_full_plan(n_heads: int, d: int, mlp_dim: int, n_pad: int,
                    kv_pad: int, batch: int, p3: int, cls_pad: int,
                    itemsize: int = 2) -> int:
    """Score-slot count for the full-model kernel (stack_plan + the
    once-fetched embed/head blocks), or 0 if it can't fit."""
    weights = (4 * d * d + 2 * d * mlp_dim) * itemsize * 2
    tokens = 2 * batch * n_pad * d * itemsize
    panel = batch * kv_pad * 3 * d * itemsize
    hidden = batch * n_pad * mlp_dim * 4
    embed = (batch * n_pad * p3 * itemsize   # pp (fetched once)
             + p3 * d * itemsize             # wp
             + n_pad * d * 4)                # posb f32
    head = d * cls_pad * itemsize + cls_pad * 4
    fixed = weights + tokens + panel + hidden + embed + head
    slot = n_pad * kv_pad * 4
    budget = int(100 * 1024 * 1024 * 0.8)
    if fixed + 2 * slot > budget:
        return 0
    return min(n_heads, (budget - fixed) // slot)


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "eps", "act", "n_tokens", "npre", "interpret"))
def vit_full_pallas(patches_padded, wp, posb, blocks, lf_scale, lf_bias,
                    wh, bh, num_heads: int, eps: float = 1e-6,
                    act: str = "gelu_tanh", n_tokens: int = 197,
                    npre: int = 1, interpret: bool = False):
    """(B, n_pad, P*P*3) zero-prefix-row patches -> (B*npre, cls_pad)
    f32 logits, one kernel launch.  ``posb`` is the (n_pad, D) f32 fold
    of embed bias / CLS / pos (ops/patch_embed.py); ``wh``/``bh`` are
    the head weights padded to a 128-multiple class count."""
    b, n_pad, p3 = patches_padded.shape
    d = wp.shape[-1]
    depth = blocks["wqkv"].shape[0]
    m = blocks["w1"].shape[2]
    dh = d // num_heads
    kv_pad = round_up(n_tokens, LANE)
    cls_pad = wh.shape[-1]
    dt = wp.dtype
    f32 = jnp.float32

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    def per_layer(*tr):
        return pl.BlockSpec((1,) + tr,
                            lambda i: (i,) + tuple(0 for _ in tr),
                            memory_space=pltpu.VMEM)

    def vec(a):
        return a.reshape(a.shape[0], 1, a.shape[1])

    n_sc = stack_full_plan(num_heads, d, m, n_pad, kv_pad, b, p3,
                           cls_pad, dt.itemsize)
    if n_sc < 2:
        raise ValueError(
            f"vit_full does not fit VMEM at d={d}, n_pad={n_pad}")
    out = pl.pallas_call(
        functools.partial(_stack_full_kernel, eps=eps,
                          scale=1.0 / (dh ** 0.5),
                          n_valid=min(n_tokens, kv_pad), n_pad=n_pad,
                          kv_pad=kv_pad, n_heads=num_heads, dh=dh,
                          batch=b, depth=depth, act=act, n_sc=n_sc,
                          npre=npre,
                          pairs=pair_pack_ok(dh, num_heads, n_sc)),
        grid=(depth,),
        in_specs=[const((b, n_pad, p3)), const((p3, d)),
                  const((n_pad, d)),
                  per_layer(1, d), per_layer(1, d),
                  per_layer(d, 3 * d), per_layer(1, 3 * d),
                  per_layer(d, d), per_layer(1, d),
                  per_layer(1, d), per_layer(1, d),
                  per_layer(d, m), per_layer(1, m),
                  per_layer(m, d), per_layer(1, d),
                  const((1, d)), const((1, d)),
                  const((d, cls_pad)), const((1, cls_pad))],
        out_specs=const((b * npre, cls_pad)),
        out_shape=jax.ShapeDtypeStruct((b * npre, cls_pad), f32),
        scratch_shapes=[
            pltpu.VMEM((b * n_pad, d), dt),
            pltpu.VMEM((b, kv_pad, 3 * d), dt),
            (pltpu.VMEM((n_sc // 2, n_pad, 2 * kv_pad), f32)
             if pair_pack_ok(dh, num_heads, n_sc)
             else pltpu.VMEM((n_sc, n_pad, kv_pad), f32)),
            pltpu.VMEM((b * n_pad, d), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(patches_padded.astype(dt), wp, posb.astype(f32),
      vec(blocks["ln1_scale"].astype(f32)),
      vec(blocks["ln1_bias"].astype(f32)),
      blocks["wqkv"].astype(dt), vec(blocks["bqkv"].astype(f32)),
      blocks["wo"].astype(dt), vec(blocks["bo"].astype(f32)),
      vec(blocks["ln2_scale"].astype(f32)),
      vec(blocks["ln2_bias"].astype(f32)),
      blocks["w1"].astype(dt), vec(blocks["b1"].astype(f32)),
      blocks["w2"].astype(dt), vec(blocks["b2"].astype(f32)),
      lf_scale.reshape(1, d).astype(f32), lf_bias.reshape(1, d).astype(f32),
      wh.astype(dt), bh.reshape(1, cls_pad).astype(f32))
    return out


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "eps", "act", "n_tokens", "npre", "interpret"))
def vit_full_int8_pallas(patches_padded, wpq, wps, posb, qblocks,
                         lf_scale, lf_bias, whq, whs, bh,
                         num_heads: int, eps: float = 1e-6,
                         act: str = "gelu_tanh", n_tokens: int = 197,
                         npre: int = 1, interpret: bool = False):
    """Int8 full-model single launch: embed/layers/head all run int8
    GEMMs with in-kernel row quantization (bf16 scores/PV)."""
    b, n_pad, p3 = patches_padded.shape
    d = wpq.shape[-1]
    depth = qblocks["wqkv_q"].shape[0]
    m = qblocks["w1_q"].shape[2]
    dh = d // num_heads
    kv_pad = round_up(n_tokens, LANE)
    cls_pad = whq.shape[-1]
    dt = jnp.bfloat16
    f32 = jnp.float32

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    def per_layer(*tr):
        return pl.BlockSpec((1,) + tr,
                            lambda i: (i,) + tuple(0 for _ in tr),
                            memory_space=pltpu.VMEM)

    def vec(a):
        return a.reshape(a.shape[0], 1, a.shape[1]).astype(f32)

    n_sc = stack_full_plan(num_heads, d, m, n_pad, kv_pad, b, p3,
                           cls_pad, 1)
    if n_sc < 2:
        raise ValueError(
            f"vit_full_int8 does not fit VMEM at d={d}, n_pad={n_pad}")
    out = pl.pallas_call(
        functools.partial(_stack_full_int8_kernel, eps=eps,
                          scale=1.0 / (dh ** 0.5),
                          n_valid=min(n_tokens, kv_pad), n_pad=n_pad,
                          kv_pad=kv_pad, n_heads=num_heads, dh=dh,
                          batch=b, depth=depth, act=act, npre=npre,
                          pairs=False),  # see vit_layers_int8_pallas
        grid=(depth,),
        in_specs=[const((b, n_pad, p3)), const((p3, d)),
                  const((1, d)), const((n_pad, d)),
                  per_layer(1, d), per_layer(1, d),
                  per_layer(d, 3 * d), per_layer(1, 3 * d),
                  per_layer(1, 3 * d),
                  per_layer(d, d), per_layer(1, d), per_layer(1, d),
                  per_layer(1, d), per_layer(1, d),
                  per_layer(d, m), per_layer(1, m), per_layer(1, m),
                  per_layer(m, d), per_layer(1, d), per_layer(1, d),
                  const((1, d)), const((1, d)),
                  const((d, cls_pad)), const((1, cls_pad)),
                  const((1, cls_pad))],
        out_specs=const((b * npre, cls_pad)),
        out_shape=jax.ShapeDtypeStruct((b * npre, cls_pad), f32),
        scratch_shapes=[
            pltpu.VMEM((b * n_pad, d), dt),
            pltpu.VMEM((b, kv_pad, 3 * d), dt),
            pltpu.VMEM((num_heads, n_pad, kv_pad), f32),
            pltpu.VMEM((b * n_pad, d), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(patches_padded.astype(dt), wpq,
      wps.reshape(1, d).astype(f32), posb.astype(f32),
      vec(qblocks["ln1_scale"]), vec(qblocks["ln1_bias"]),
      qblocks["wqkv_q"], vec(qblocks["wqkv_s"]), vec(qblocks["bqkv"]),
      qblocks["wo_q"], vec(qblocks["wo_s"]), vec(qblocks["bo"]),
      vec(qblocks["ln2_scale"]), vec(qblocks["ln2_bias"]),
      qblocks["w1_q"], vec(qblocks["w1_s"]), vec(qblocks["b1"]),
      qblocks["w2_q"], vec(qblocks["w2_s"]), vec(qblocks["b2"]),
      lf_scale.reshape(1, d).astype(f32),
      lf_bias.reshape(1, d).astype(f32),
      whq, whs.reshape(1, cls_pad).astype(f32),
      bh.reshape(1, cls_pad).astype(f32))
    return out
