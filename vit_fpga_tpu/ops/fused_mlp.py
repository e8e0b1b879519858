"""Fused transformer-MLP Pallas kernel: LN -> W1 -> GELU -> W2 -> +residual.

One grid cell processes a tile of tokens end-to-end while both weight
matrices stay VMEM-resident across the whole sweep (their block index maps
are constant, so Mosaic's revolving buffers fetch them once).  The
intermediate (tile, mlp_dim) activation never touches HBM — that is the
fusion XLA cannot fully do across two GEMMs with a transcendental between
them.

Semantics match models/vit.py's MLP half exactly: f32 LayerNorm
statistics, erf-GELU (or the cfg's variant), bf16 GEMMs with f32
accumulation, residual add in the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import round_up


def _act(h, kind: str):
    if kind == "gelu":
        # NOTE: compiles only in interpret mode / CPU — Mosaic has no
        # erf/erfc lowering. On TPU pass act="gelu_tanh" (in bf16 the
        # difference is far below representable precision).
        return jax.nn.gelu(h, approximate=False)
    if kind == "gelu_tanh":
        # tanh-GELU, fma-reassociated: u = h*(A + B*h^2) instead of
        # sqrt(2/pi)*(h + 0.044715*h^3); 0.5h + 0.5h*t instead of
        # 0.5*h*(1+t).  Same function as jax.nn.gelu(approximate=True)
        # (reassociation only — <1e-7 relative drift in f32, below a
        # bf16 ulp), a few fewer VPU passes than jax.nn.gelu's emission
        # (experiments/perf_gelu_variants.py, perf_mlp_gelu.py: ~-0.04
        # ms / 12 ViT-B layers, 4/4 rounds).
        h2 = h * h
        u = h * (0.7978845608028654 + 0.035677408136300125 * h2)
        hh = 0.5 * h
        return hh + hh * jnp.tanh(u)
    if kind == "quick_gelu":
        return h * jax.nn.sigmoid(1.702 * h)
    if kind == "relu":
        return jnp.maximum(h, 0.0)
    raise ValueError(kind)


def _mlp_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, *, eps: float, act: str, residual: bool = True):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * s_ref[0] +
          b_ref[0]).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[0]
    h = _act(h, act).astype(x.dtype)
    y = jnp.dot(h, w2_ref[:],
                preferred_element_type=jnp.float32) + b2_ref[0]
    # residual=False: tensor-parallel partial output (mlp_dim columns
    # split across devices; psum + residual happen once, outside)
    o_ref[:] = (x + y.astype(x.dtype)) if residual else y.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "act", "block_t",
                                             "vmem_limit", "residual",
                                             "interpret"))
def fused_mlp_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2,
                     eps: float = 1e-6, act: str = "gelu",
                     block_t: int = 512, vmem_limit: int = 0,
                     residual: bool = True,
                     interpret: bool = False):
    """x: (T, D) tokens. Returns x + MLP(LN(x)), matching the model block.

    block_t=512 measured fastest at ViT-B geometry on v5e (185 vs 172 TF/s
    at 256; 1024/2048 regress — bigger tiles starve cross-cell DMA
    pipelining).  Mosaic streams the (block_t, M) f32 hidden tile through
    the activation without materializing it, so the VMEM high-water mark
    stays well under the limit even at 512.

    ``vmem_limit`` > 0 raises the compiler's scoped-VMEM plan (a default,
    not hardware — see ops/attn_block.py) so geometries whose w1+w2
    exceed the 16 MB budget (CLIP-L, ViT-L) can still run unchunked.
    """
    t, d = x.shape
    m = w1.shape[1]
    tp = round_up(t, block_t)
    if tp != t:
        x = jnp.pad(x, ((0, tp - t), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps, act=act, residual=residual),
        grid=(tp // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * tp * d * m,
            bytes_accessed=(2 * tp * d + 2 * d * m) * x.dtype.itemsize,
            transcendentals=tp * m),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            **({"vmem_limit_bytes": vmem_limit} if vmem_limit else {})),
        interpret=interpret,
    )(x, ln_scale.reshape(1, -1).astype(jnp.float32),
      ln_bias.reshape(1, -1).astype(jnp.float32),
      w1.astype(x.dtype), b1.reshape(1, -1).astype(jnp.float32),
      w2.astype(x.dtype), b2.reshape(1, -1).astype(jnp.float32))
    return out[:t]


def _mlp_chunk_kernel(x_ref, base_ref, s_ref, b_ref, w1_ref, b1_ref,
                      w2_ref, b2_ref, o_ref, *, eps: float, act: str,
                      add_b2: bool):
    """One mlp_dim chunk: o = base + act(LN(x) @ w1c + b1c) @ w2c [+ b2].

    ``base`` is x for the first chunk (residual) and the running
    accumulator after; column chunks of h are disjoint, so per-chunk
    activation is exact.
    """
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * s_ref[0] +
          b_ref[0]).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[0]
    h = _act(h, act).astype(x.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    if add_b2:
        y = y + b2_ref[0]
    o_ref[:] = base_ref[:] + y.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "act", "block_t",
                                             "n_chunks", "interpret"))
def fused_mlp_chunked_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2,
                             eps: float = 1e-6, act: str = "gelu",
                             block_t: int = 256, n_chunks: int = 2,
                             interpret: bool = False):
    """Fused MLP for models whose w1+w2 exceed VMEM (ViT-L/H, CLIP-L):
    mlp_dim is split into ``n_chunks`` column chunks, one pallas sweep per
    chunk with that chunk's weights VMEM-resident; partial outputs
    accumulate through HBM (extra traffic: (n_chunks-1) round-trips of the
    (T, D) activations — ~2 orders below the weight traffic it avoids)."""
    t, d = x.shape
    m = w1.shape[1]
    assert m % n_chunks == 0, (m, n_chunks)
    mc = m // n_chunks
    tp = round_up(t, block_t)
    if tp != t:
        x = jnp.pad(x, ((0, tp - t), (0, 0)))
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    ln_scale = ln_scale.reshape(1, -1).astype(jnp.float32)
    ln_bias = ln_bias.reshape(1, -1).astype(jnp.float32)
    b1 = b1.reshape(1, -1).astype(jnp.float32)
    b2 = b2.reshape(1, -1).astype(jnp.float32)

    tile = pl.BlockSpec((block_t, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    acc = x
    for c in range(n_chunks):
        acc = pl.pallas_call(
            functools.partial(_mlp_chunk_kernel, eps=eps, act=act,
                              add_b2=(c == n_chunks - 1)),
            grid=(tp // block_t,),
            in_specs=[tile, tile, const((1, d)), const((1, d)),
                      const((d, mc)), const((1, mc)),
                      const((mc, d)), const((1, d))],
            out_specs=tile,
            out_shape=jax.ShapeDtypeStruct((tp, d), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * tp * d * mc,
                bytes_accessed=(3 * tp * d + 2 * d * mc) * x.dtype.itemsize,
                transcendentals=tp * mc),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(x, acc, ln_scale, ln_bias,
          w1[:, c * mc:(c + 1) * mc], b1[:, c * mc:(c + 1) * mc],
          w2[c * mc:(c + 1) * mc, :], b2)
    return acc[:t]


# ---------------------------------------------------------------------------
# Stats-epilogue variant (round 3, measured in experiments/perf_attn_lnepi
# .py): the consumer's LayerNorm REDUCTIONS move to the producer kernel's
# tail, where their VPU work is independent of the producer's remaining
# MXU work; the consumer normalizes elementwise from the (mu, rstd) stats
# tile.  Bit-identical math (both sides compute the same one-pass f32
# stats), +0.5 MB/layer HBM.  AB-chained encoder measured 14.08 -> 13.88
# ms / 12 ViT-B layers (all 4 A/B rounds consistent).  Inference-only:
# models/vit.py wraps the chain in a whole-encoder custom VJP.
# ---------------------------------------------------------------------------

STATS_LANES = 128   # (rows, 128) f32 stats tile: col 0 = mu, col 1 = rstd


def _mlp_stats_kernel(x_ref, st_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, o_ref, *maybe_sto, eps: float, act: str,
                      emit_stats: bool):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mu = st_ref[:, 0:1]
    rstd = st_ref[:, 1:2]
    xn = ((xf - mu) * rstd * s_ref[0] + b_ref[0]).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[0]
    h = _act(h, act).astype(x.dtype)
    y = jnp.dot(h, w2_ref[:],
                preferred_element_type=jnp.float32) + b2_ref[0]
    out = x + y.astype(x.dtype)
    o_ref[:] = out
    if emit_stats:
        of = out.astype(jnp.float32)
        mu2 = jnp.mean(of, axis=-1, keepdims=True)
        var2 = jnp.maximum(
            jnp.mean(of * of, axis=-1, keepdims=True) - mu2 * mu2, 0.0)
        maybe_sto[0][:, 0:1] = mu2
        maybe_sto[0][:, 1:2] = jax.lax.rsqrt(var2 + eps)


@functools.partial(jax.jit, static_argnames=("eps", "act", "block_t",
                                             "vmem_limit", "emit_stats",
                                             "interpret"))
def fused_mlp_stats_pallas(x, stats, ln_scale, ln_bias, w1, b1, w2, b2,
                           eps: float = 1e-6, act: str = "gelu",
                           block_t: int = 512, vmem_limit: int = 0,
                           emit_stats: bool = True,
                           interpret: bool = False):
    """Stats-epilogue fused MLP: consumes the producer's (mu, rstd) LN
    stats (no in-kernel reductions before the GEMM), optionally emits the
    NEXT attention half's LN stats.  Returns (out, stats_out|None)."""
    t, d = x.shape
    m = w1.shape[1]
    tp = round_up(t, block_t)
    if tp != t:
        x = jnp.pad(x, ((0, tp - t), (0, 0)))
        stats = jnp.pad(stats, ((0, tp - t), (0, 0)),
                        constant_values=1.0)

    tile = pl.BlockSpec((block_t, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    stile = pl.BlockSpec((block_t, STATS_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    out_specs = [tile] + ([stile] if emit_stats else [])
    out_shape = [jax.ShapeDtypeStruct((tp, d), x.dtype)] + (
        [jax.ShapeDtypeStruct((tp, STATS_LANES), jnp.float32)]
        if emit_stats else [])
    outs = pl.pallas_call(
        functools.partial(_mlp_stats_kernel, eps=eps, act=act,
                          emit_stats=emit_stats),
        grid=(tp // block_t,),
        in_specs=[tile, stile, const((1, d)), const((1, d)),
                  const((d, m)), const((1, m)), const((m, d)),
                  const((1, d))],
        out_specs=out_specs if emit_stats else out_specs[0],
        out_shape=out_shape if emit_stats else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=4 * tp * d * m,
            bytes_accessed=(2 * tp * d + 2 * d * m) * x.dtype.itemsize,
            transcendentals=tp * m),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            **({"vmem_limit_bytes": vmem_limit} if vmem_limit else {})),
        interpret=interpret,
    )(x, stats, ln_scale.reshape(1, -1).astype(jnp.float32),
      ln_bias.reshape(1, -1).astype(jnp.float32),
      w1.astype(x.dtype), b1.reshape(1, -1).astype(jnp.float32),
      w2.astype(x.dtype), b2.reshape(1, -1).astype(jnp.float32))
    if emit_stats:
        return outs[0][:t], outs[1][:t]
    return outs[:t], None


def _mlp_chunk_stats_kernel(x_ref, base_ref, st_ref, s_ref, b_ref, w1_ref,
                            b1_ref, w2_ref, b2_ref, o_ref, *maybe_sto,
                            eps: float, act: str, add_b2: bool,
                            emit_stats: bool):
    """Chunked-MLP chunk consuming producer LN stats (and, on the last
    chunk, emitting the next attention half's stats from the final
    accumulated output).  The plain chunked kernel recomputes the LN
    reductions once PER CHUNK; here every chunk normalizes elementwise
    from the (mu, rstd) tile — the chunked path saves n_chunks× the
    reduction work the unchunked stats kernel saves once."""
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mu = st_ref[:, 0:1]
    rstd = st_ref[:, 1:2]
    xn = ((xf - mu) * rstd * s_ref[0] + b_ref[0]).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[0]
    h = _act(h, act).astype(x.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    if add_b2:
        y = y + b2_ref[0]
    out = base_ref[:] + y.astype(x.dtype)
    o_ref[:] = out
    if emit_stats:
        of = out.astype(jnp.float32)
        mu2 = jnp.mean(of, axis=-1, keepdims=True)
        var2 = jnp.maximum(
            jnp.mean(of * of, axis=-1, keepdims=True) - mu2 * mu2, 0.0)
        maybe_sto[0][:, 0:1] = mu2
        maybe_sto[0][:, 1:2] = jax.lax.rsqrt(var2 + eps)


@functools.partial(jax.jit, static_argnames=("eps", "act", "block_t",
                                             "n_chunks", "emit_stats",
                                             "interpret"))
def fused_mlp_chunked_stats_pallas(x, stats, ln_scale, ln_bias, w1, b1,
                                   w2, b2, eps: float = 1e-6,
                                   act: str = "gelu", block_t: int = 256,
                                   n_chunks: int = 2,
                                   emit_stats: bool = True,
                                   interpret: bool = False):
    """Stats-epilogue chunked fused MLP (big-weight geometries whose rows
    are too few for the raised-VMEM unchunked kernel — e.g. ViT-L@384
    b16).  Returns (out, stats_out|None)."""
    t, d = x.shape
    m = w1.shape[1]
    assert m % n_chunks == 0, (m, n_chunks)
    mc = m // n_chunks
    tp = round_up(t, block_t)
    if tp != t:
        x = jnp.pad(x, ((0, tp - t), (0, 0)))
        stats = jnp.pad(stats, ((0, tp - t), (0, 0)), constant_values=1.0)
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    ln_scale = ln_scale.reshape(1, -1).astype(jnp.float32)
    ln_bias = ln_bias.reshape(1, -1).astype(jnp.float32)
    b1 = b1.reshape(1, -1).astype(jnp.float32)
    b2 = b2.reshape(1, -1).astype(jnp.float32)

    tile = pl.BlockSpec((block_t, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    stile = pl.BlockSpec((block_t, STATS_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    acc, st_out = x, None
    for c in range(n_chunks):
        last = c == n_chunks - 1
        emit = emit_stats and last
        out_specs = [tile] + ([stile] if emit else [])
        out_shape = [jax.ShapeDtypeStruct((tp, d), x.dtype)] + (
            [jax.ShapeDtypeStruct((tp, STATS_LANES), jnp.float32)]
            if emit else [])
        outs = pl.pallas_call(
            functools.partial(_mlp_chunk_stats_kernel, eps=eps, act=act,
                              add_b2=last, emit_stats=emit),
            grid=(tp // block_t,),
            in_specs=[tile, tile, stile, const((1, d)), const((1, d)),
                      const((d, mc)), const((1, mc)),
                      const((mc, d)), const((1, d))],
            out_specs=out_specs if emit else out_specs[0],
            out_shape=out_shape if emit else out_shape[0],
            cost_estimate=pl.CostEstimate(
                flops=4 * tp * d * mc,
                bytes_accessed=(3 * tp * d + 2 * d * mc)
                * x.dtype.itemsize,
                transcendentals=tp * mc),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(x, acc, stats, ln_scale, ln_bias,
          w1[:, c * mc:(c + 1) * mc], b1[:, c * mc:(c + 1) * mc],
          w2[c * mc:(c + 1) * mc, :], b2)
        if emit:
            acc, st_out = outs
        else:
            acc = outs
    if emit_stats:
        return acc[:t], st_out[:t]
    return acc[:t], None


# Raised scoped-VMEM plan for the unchunked kernel at big-weight
# geometries (CLIP-L/ViT-L: 16.8 MB of weights).  Measured: unchunked
# @48MB beats the chunked kernel AND the XLA fallback at CLIP-L rows
# (0.75 vs 0.85 ms per 32-img slice, experiments/perf_mlp_unchunked.py);
# ViT-H's 26 MB showed no win — keep its XLA path.
MLP_BIG_VMEM = 48 * 1024 * 1024
MLP_BIG_WEIGHT_LIMIT = 20 * 1024 * 1024


def mlp_fits_raised(d: int, m: int, itemsize: int) -> bool:
    """True when w1+w2 exceed the default budget but fit the raised plan
    (and the raised plan measured faster than chunked/XLA)."""
    return 2 * d * m * itemsize <= MLP_BIG_WEIGHT_LIMIT


def mlp_weight_chunks(d: int, m: int, itemsize: int,
                      budget: int = 11 * 1024 * 1024) -> int:
    """Smallest power-of-two chunk count whose per-chunk weights fit the
    VMEM budget (alongside ~4 token tiles + the h tile); 1 = unchunked."""
    n = 1
    while n <= 16:
        if 2 * d * (m // n) * itemsize <= budget and m % n == 0:
            return n
        n *= 2
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps: float,
              act: str, vmem_limit: int = 0):
    """Differentiable fused MLP: Pallas forward, XLA-recompute backward.

    The backward pass re-runs the (autodiff-able) XLA reference and pulls
    its VJP — a rematerialization strategy: training still gets the fused
    forward, and the backward is exactly XLA's gradient graph.
    """
    return fused_mlp_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2,
                            eps=eps, act=act, vmem_limit=vmem_limit)


def _fused_mlp_fwd(x, s, b, w1, b1, w2, b2, eps, act, vmem_limit):
    out = fused_mlp_pallas(x, s, b, w1, b1, w2, b2, eps=eps, act=act,
                           vmem_limit=vmem_limit)
    return out, (x, s, b, w1, b1, w2, b2)


def _fused_mlp_bwd(eps, act, vmem_limit, res, g):
    x, s, b, w1, b1, w2, b2 = res
    if jax.default_backend() == "tpu" and act in ("gelu_tanh",
                                                  "quick_gelu", "relu"):
        # native fused backward kernel (in-kernel remat, VMEM grad accum)
        dx, dls, dlb, dw1, db1, dw2, db2 = fused_mlp_bwd_pallas(
            x, s, b, w1, b1, w2, g, eps=eps, act=act)
        grads = (dx, dls, dlb, dw1, db1, dw2, db2)
        # cotangent dtypes must match the primals'
        return tuple(gr.astype(p.dtype) for gr, p in zip(grads, res))
    _, vjp = jax.vjp(
        lambda *a: fused_mlp_xla(*a, eps=eps, act=act), *res)
    return vjp(g)


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_mlp_chunked(x, ln_scale, ln_bias, w1, b1, w2, b2, eps: float,
                      act: str, n_chunks: int):
    """Differentiable chunked fused MLP: Pallas forward, XLA-recompute
    backward (same rematerialization contract as fused_mlp)."""
    return fused_mlp_chunked_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2,
                                    eps=eps, act=act, n_chunks=n_chunks)


def _fused_mlp_chunked_fwd(x, s, b, w1, b1, w2, b2, eps, act, n_chunks):
    out = fused_mlp_chunked_pallas(x, s, b, w1, b1, w2, b2, eps=eps,
                                   act=act, n_chunks=n_chunks)
    return out, (x, s, b, w1, b1, w2, b2)


def _fused_mlp_chunked_bwd(eps, act, n_chunks, res, g):
    _, vjp = jax.vjp(
        lambda *a: fused_mlp_xla(*a, eps=eps, act=act), *res)
    return vjp(g)


fused_mlp_chunked.defvjp(_fused_mlp_chunked_fwd, _fused_mlp_chunked_bwd)


# ---------------------------------------------------------------------------
# Native backward kernel (round 2): one fused pass computes dx and
# accumulates dW1/dW2/db1/db2/dls/dlb across token tiles in VMEM scratch.
# Replaces the XLA-recompute VJP on TPU: the forward intermediates (xn, h,
# a) are recomputed INSIDE the kernel per tile — remat without the HBM
# round-trips XLA's unfused gradient graph pays for the (T, M) tensors.
# ---------------------------------------------------------------------------


def _act_and_grad(h, kind: str):
    """act(h), act'(h) — closed forms (Mosaic has no erf; tanh-GELU)."""
    if kind == "gelu_tanh":
        c = 0.7978845608028654          # sqrt(2/pi)
        u = c * (h + 0.044715 * h * h * h)
        t = jnp.tanh(u)
        a = 0.5 * h * (1.0 + t)
        da = (0.5 * (1.0 + t)
              + 0.5 * h * (1.0 - t * t) * c * (1.0 + 3 * 0.044715 * h * h))
        return a, da
    if kind == "quick_gelu":
        s = jax.nn.sigmoid(1.702 * h)
        return h * s, s * (1.0 + 1.702 * h * (1.0 - s))
    if kind == "relu":
        return jnp.maximum(h, 0.0), (h > 0).astype(h.dtype)
    raise ValueError(kind)


@functools.partial(jax.jit, static_argnames=("eps", "act", "block_t",
                                             "interpret"))
def fused_mlp_bwd_pallas(x, ln_scale, ln_bias, w1, b1, w2, g,
                         eps: float = 1e-6, act: str = "gelu_tanh",
                         block_t: int = 256, interpret: bool = False):
    """Backward of fused_mlp: returns (dx, dls, dlb, dw1, db1, dw2, db2).

    ``g`` is the output cotangent (T, D).  Weight grads are f32,
    accumulated in VMEM scratch across token tiles (grid runs
    "arbitrary" so the constant-index grad outputs stay resident until
    the last tile).  Forward intermediates are recomputed per tile
    in-kernel — remat without XLA's (T, M) HBM round-trips.
    """
    t, d = x.shape
    m = w1.shape[1]
    tp = round_up(t, block_t)
    if tp != t:
        x = jnp.pad(x, ((0, tp - t), (0, 0)))
        g = jnp.pad(g, ((0, tp - t), (0, 0)))

    tile = pl.BlockSpec((block_t, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_mlp_bwd_with_b1_kernel, eps=eps, act=act,
                          n_tiles=tp // block_t),
        grid=(tp // block_t,),
        in_specs=[tile, tile, const((1, d)), const((1, d)),
                  const((d, m)), const((1, m)), const((m, d))],
        out_specs=[tile, const((d, m)), const((1, m)), const((m, d)),
                   const((1, d)), const((1, d)), const((1, d))],
        out_shape=[
            jax.ShapeDtypeStruct((tp, d), x.dtype),
            jax.ShapeDtypeStruct((d, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((m, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, g, ln_scale.reshape(1, -1).astype(jnp.float32),
      ln_bias.reshape(1, -1).astype(jnp.float32),
      w1.astype(x.dtype), b1.reshape(1, -1).astype(jnp.float32),
      w2.astype(x.dtype))
    dx, dw1, db1, dw2, db2, dls, dlb = outs
    return (dx[:t], dls.reshape(-1), dlb.reshape(-1), dw1,
            db1.reshape(-1), dw2, db2.reshape(-1))


def _mlp_bwd_with_b1_kernel(x_ref, g_ref, s_ref, b_ref, w1_ref, b1_ref,
                            w2_ref, dx_ref, dw1_ref, db1_ref, dw2_ref,
                            db2_ref, dls_ref, dlb_ref, *, eps: float,
                            act: str, n_tiles: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dls_ref[:] = jnp.zeros_like(dls_ref)
        dlb_ref[:] = jnp.zeros_like(dlb_ref)

    x = x_ref[:]
    g = g_ref[:].astype(jnp.float32)

    # recompute forward intermediates (in-kernel remat)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    xn = (xhat * s_ref[0] + b_ref[0]).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[0]
    a, dact = _act_and_grad(h, act)
    a = a.astype(x.dtype)

    gc = g.astype(x.dtype)
    da = jax.lax.dot_general(gc, w2_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh = da * dact
    dhc = dh.astype(x.dtype)
    dxn = jax.lax.dot_general(dhc, w1_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    dw1_ref[:] += jax.lax.dot_general(xn, dhc, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(dh, axis=0, keepdims=True)
    dw2_ref[:] += jax.lax.dot_general(a, gc, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(g, axis=0, keepdims=True)

    dls_ref[:] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dlb_ref[:] += jnp.sum(dxn, axis=0, keepdims=True)
    dxhat = dxn * s_ref[0]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = (dxhat - m1 - xhat * m2) * rstd

    dx_ref[:] = (g + dx_ln).astype(dx_ref.dtype)


def fused_mlp_xla(x, ln_scale, ln_bias, w1, b1, w2, b2,
                  eps: float = 1e-6, act: str = "gelu"):
    """Reference implementation with identical semantics."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ln_scale +
          ln_bias).astype(x.dtype)
    h = jnp.dot(xn, w1.astype(x.dtype),
                preferred_element_type=jnp.float32) + b1
    h = _act(h, act).astype(x.dtype)
    y = jnp.dot(h, w2.astype(x.dtype),
                preferred_element_type=jnp.float32) + b2
    return x + y.astype(x.dtype)
