"""Int8-quantized model forwards — BASELINE config 3.

Mirrors the reference's fixed-point datapath with a parity contract: the
dense (MLP) int8 path is BIT-EXACT between the numpy oracle and the
JAX/Pallas device path (int32 accumulation is exact everywhere; scales are
computed once on the host and shared).  The ViT int8 path quantizes every
linear (patch embed, QKV, attention out, MLP, head) per-tensor with dynamic
per-tensor activation quantization; LayerNorm/softmax/GELU stay f32.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import activations as act
from ..defines import NetData
from ..ops import quant
from ..ops.attention import mha_qkv
from . import vit as vit_mod

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Dense (MLP) family — bit-exact parity contract
# ---------------------------------------------------------------------------

def quantize_mlp(data: NetData) -> Params:
    """Quantize reference-layout weights to int8 per-tensor (host-side,
    shared verbatim by oracle and device paths)."""
    data.validate()
    layers: List[Dict[str, Any]] = []
    for w, b in zip(data.params, data.bias):
        wq, sw = quant.quantize_numpy(np.ascontiguousarray(w.T))
        layers.append({"wq": wq, "sw": sw,
                       "b": np.asarray(b, np.float32)})
    return {"layers": layers, "acts": tuple(int(a) for a in
                                            data.activations)}


def mlp_forward_int8_numpy(qparams: Params, x: np.ndarray) -> np.ndarray:
    """Oracle int8 forward: dynamic per-tensor activation quantization."""
    h = np.asarray(x, np.float32)
    for layer, code in zip(qparams["layers"], qparams["acts"]):
        hq, sx = quant.quantize_numpy(h)
        h = quant.int8_linear_numpy(hq, sx, layer["wq"], layer["sw"],
                                    layer["b"])
        h = act.apply_numpy(code, h).astype(np.float32)
    return h


def mlp_forward_int8(qparams_dev: Params, x: jax.Array,
                     acts: Tuple[int, ...], impl: str = "auto") -> jax.Array:
    """Device int8 forward; semantics identical to the numpy oracle.

    ``acts`` is static (bake it in with functools.partial under jit).
    """
    h = x.astype(jnp.float32)
    for layer, code in zip(qparams_dev["layers"], acts):
        hq, sx = quant.quantize_jnp(h)
        h = quant.int8_linear(hq, sx, layer["wq"], layer["sw"], layer["b"],
                              impl=impl)
        h = act.apply_jnp(int(code), h).astype(jnp.float32)
    return h


def device_qparams(qparams: Params) -> Params:
    """Host quantized params -> device arrays (activation codes stay OUT
    of the pytree — they are static trace constants, not data)."""
    return {"layers": [
        {"wq": jnp.asarray(l["wq"]), "sw": jnp.asarray(l["sw"]),
         "b": jnp.asarray(l["b"])}
        for l in qparams["layers"]]}


# ---------------------------------------------------------------------------
# ViT int8
# ---------------------------------------------------------------------------

_VIT_QUANT_KEYS = ("wqkv", "wo", "w1", "w2")


def quantize_vit(params: Params) -> Params:
    """Per-tensor int8 for every big linear; per-LAYER scales for the
    stacked block weights (axis 0 is depth — each layer gets its own
    scale, matching per-tensor semantics of an unstacked model)."""
    out: Params = {
        "patch_embed": _q_linear(params["patch_embed"]["kernel"],
                                 params["patch_embed"]["bias"]),
        "cls_token": jnp.asarray(params["cls_token"]),
        "pos_embed": jnp.asarray(params["pos_embed"]),
        "ln_f_scale": jnp.asarray(params["ln_f_scale"]),
        "ln_f_bias": jnp.asarray(params["ln_f_bias"]),
        "blocks": {},
    }
    blocks = params["blocks"]
    for k in ("ln1_scale", "ln1_bias", "ln2_scale", "ln2_bias",
              "bqkv", "bo", "b1", "b2"):
        out["blocks"][k] = jnp.asarray(blocks[k])
    for k in _VIT_QUANT_KEYS:
        w = np.asarray(blocks[k], np.float32)
        depth = w.shape[0]
        qs = [quant.quantize_numpy(w[i]) for i in range(depth)]
        out["blocks"][k + "_q"] = jnp.asarray(
            np.stack([q for q, _ in qs]))
        out["blocks"][k + "_s"] = jnp.asarray(
            np.stack([s for _, s in qs]))
    if "head" in params:
        out["head"] = _q_linear(params["head"]["kernel"],
                                params["head"]["bias"])
    return out


def _q_linear(kernel, bias) -> Params:
    wq, sw = quant.quantize_numpy(np.asarray(kernel, np.float32))
    return {"wq": jnp.asarray(wq), "sw": jnp.asarray(sw),
            "b": jnp.asarray(np.asarray(bias, np.float32))}


def _qlin(x: jax.Array, lin: Params, impl: str) -> jax.Array:
    xq, sx = quant.quantize_jnp(x)
    return quant.int8_linear(xq, sx, lin["wq"], lin["sw"], lin["b"],
                             impl=impl)


def _qblock(x, blk, cfg: vit_mod.ViTConfig, impl: str):
    b, n, d = x.shape
    h = vit_mod._layernorm(x, blk["ln1_scale"], blk["ln1_bias"], cfg.ln_eps)
    qkv = _qlin(h, {"wq": blk["wqkv_q"], "sw": blk["wqkv_s"],
                    "b": blk["bqkv"]}, impl)
    o = mha_qkv(qkv.astype(jnp.float32), cfg.num_heads,
                impl=cfg.attn_impl)
    x = x + _qlin(o, {"wq": blk["wo_q"], "sw": blk["wo_s"],
                      "b": blk["bo"]}, impl)
    h = vit_mod._layernorm(x, blk["ln2_scale"], blk["ln2_bias"], cfg.ln_eps)
    h = _qlin(h, {"wq": blk["w1_q"], "sw": blk["w1_s"], "b": blk["b1"]},
              impl)
    h = vit_mod._hidden_act(h, cfg.hidden_act)
    x = x + _qlin(h, {"wq": blk["w2_q"], "sw": blk["w2_s"], "b": blk["b2"]},
                  impl)
    return x


def vit_forward_int8(qparams: Params, images: jax.Array,
                     cfg: vit_mod.ViTConfig,
                     impl: str = "auto") -> jax.Array:
    """Int8 ViT forward: normalized images -> f32 logits."""
    x = vit_mod.patchify(images.astype(jnp.float32), cfg.patch_size)
    x = _qlin(x, qparams["patch_embed"], impl)
    b = x.shape[0]
    cls = jnp.broadcast_to(qparams["cls_token"].astype(x.dtype),
                           (b, 1, cfg.hidden_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + qparams["pos_embed"].astype(x.dtype)

    def step(carry, blk):
        return _qblock(carry, blk, cfg, impl), None

    x, _ = jax.lax.scan(step, x, qparams["blocks"])
    x = vit_mod._layernorm(x, qparams["ln_f_scale"], qparams["ln_f_bias"],
                           cfg.ln_eps)
    pooled = x[:, 0]
    if "head" not in qparams:   # headless import (HF ViTModel): features out
        return pooled.astype(jnp.float32)   # same dtype as the fast path
    return _qlin(pooled, qparams["head"], impl)


def jit_vit_forward_int8(cfg: vit_mod.ViTConfig, impl: str = "auto"):
    return jax.jit(partial(vit_forward_int8, cfg=cfg, impl=impl))


# ---------------------------------------------------------------------------
# FAST int8 ViT: fused row-wise kernels (ops/quant_fused.py). Tolerance
# parity; the per-tensor path above keeps the bit-exact contract.
# ---------------------------------------------------------------------------

def quantize_vit_fast(params: Params) -> Params:
    """Per-output-column int8 weights for the fused kernels."""
    from ..ops.quant_fused import quantize_weight_colwise as qc

    def q(w):
        wq, ws = qc(np.asarray(w, np.float32))
        return jnp.asarray(wq), jnp.asarray(ws)

    out: Params = {
        "cls_token": jnp.asarray(params["cls_token"]),
        "pos_embed": jnp.asarray(params["pos_embed"]),
        "ln_f_scale": jnp.asarray(params["ln_f_scale"]),
        "ln_f_bias": jnp.asarray(params["ln_f_bias"]),
        "blocks": {},
    }
    pe_q, pe_s = q(params["patch_embed"]["kernel"])
    out["patch_embed"] = {"wq": pe_q, "ws": pe_s,
                          "b": jnp.asarray(params["patch_embed"]["bias"])}
    blocks = params["blocks"]
    for k in ("ln1_scale", "ln1_bias", "ln2_scale", "ln2_bias",
              "bqkv", "bo", "b1", "b2"):
        out["blocks"][k] = jnp.asarray(blocks[k])
    for k in _VIT_QUANT_KEYS:
        w = np.asarray(blocks[k], np.float32)
        qs = [qc(w[i]) for i in range(w.shape[0])]
        out["blocks"][k + "_q"] = jnp.asarray(np.stack([a for a, _ in qs]))
        out["blocks"][k + "_s"] = jnp.asarray(np.stack([s for _, s in qs]))
    if "head" in params:
        h_q, h_s = q(params["head"]["kernel"])
        out["head"] = {"wq": h_q, "ws": h_s,
                       "b": jnp.asarray(params["head"]["bias"])}
    return out


def _fused_lin(x3d, wq, ws, b, act="none", ln=None, eps=0.0):
    from ..ops.quant_fused import int8_linear_fused
    bsz, n, _ = x3d.shape
    ls, lb = (ln if ln is not None else (None, None))
    out = int8_linear_fused(x3d.reshape(bsz * n, -1), wq, ws, b, act=act,
                            ln_scale=ls, ln_bias=lb,
                            ln_eps=eps if ln is not None else 0.0)
    return out.reshape(bsz, n, -1)


def _int8_block_fits(cfg: vit_mod.ViTConfig) -> bool:
    """Both int8 mega-kernels fit VMEM at this geometry?  Oversize
    MLP weights (ViT-H: 12.5 MB int8) run under the raised scoped-VMEM
    plan (ops/quant_block.mlp_plan_int8) — the gate only fails when
    nothing fits even raised."""
    from ..ops.common import LANE, pad_sublane, round_up
    from ..ops.quant_block import mlp_plan_int8, score_slots_int8
    n_pad = round_up(cfg.seq_len, pad_sublane(jnp.bfloat16))
    kv_pad = round_up(cfg.seq_len, LANE)
    _, n_sc, _, _ = score_slots_int8(cfg.num_heads, cfg.hidden_dim,
                                     n_pad, kv_pad)
    attn_ok = n_sc >= 1
    bt, _ = mlp_plan_int8(n_pad, cfg.hidden_dim, cfg.mlp_dim)
    return attn_ok and bt > 0


_INT8_STATS_CHAIN = False   # measured LOSS — see docstring below


def _int8_stats_chain_supported(cfg: vit_mod.ViTConfig,
                                batch: int) -> bool:
    """Whether the int8 stats-epilogue chain may run: needs both
    mega-kernels plus the attention ao-scratch tier AT THIS BATCH (the
    stats kernel writes PV results to a separate scratch; q-slot reuse
    would alias the stats epilogue).

    DISABLED by default (_INT8_STATS_CHAIN): measured 4/4-round LOSS at
    ViT-B b64 (10.8 -> 11.0 ms, experiments/perf_int8_chain.py).  The
    chain moves each LN reduction into the producer's epilogue where it
    must hide behind tail MXU work — the int8 halves have HALF the MXU
    time of bf16, so the epilogue is exposed.  The round-4 bf16-stats-
    tile variant (halving the tile's boundary HBM traffic) measured the
    SAME 4/4 loss (~9.0 -> ~9.35 ms, experiments/perf_int8_chain_bf16.py:
    f32 and bf16 tiles tie within noise), isolating the exposed-epilogue
    mechanism as the whole cost.  The kernels stay available (tested in
    interpret mode) as the measured record."""
    from ..ops.common import LANE, pad_sublane, round_up
    from ..ops.quant_block import score_slots_int8
    if (not _INT8_STATS_CHAIN or jax.default_backend() != "tpu"
            or not _int8_block_fits(cfg)):
        return False
    n_pad = round_up(cfg.seq_len, pad_sublane(jnp.bfloat16))
    kv_pad = round_up(cfg.seq_len, LANE)
    _, n_sc, reuse_q, _ = score_slots_int8(cfg.num_heads, cfg.hidden_dim,
                                           n_pad, kv_pad, batch=batch)
    return n_sc >= 1 and not reuse_q


def _encoder_int8_stats_chain(x, blocks, cfg: vit_mod.ViTConfig,
                              n_valid: int,
                              stats_dtype=jnp.float32):
    """Int8 encoder with LN (mu, rstd) stats passed between halves —
    the int8 halves are VPU-bound, so deleting each half's reduction
    preamble attacks the binding resource (see the bf16 chain,
    vit._encoder_stats_chain)."""
    from ..ops.attn_block import STATS_LANES
    from ..ops.quant_block import (attn_block_int8_stats,
                                   mlp_block_int8_stats)
    b, n_pad, d = x.shape
    act = "quick_gelu" if cfg.hidden_act == "quick_gelu" else "gelu_tanh"
    xf = x.reshape(b * n_pad, d).astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    st = jnp.zeros((b * n_pad, STATS_LANES), jnp.float32)
    st = st.at[:, 0:1].set(mu)
    st = st.at[:, 1:2].set(jax.lax.rsqrt(var + cfg.ln_eps))
    # bf16 stats tiles halve the chain's boundary HBM traffic (round-4
    # probe, experiments/perf_int8_chain_bf16.py)
    st = st.astype(stats_dtype).reshape(b, n_pad, STATS_LANES)
    for i in range(cfg.depth):
        blk = jax.tree_util.tree_map(lambda a: a[i], blocks)
        x, st = attn_block_int8_stats(
            x, st, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv_q"],
            blk["wqkv_s"], blk["bqkv"], blk["wo_q"], blk["wo_s"],
            blk["bo"], cfg.num_heads, eps=cfg.ln_eps, n_valid=n_valid,
            emit_stats=True)
        last = i == cfg.depth - 1
        t, st2 = mlp_block_int8_stats(
            x.reshape(b * n_pad, d), st.reshape(b * n_pad, STATS_LANES),
            blk["ln2_scale"], blk["ln2_bias"], blk["w1_q"], blk["w1_s"],
            blk["b1"], blk["w2_q"], blk["w2_s"], blk["b2"],
            eps=cfg.ln_eps, act=act, emit_stats=not last)
        x = t.reshape(b, n_pad, d)
        if not last:
            st = st2.reshape(b, n_pad, STATS_LANES)
    return x


def _qblock_fast(x, blk, cfg: vit_mod.ViTConfig,
                 n_valid: int | None = None):
    b, n, d = x.shape
    act = "quick_gelu" if cfg.hidden_act == "quick_gelu" else "gelu_tanh"
    if "inv_ao" in blk:        # calibrated static-scale tree
        return _qblock_static(x, blk, cfg, n_valid=n_valid)
    if jax.default_backend() == "tpu" and _int8_block_fits(cfg):
        # round-2 path: whole-half int8 mega-kernels — activations never
        # leave VMEM between LN/quant/GEMM/dequant/act stages
        from ..ops.quant_block import (attn_block_int8, mlp_block_int8,
                                       mlp_plan_int8)
        x = attn_block_int8(
            x, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv_q"],
            blk["wqkv_s"], blk["bqkv"], blk["wo_q"], blk["wo_s"],
            blk["bo"], cfg.num_heads, eps=cfg.ln_eps, n_valid=n_valid)
        bt, vmem = mlp_plan_int8(b * n, d, cfg.mlp_dim)
        x2 = mlp_block_int8(
            x.reshape(b * n, d), blk["ln2_scale"], blk["ln2_bias"],
            blk["w1_q"], blk["w1_s"], blk["b1"], blk["w2_q"],
            blk["w2_s"], blk["b2"], eps=cfg.ln_eps, act=act,
            block_t=bt, vmem_limit=vmem)
        return x2.reshape(b, n, d)
    # per-linear fused path (any geometry / backend)
    qkv = _fused_lin(x, blk["wqkv_q"], blk["wqkv_s"], blk["bqkv"],
                     ln=(blk["ln1_scale"], blk["ln1_bias"]),
                     eps=cfg.ln_eps)
    o = mha_qkv(qkv, cfg.num_heads, n_valid=n_valid, impl=cfg.attn_impl)
    x = x + _fused_lin(o, blk["wo_q"], blk["wo_s"], blk["bo"])
    # LN2 fused into the quantizing w1 projection (+ activation)
    h = _fused_lin(x, blk["w1_q"], blk["w1_s"], blk["b1"], act=act,
                   ln=(blk["ln2_scale"], blk["ln2_bias"]), eps=cfg.ln_eps)
    x = x + _fused_lin(h, blk["w2_q"], blk["w2_s"], blk["b2"])
    return x


# ---------------------------------------------------------------------------
# Static-scale (calibrated) int8 — round 5.  The reference's fixed-point
# datapath uses a STATIC range (/root/reference/def/defines.h:11-12);
# the dynamic kernels above compute per-row scales at runtime, and that
# per-row quant VPU work is their measured bound (docs/perf.md round-4
# int8 section).  Calibrating per-tensor-per-layer activation scales
# (utils/calibrate.static_activation_scales) lets every quant/dequant
# pass fold into arguments the kernels already consume — see
# ops/quant_block.py "Static-scale variants" for the folding algebra.
# Tree marker: blocks["inv_ao"] present <=> static tree.
# ---------------------------------------------------------------------------


def quantize_vit_static(params: Params, cfg: vit_mod.ViTConfig,
                        images: Optional[jax.Array] = None,
                        margin: float = 1.0) -> Params:
    """quantize_vit_fast tree with calibrated static activation scales
    folded in.  ``images``: optional real calibration batch (normalized
    inputs); defaults to the synthetic probe batch.  Saturation beyond
    the calibrated absmax is the graceful-degradation contract."""
    from ..ops.quant_fused import QMAX
    from ..utils.calibrate import static_activation_scales
    sc = static_activation_scales(params, cfg, images, margin)
    out = quantize_vit_fast(params)
    return _fold_static_scales(out, sc, QMAX)


def _fold_static_scales(out: Params, sc, qmax: float) -> Params:
    """Fold activation quant scales into the fast-tree arguments:
    LN affine absorbs 1/s_x, dequant column scales absorb s_x; the two
    non-foldable inverses ride the kernels' scalar slots."""
    blk = dict(out["blocks"])
    sx1 = (sc["a_x1"] / qmax).astype(np.float32)        # (depth,)
    s_ao = (sc["a_ao"] / qmax).astype(np.float32)
    sx2 = (sc["a_x2"] / qmax).astype(np.float32)
    s_h = (sc["a_h"] / qmax).astype(np.float32)

    def col(v):  # (depth,) -> broadcast over (depth, n)
        return jnp.asarray(v)[:, None]

    blk["ln1_scale"] = blk["ln1_scale"].astype(jnp.float32) / col(sx1)
    blk["ln1_bias"] = blk["ln1_bias"].astype(jnp.float32) / col(sx1)
    blk["wqkv_s"] = blk["wqkv_s"].astype(jnp.float32) * col(sx1)
    blk["wo_s"] = blk["wo_s"].astype(jnp.float32) * col(s_ao)
    blk["ln2_scale"] = blk["ln2_scale"].astype(jnp.float32) / col(sx2)
    blk["ln2_bias"] = blk["ln2_bias"].astype(jnp.float32) / col(sx2)
    blk["w1_s"] = blk["w1_s"].astype(jnp.float32) * col(sx2)
    blk["w2_s"] = blk["w2_s"].astype(jnp.float32) * col(s_h)
    blk["inv_ao"] = jnp.asarray(1.0 / s_ao, jnp.float32)[:, None]
    blk["inv_ah"] = jnp.asarray(1.0 / s_h, jnp.float32)[:, None]

    # int8-SCORES keys (round 5b): static q/k/v scales let the score and
    # PV GEMMs run on the int8 MXU with only scalar dequants — the
    # per-row/per-column quant work that made dynamic int8 scores a
    # measured loss (perf_attn_int8scores.py) is gone.  The qkv panel is
    # emitted straight in the quant domain: wqkv_qs/bqkv_qs carry the
    # per-third division by s_q/s_k/s_v on top of the a_x1-folded dequant.
    if all(k in sc for k in ("a_q", "a_k", "a_v")):
        s_q = (sc["a_q"] / qmax).astype(np.float32)
        s_k = (sc["a_k"] / qmax).astype(np.float32)
        s_v = (sc["a_v"] / qmax).astype(np.float32)
        d3 = blk["wqkv_s"].shape[-1]
        dm = d3 // 3
        s_thirds = jnp.concatenate(
            [jnp.tile(col(v), (1, dm)) for v in (s_q, s_k, s_v)], axis=1)
        blk["wqkv_qs"] = blk["wqkv_s"] / s_thirds
        blk["bqkv_qs"] = jnp.asarray(blk["bqkv"],
                                     jnp.float32) / s_thirds
        # score dequant: s_true = s_i32 * s_q * s_k (x 1/sqrt(dh) at use)
        blk["sc_qk"] = col(s_q * s_k)
        # PV dequant x p step (1/qmax) x 1/s_ao: ao lands in quant domain
        blk["pv_fold"] = col(s_v / qmax / s_ao)
    out = dict(out)
    out["blocks"] = blk
    return out


def quantize_clip_vision_static(params: Params, cfg: vit_mod.ViTConfig,
                                images: Optional[jax.Array] = None,
                                margin: float = 1.0) -> Params:
    """Static-scale tree for a CLIP vision tower (ln_pre/proj stay f32)."""
    from ..ops.quant_fused import QMAX
    from ..utils.calibrate import static_activation_scales
    sc = static_activation_scales(params, cfg, images, margin)
    out = quantize_clip_vision_fast(params)
    return _fold_static_scales(out, sc, QMAX)


_INT8_SCORES = False   # measured LOSS — see _int8_scores_ok docstring


def _int8_scores_ok(blk, cfg: vit_mod.ViTConfig) -> bool:
    """Whether the int8-scores attention path applies: the static tree
    carries the q/k/v panel scales AND the geometry is the pair-packed
    dh=64 / even-head-count one the kernel requires.  The gate must be
    a pure function of (tree keys, config) so the TPU kernel and the
    CPU/interpret reference describe the SAME quantization function.

    DISABLED by default (_INT8_SCORES): measured 4/4 LOSS at ViT-B b64
    (attn half x12: 3.97 -> 5.47 ms; full model 7515 -> 6446 img/s,
    experiments/perf_int8_scores_r5.py).  The premise failed at the
    GEMM level: an operands-resident Pallas microbench of the exact
    score/PV shapes (M=200, K=128, N=1024 per head-pair) times int8 at
    1.02x the bf16 kernel time — the int8 MXU rate does not materialize
    at these latency-bound shapes (experiments/perf_int8s_micro.py) —
    so the added p-quant rint/clip and int8 relayout VPU work buys
    nothing.  The kernels + parity tests stay as the measured record;
    accuracy was fine (cosine 0.9995 vs f32 at the diffuse-attention
    worst case)."""
    return (_INT8_SCORES and "sc_qk" in blk
            and cfg.hidden_dim // cfg.num_heads == 64
            and cfg.num_heads % 2 == 0)


def _qblock_static(x, blk, cfg: vit_mod.ViTConfig,
                   n_valid: int | None = None):
    """One static-scale int8 block: mega-kernels on TPU, reference
    semantics elsewhere (the CPU test mesh runs the same entry)."""
    b, n, d = x.shape
    act = "quick_gelu" if cfg.hidden_act == "quick_gelu" else "gelu_tanh"
    int8s = _int8_scores_ok(blk, cfg)
    if jax.default_backend() == "tpu" and _int8_block_fits(cfg):
        from ..ops.quant_block import (attn_block_int8_static,
                                       attn_block_int8_static_scores,
                                       mlp_block_int8_static,
                                       mlp_plan_int8)
        if int8s:
            x = attn_block_int8_static_scores(
                x, blk["sc_qk"], blk["pv_fold"], blk["ln1_scale"],
                blk["ln1_bias"], blk["wqkv_q"], blk["wqkv_qs"],
                blk["bqkv_qs"], blk["wo_q"], blk["wo_s"], blk["bo"],
                cfg.num_heads, eps=cfg.ln_eps, n_valid=n_valid)
        else:
            x = attn_block_int8_static(
                x, blk["inv_ao"], blk["ln1_scale"], blk["ln1_bias"],
                blk["wqkv_q"], blk["wqkv_s"], blk["bqkv"], blk["wo_q"],
                blk["wo_s"], blk["bo"], cfg.num_heads, eps=cfg.ln_eps,
                n_valid=n_valid)
        bt, vmem = mlp_plan_int8(b * n, d, cfg.mlp_dim)
        x2 = mlp_block_int8_static(
            x.reshape(b * n, d), blk["inv_ah"], blk["ln2_scale"],
            blk["ln2_bias"], blk["w1_q"], blk["w1_s"], blk["b1"],
            blk["w2_q"], blk["w2_s"], blk["b2"], eps=cfg.ln_eps, act=act,
            block_t=bt, vmem_limit=vmem)
        return x2.reshape(b, n, d)
    from ..ops.quant_block import (attn_block_int8_static_ref,
                                   attn_block_int8s_static_ref,
                                   mlp_block_int8_static_ref)
    if int8s:
        x = attn_block_int8s_static_ref(
            x, blk["sc_qk"][0], blk["pv_fold"][0], blk["ln1_scale"],
            blk["ln1_bias"], blk["wqkv_q"], blk["wqkv_qs"],
            blk["bqkv_qs"], blk["wo_q"], blk["wo_s"], blk["bo"],
            cfg.num_heads, eps=cfg.ln_eps, n_valid=n_valid)
    else:
        x = attn_block_int8_static_ref(
            x, blk["inv_ao"][0], blk["ln1_scale"], blk["ln1_bias"],
            blk["wqkv_q"], blk["wqkv_s"], blk["bqkv"], blk["wo_q"],
            blk["wo_s"], blk["bo"], cfg.num_heads, eps=cfg.ln_eps,
            n_valid=n_valid)
    t = mlp_block_int8_static_ref(
        x.reshape(b * n, d), blk["inv_ah"][0], blk["ln2_scale"],
        blk["ln2_bias"], blk["w1_q"], blk["w1_s"], blk["b1"],
        blk["w2_q"], blk["w2_s"], blk["b2"], eps=cfg.ln_eps, act=act)
    return t.reshape(b, n, d)


def vit_forward_int8_fast(qparams: Params, images: jax.Array,
                          cfg: vit_mod.ViTConfig) -> jax.Array:
    """Fast int8 ViT: bf16 activations, fused row-wise int8 linears.

    The embed stage runs the transpose-free bf16 dotg
    (ops/patch_embed.embed_tokens_dotg) on a dequantized weight: the
    embed GEMM is <1% of model FLOPs, the patchify transpose it
    replaces costs more than int8 saves there, and bf16 drops the
    activation row-quant error (the per-layer blocks stay int8)."""
    from ..ops.common import pad_sublane, round_up
    from ..ops.patch_embed import embed_tokens_dotg
    dt = jnp.bfloat16
    n, d = cfg.seq_len, cfg.hidden_dim
    npre = cfg.num_prefix_tokens
    n_pad = round_up(n, pad_sublane(jnp.bfloat16))
    pe = qparams["patch_embed"]
    pos = qparams["pos_embed"][0].astype(jnp.float32)
    pre = qparams["cls_token"][0].astype(jnp.float32)
    posb = jnp.concatenate([
        pre + pos[:npre],
        pos[npre:] + pe["b"].astype(jnp.float32),
        jnp.zeros((n_pad - n, d), jnp.float32),
    ], axis=0)
    wp = (pe["wq"].astype(jnp.float32)
          * pe["ws"].astype(jnp.float32)).astype(dt)
    # padded residency (see vit._forward_features): the posb tail rows
    # pad once in-embed; all blocks run with n_valid, slice once
    x = embed_tokens_dotg(images.astype(dt), wp, posb, cfg.patch_size,
                          npre)

    def step(carry, blk):
        return _qblock_fast(carry, blk, cfg, n_valid=n), None

    use_scan = (cfg.scan_blocks if cfg.scan_blocks is not None
                else cfg.remat)
    if use_scan:
        x, _ = jax.lax.scan(step, x, qparams["blocks"])
    elif _int8_stats_chain_supported(cfg, x.shape[0]):
        x = _encoder_int8_stats_chain(x, qparams["blocks"], cfg, n)
    else:   # unrolled: measured faster (see ViTConfig.scan_blocks)
        for i in range(cfg.depth):
            blk = jax.tree_util.tree_map(lambda a: a[i],
                                         qparams["blocks"])
            x, _ = step(x, blk)
    # LayerNorm is per-token: only the CLS row feeds the head
    cls_t = vit_mod._layernorm(x[:, :1], qparams["ln_f_scale"],
                               qparams["ln_f_bias"], cfg.ln_eps)
    if "head" not in qparams:   # headless import (HF ViTModel): features out
        return cls_t[:, 0].astype(jnp.float32)
    hd = qparams["head"]
    return _fused_lin(cls_t, hd["wq"], hd["ws"], hd["b"])[:, 0].astype(
        jnp.float32)


def int8_latency_supported(cfg: vit_mod.ViTConfig, batch: int) -> bool:
    from ..ops.common import LANE, pad_sublane, round_up
    from ..ops.vit_stack import stack_fits
    return (cfg.pool == "cls" and batch <= 4
            and stack_fits(cfg.num_heads, cfg.hidden_dim, cfg.mlp_dim,
                           round_up(cfg.seq_len, pad_sublane(jnp.bfloat16)),
                           round_up(cfg.seq_len, LANE), batch,
                           itemsize=1))


def prep_int8_latency(qparams: Params, cfg: vit_mod.ViTConfig) -> Params:
    """One-time fold for :func:`vit_forward_int8_latency`'s CLS-LAST
    embed (posb table with patch rows first, prefix rows after — see
    models/vit.prep_latency).  The embed weight is dequantized back to
    bf16 for the transpose-free dotg embed: the embed GEMM is <1% of
    model FLOPs and latency-bound, so int8 buys nothing there, while
    bf16 drops the activation row-quant error.  Call OUTSIDE the
    per-request jit."""
    from ..ops.common import pad_sublane, round_up
    n, d = cfg.seq_len, cfg.hidden_dim
    npre = cfg.num_prefix_tokens
    n_pad = round_up(n, pad_sublane(jnp.bfloat16))
    pe = qparams["patch_embed"]
    pos = qparams["pos_embed"][0].astype(jnp.float32)
    pre = qparams["cls_token"][0].astype(jnp.float32)
    posb = jnp.concatenate([
        pos[npre:] + pe["b"].astype(jnp.float32),   # patch rows
        pre + pos[:npre],                           # prefix rows
        jnp.zeros((n_pad - n, d), jnp.float32),
    ], axis=0)
    wp = (pe["wq"].astype(jnp.float32)
          * pe["ws"].astype(jnp.float32)).astype(jnp.bfloat16)
    out = {
        "wp_cl": wp,
        "posb_cl": posb,
        "blocks": qparams["blocks"],
        "lfs": qparams["ln_f_scale"],
        "lfb": qparams["ln_f_bias"],
    }
    if "head" in qparams:
        out["head"] = qparams["head"]
    return out


def vit_forward_int8_latency(qparams: Params, images: jax.Array,
                             cfg: vit_mod.ViTConfig) -> jax.Array:
    """Small-batch int8 forward through the single-launch encoder: int8
    weights HALVE the per-layer weight stream the batch-1 path waits on
    (see ops/vit_stack.py).  The embed stage is the transpose-free dotg
    with prefix rows LAST (ops/patch_embed.embed_tokens_dotg; bf16
    dequantized weight — see :func:`prep_int8_latency`).  ``qparams``
    may be the plain quantize_vit_fast tree or the fold.
    Inference-only."""
    from ..ops.patch_embed import embed_tokens_dotg
    from ..ops.vit_stack import (vit_layers_int8_pallas,
                                 vit_layers_int8_static_pallas)
    dt = jnp.bfloat16
    n, npre = cfg.seq_len, cfg.num_prefix_tokens
    npch = n - npre
    act = "quick_gelu" if cfg.hidden_act == "quick_gelu" else "gelu_tanh"
    prep = (qparams if "posb_cl" in qparams
            else prep_int8_latency(qparams, cfg))
    x = embed_tokens_dotg(images.astype(dt), prep["wp_cl"],
                          prep["posb_cl"], cfg.patch_size, npre,
                          prefix_last=True)
    if "inv_ao" in prep["blocks"]:   # calibrated static-scale tree
        toks = vit_layers_int8_static_pallas(x, prep["blocks"],
                                             cfg.num_heads, eps=cfg.ln_eps,
                                             act=act, n_valid=n)
    else:
        toks = vit_layers_int8_pallas(x, prep["blocks"], cfg.num_heads,
                                      eps=cfg.ln_eps, act=act, n_valid=n)
    pooled_rows = toks[:, npch:npch + 1]   # CLS moved to the end
    cls_t = vit_mod._layernorm(pooled_rows, prep["lfs"], prep["lfb"],
                               cfg.ln_eps)
    if "head" not in prep:
        return cls_t[:, 0].astype(jnp.float32)
    hd = prep["head"]
    return _fused_lin(cls_t, hd["wq"], hd["ws"], hd["b"])[:, 0].astype(
        jnp.float32)


def full_int8_latency_supported(qparams: Params, cfg: vit_mod.ViTConfig,
                                batch: int) -> bool:
    """Gate for :func:`vit_forward_int8_latency_logits`."""
    from ..ops.common import LANE, pad_sublane, round_up
    from ..ops.vit_stack import stack_full_plan
    if (cfg.pool != "cls" or cfg.num_prefix_tokens != 1
            or batch > 4 or "head" not in qparams
            or cfg.num_classes < 1):
        return False
    n_pad = round_up(cfg.seq_len, pad_sublane(jnp.bfloat16))
    kv_pad = round_up(cfg.seq_len, LANE)
    p3 = cfg.patch_size * cfg.patch_size * 3
    cls_pad = round_up(cfg.num_classes, LANE)
    return stack_full_plan(cfg.num_heads, cfg.hidden_dim, cfg.mlp_dim,
                           n_pad, kv_pad, batch, p3, cls_pad, 1) >= 2


def prep_full_int8_latency(qparams: Params,
                           cfg: vit_mod.ViTConfig) -> Params:
    """One-time fold for :func:`vit_forward_int8_latency_logits` (posb
    table + 128-padded int8 head); call outside the per-request jit."""
    from ..ops.common import LANE, pad_sublane, round_up
    n, d = cfg.seq_len, cfg.hidden_dim
    npre = cfg.num_prefix_tokens
    n_pad = round_up(n, pad_sublane(jnp.bfloat16))
    pe = qparams["patch_embed"]
    pos = qparams["pos_embed"][0].astype(jnp.float32)
    pre = qparams["cls_token"][0].astype(jnp.float32)
    posb = jnp.concatenate([
        pre + pos[:npre],
        pos[npre:] + pe["b"].astype(jnp.float32),
        jnp.zeros((n_pad - n, d), jnp.float32),
    ], axis=0)
    ncls = cfg.num_classes
    cls_pad = round_up(ncls, LANE)
    hd = qparams["head"]
    return {
        "wpq": pe["wq"],
        "wps": pe["ws"],
        "posb": posb,
        "blocks": qparams["blocks"],
        "lfs": qparams["ln_f_scale"],
        "lfb": qparams["ln_f_bias"],
        "whq": jnp.pad(hd["wq"], [(0, 0), (0, cls_pad - ncls)]),
        "whs": jnp.pad(hd["ws"].astype(jnp.float32),
                       [(0, cls_pad - ncls)], constant_values=1.0),
        "bh": jnp.pad(hd["b"].astype(jnp.float32),
                      [(0, cls_pad - ncls)]),
    }


def vit_forward_int8_latency_logits(qparams: Params, images: jax.Array,
                                    cfg: vit_mod.ViTConfig,
                                    interpret: bool = False) -> jax.Array:
    """ONE-kernel int8 ViT forward: embed/layers/head all run int8 GEMMs
    with in-kernel row quantization inside a single pallas_call
    (ops/vit_stack.vit_full_int8_pallas).  Inference-only.  ``qparams``
    may be the quantize_vit_fast tree or the
    :func:`prep_full_int8_latency` fold."""
    from ..ops.common import pad_sublane, round_up
    from ..ops.vit_stack import vit_full_int8_pallas
    dt = jnp.bfloat16
    n = cfg.seq_len
    npre = cfg.num_prefix_tokens
    n_pad = round_up(n, pad_sublane(jnp.bfloat16))
    prep = qparams if "posb" in qparams else prep_full_int8_latency(
        qparams, cfg)
    p = vit_mod.patchify(images.astype(dt), cfg.patch_size)
    pp = jnp.pad(p, [(0, 0), (npre, n_pad - n), (0, 0)])
    act = "quick_gelu" if cfg.hidden_act == "quick_gelu" else "gelu_tanh"
    out = vit_full_int8_pallas(
        pp, prep["wpq"], prep["wps"], prep["posb"], prep["blocks"],
        prep["lfs"], prep["lfb"], prep["whq"], prep["whs"], prep["bh"],
        cfg.num_heads, eps=cfg.ln_eps, act=act, n_tokens=n, npre=npre,
        interpret=interpret)
    cls_pad = prep["whq"].shape[-1]
    return out.reshape(images.shape[0],
                       npre * cls_pad)[:, :cfg.num_classes]


# ---------------------------------------------------------------------------
# CLIP vision tower int8 (round 3): the blocks are plain ViT blocks, so
# the fast-int8 machinery applies directly; ln_pre stays f32 VPU work and
# the final projection stays f32 (a single small GEMM — quantizing it
# costs accuracy for ~0 time).  Closes the round-2 exporter gap
# ("int8 export supports the ViT classifier family only").
# ---------------------------------------------------------------------------

def quantize_clip_vision_fast(params: Params) -> Params:
    """Per-output-column int8 weights for a CLIP vision tower
    (models/clip.py param layout: ViT params + ln_pre_* + proj)."""
    out = quantize_vit_fast(params)
    out["ln_pre_scale"] = jnp.asarray(params["ln_pre_scale"])
    out["ln_pre_bias"] = jnp.asarray(params["ln_pre_bias"])
    out["proj"] = jnp.asarray(params["proj"])
    return out


def clip_forward_int8_fast(qparams: Params, images: jax.Array,
                           cfg: vit_mod.ViTConfig) -> jax.Array:
    """Fast int8 CLIP image encoder: normalized images -> embeddings.
    Semantics mirror models/clip.forward with the int8 block kernels
    (incl. the transpose-free bf16 dotg embed — see
    vit_forward_int8_fast; CLIP pads AFTER its pre-LN, so no tail rows
    in the posb table)."""
    from ..ops.patch_embed import embed_tokens_dotg
    dt = jnp.bfloat16
    d = cfg.hidden_dim
    pe = qparams["patch_embed"]
    pos = qparams["pos_embed"][0].astype(jnp.float32)
    pre = qparams["cls_token"][0].astype(jnp.float32)
    posb = jnp.concatenate([pre + pos[:1],
                            pos[1:] + pe["b"].astype(jnp.float32)], axis=0)
    wp = (pe["wq"].astype(jnp.float32)
          * pe["ws"].astype(jnp.float32)).astype(dt)
    x = embed_tokens_dotg(images.astype(dt), wp, posb, cfg.patch_size, 1)
    x = vit_mod._layernorm(x, qparams["ln_pre_scale"],
                           qparams["ln_pre_bias"], cfg.ln_eps)

    n = cfg.seq_len
    from ..ops.common import pad_sublane, round_up
    n_pad = round_up(n, pad_sublane(jnp.bfloat16))
    if n_pad != n:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])
    if _int8_stats_chain_supported(cfg, x.shape[0]):
        x = _encoder_int8_stats_chain(x, qparams["blocks"], cfg, n)
    else:
        for i in range(cfg.depth):
            blk = jax.tree_util.tree_map(lambda a: a[i],
                                         qparams["blocks"])
            x = _qblock_fast(x, blk, cfg, n_valid=n)
    pooled = vit_mod._layernorm(x[:, :1], qparams["ln_f_scale"],
                                qparams["ln_f_bias"], cfg.ln_eps)[:, 0]
    return pooled.astype(jnp.float32) @ qparams["proj"]


def clip_int8_latency_supported(cfg: vit_mod.ViTConfig,
                                batch: int) -> bool:
    """Gate for :func:`clip_forward_int8_latency` (single-launch int8
    stack at CLIP geometry)."""
    return int8_latency_supported(cfg, batch)


def clip_forward_int8_latency(qparams: Params, images: jax.Array,
                              cfg: vit_mod.ViTConfig) -> jax.Array:
    """Small-batch int8 CLIP image encoder through the single-launch
    stack (see vit_forward_int8_latency): int8 weights HALVE the
    per-layer weight stream the batch-1 path waits on.  ``qparams`` is
    the quantize_clip_vision_fast or quantize_clip_vision_static tree;
    embed + ln_pre + final LN + projection stay outside the kernel,
    like models/clip.forward_latency."""
    from ..ops.common import pad_sublane, round_up
    from ..ops.patch_embed import embed_tokens_dotg
    from ..ops.vit_stack import (vit_layers_int8_pallas,
                                 vit_layers_int8_static_pallas)
    dt = jnp.bfloat16
    pe = qparams["patch_embed"]
    pos = qparams["pos_embed"][0].astype(jnp.float32)
    pre = qparams["cls_token"][0].astype(jnp.float32)
    posb = jnp.concatenate([pre + pos[:1],
                            pos[1:] + pe["b"].astype(jnp.float32)], axis=0)
    wp = (pe["wq"].astype(jnp.float32)
          * pe["ws"].astype(jnp.float32)).astype(dt)
    x = embed_tokens_dotg(images.astype(dt), wp, posb, cfg.patch_size, 1)
    x = vit_mod._layernorm(x, qparams["ln_pre_scale"],
                           qparams["ln_pre_bias"], cfg.ln_eps)
    n = cfg.seq_len
    n_pad = round_up(n, pad_sublane(dt))
    if n_pad != n:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])
    act = "quick_gelu" if cfg.hidden_act == "quick_gelu" else "gelu_tanh"
    if "inv_ao" in qparams["blocks"]:   # calibrated static-scale tree
        toks = vit_layers_int8_static_pallas(x, qparams["blocks"],
                                             cfg.num_heads, eps=cfg.ln_eps,
                                             act=act, n_valid=n)
    else:
        toks = vit_layers_int8_pallas(x, qparams["blocks"], cfg.num_heads,
                                      eps=cfg.ln_eps, act=act, n_valid=n)
    pooled = vit_mod._layernorm(toks[:, :1], qparams["ln_f_scale"],
                                qparams["ln_f_bias"], cfg.ln_eps)[:, 0]
    return pooled.astype(jnp.float32) @ qparams["proj"]


# ---------------------------------------------------------------------------
# Serving entries: raw uint8 -> logits/embeddings, one XLA program.
#
# The reference serves its quantized datapath behind the SAME API as the
# float one (/root/reference/include/netAbstract.h:8-21 — one
# launch_forward regardless of DATA_TYPE); these give the int8 engines
# the same raw-image signature as vit.forward_raw / clip.forward_raw so
# runtime/serving.ImageServer and cli serve can swap datapaths freely.
# ---------------------------------------------------------------------------

def vit_forward_int8_raw(qparams: Params, images_u8: jax.Array,
                         cfg: vit_mod.ViTConfig) -> jax.Array:
    """Raw uint8 images -> logits through the fast int8 engine."""
    return vit_forward_int8_fast(qparams, vit_mod.preprocess(images_u8, cfg),
                                 cfg)


def clip_forward_int8_raw(qparams: Params, images_u8: jax.Array,
                          cfg: vit_mod.ViTConfig) -> jax.Array:
    """Raw uint8 images -> CLIP embeddings through the int8 engine."""
    return clip_forward_int8_fast(qparams,
                                  vit_mod.preprocess(images_u8, cfg), cfg)


def jit_forward_int8(cfg: vit_mod.ViTConfig, raw: bool = False,
                     clip: bool = False):
    """Compile-once int8 serving entry (mirrors vit.jit_forward)."""
    import functools

    if clip:
        fn = clip_forward_int8_raw if raw else clip_forward_int8_fast
    else:
        fn = vit_forward_int8_raw if raw else vit_forward_int8_fast
    return jax.jit(functools.partial(fn, cfg=cfg))
