"""Attention-score calibration: validate checkpoints against the max-free
softmax clip window (VERDICT r2 #7 / ADVICE r2).

The fused attention kernels' fast path uses the max-free softmax
``exp(clip(s, -70, 80))`` (ops/attn_block.py) — exact while every row's
scores keep one valid key above -70 and none above 80.  Trained ViT/CLIP
checkpoints sit comfortably inside that window (|s| ~ 40), but a NEWLY
imported checkpoint with hotter attention logits (attention-logit growth
in large models) would silently saturate.  This module measures the
actual per-layer score range on a calibration batch and routes hot
checkpoints to the exact max-subtract kernels (``cfg.safe_softmax``).

Usage (after any HF import / before serving a new checkpoint):

    cfg = calibrate.calibrated_config(params, cfg)        # synthetic batch
    cfg = calibrate.calibrated_config(params, cfg, images)  # real batch

Training never relies on this: train-step builders force
``safe_softmax=True`` (logits evolve; the backward is exact max-subtract
and forward must describe the same function).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .log import get_logger

_log = get_logger("calibrate")

# mirror ops/attn_block.py's window; margin guards calibration-batch
# coverage (real inputs can run somewhat hotter than the probe batch)
_EXP_LO, _EXP_HI = -70.0, 80.0
DEFAULT_MARGIN = 2.0


class CalibrationResult(NamedTuple):
    score_max: float         # max score over layers/heads/valid positions
    score_min: float
    per_layer_max: np.ndarray
    safe: bool               # True -> route to max-subtract softmax

    @property
    def mode(self) -> str:
        return "safe" if self.safe else "maxfree"


def attn_score_stats(params: Dict[str, Any], images: jax.Array, cfg
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-layer (max, min) attention scores over the batch, exact XLA
    math (runs on any backend).  ``images`` are normalized model inputs
    (B, S, S, 3)."""
    from ..models import vit
    from ..ops.attn_block import attn_block_xla
    from ..ops.fused_mlp import fused_mlp_xla

    dt = cfg.compute_dtype
    n, d = cfg.seq_len, cfg.hidden_dim
    nh = cfg.num_heads
    dh = d // nh
    scale = 1.0 / (dh ** 0.5)
    act = cfg.hidden_act
    if act == "gelu" and dt == jnp.bfloat16:
        act = "gelu_tanh"

    @jax.jit
    def probe(params, images):
        x = vit.patchify(images.astype(dt), cfg.patch_size)
        x = x @ params["patch_embed"]["kernel"].astype(dt)
        x = x + params["patch_embed"]["bias"].astype(dt)
        b = x.shape[0]
        cls = jnp.broadcast_to(params["cls_token"].astype(dt),
                               (b, cfg.num_prefix_tokens, d))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + params["pos_embed"].astype(dt)

        maxs, mins = [], []
        for i in range(cfg.depth):
            blk = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.var(xf, axis=-1, keepdims=True)
            xn = ((xf - mu) * jax.lax.rsqrt(var + cfg.ln_eps)
                  * blk["ln1_scale"] + blk["ln1_bias"]).astype(dt)
            qkv = (jnp.dot(xn, blk["wqkv"].astype(dt),
                           preferred_element_type=jnp.float32)
                   + blk["bqkv"])
            q = qkv[..., :d].reshape(b, n, nh, dh)
            k = qkv[..., d:2 * d].reshape(b, n, nh, dh)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            maxs.append(jnp.max(s))
            mins.append(jnp.min(s))
            # advance x with the exact reference block
            x = attn_block_xla(x, blk["ln1_scale"], blk["ln1_bias"],
                               blk["wqkv"], blk["bqkv"], blk["wo"],
                               blk["bo"], nh, cfg.ln_eps)
            t = x.reshape(b * n, d)
            t = fused_mlp_xla(t, blk["ln2_scale"], blk["ln2_bias"],
                              blk["w1"], blk["b1"], blk["w2"], blk["b2"],
                              eps=cfg.ln_eps, act=act)
            x = t.reshape(b, n, d)
        return jnp.stack(maxs), jnp.stack(mins)

    with jax.default_matmul_precision(
            "float32" if cfg.dtype == "float32" else "default"):
        maxs, mins = probe(params, images)
    return np.asarray(maxs), np.asarray(mins)


def _synthetic_batch(cfg, batch: int = 4, seed: int = 0) -> jax.Array:
    """Deterministic probe batch in the normalized-input domain, at
    several amplitudes so score growth with input energy is sampled."""
    rng = np.random.default_rng(seed)
    s = cfg.image_size
    x = rng.normal(size=(batch, s, s, 3)).astype(np.float32)
    scales = np.asarray([0.5, 1.0, 1.5, 2.0][:batch],
                        np.float32).reshape(-1, 1, 1, 1)
    return jnp.asarray(x * scales)


def choose_softmax_mode(params: Dict[str, Any], cfg,
                        images: Optional[jax.Array] = None,
                        margin: float = DEFAULT_MARGIN
                        ) -> CalibrationResult:
    """Measure the checkpoint's attention-score range and decide between
    the max-free fast path and the exact max-subtract path."""
    if images is None:
        images = _synthetic_batch(cfg)
    maxs, mins = attn_score_stats(params, images, cfg)
    smax, smin = float(maxs.max()), float(mins.min())
    safe = not (smax * margin <= _EXP_HI and smin * margin >= _EXP_LO)
    res = CalibrationResult(smax, smin, maxs, safe)
    _log.info(
        "softmax calibration: score range [%.1f, %.1f] (margin %.1fx, "
        "window [%.0f, %.0f]) -> %s path", smin, smax, margin,
        _EXP_LO, _EXP_HI, res.mode)
    return res


def calibrated_config(params: Dict[str, Any], cfg,
                      images: Optional[jax.Array] = None,
                      margin: float = DEFAULT_MARGIN):
    """Return ``cfg`` with ``safe_softmax`` set from a calibration run —
    call after importing any new checkpoint (utils/checkpoint.py)."""
    res = choose_softmax_mode(params, cfg, images, margin)
    return dataclasses.replace(cfg, safe_softmax=res.safe)


# ---------------------------------------------------------------------------
# Static-scale int8 calibration (round 5): per-tensor-per-layer activation
# absmax for the calibrated fixed-point datapath — the reference's
# quantized range is static (/root/reference/def/defines.h:11-12), and the
# dynamic int8 kernels' measured bound is per-row quant VPU work
# (docs/perf.md).  models/quantized.quantize_vit_static folds these
# scales into the kernel arguments.
# ---------------------------------------------------------------------------


def activation_absmax_stats(params: Dict[str, Any], images: jax.Array,
                            cfg) -> Dict[str, np.ndarray]:
    """Per-layer absmax of the four quantized activations over the
    calibration batch, exact XLA math (any backend):

      a_x1  post-LN1 tokens  (QKV projection input)
      a_q   query activations (int8 score GEMM input, round 5)
      a_k   key activations   (int8 score GEMM input, round 5)
      a_v   value activations (int8 PV GEMM input, round 5)
      a_ao  attention output (out-projection input)
      a_x2  post-LN2 tokens  (MLP up-projection input)
      a_h   post-activation MLP hidden (down-projection input)

    ``images`` are normalized model inputs (B, S, S, 3); for CLIP-layout
    params the ln_pre stage is applied first (models/clip.py).
    """
    from ..models import vit
    from ..ops.attention import mha_qkv_xla
    from ..ops.fused_mlp import fused_mlp_xla

    dt = cfg.compute_dtype
    d = cfg.hidden_dim
    nh = cfg.num_heads
    act = cfg.hidden_act
    if act == "gelu" and dt == jnp.bfloat16:
        act = "gelu_tanh"
    is_clip = "ln_pre_scale" in params

    def _ln(x, s, b):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        return (xf - mu) * jax.lax.rsqrt(var + cfg.ln_eps) * s + b

    def _act_f(h):
        if act in ("gelu", "gelu_tanh"):
            return jax.nn.gelu(h, approximate=True)
        if act == "quick_gelu":
            return h * jax.nn.sigmoid(1.702 * h)
        if act == "relu":
            return jnp.maximum(h, 0.0)
        raise ValueError(act)

    @jax.jit
    def probe(params, images):
        x = vit.patchify(images.astype(dt), cfg.patch_size)
        x = x @ params["patch_embed"]["kernel"].astype(dt)
        x = x + params["patch_embed"]["bias"].astype(dt)
        b = x.shape[0]
        cls = jnp.broadcast_to(params["cls_token"].astype(dt),
                               (b, cfg.num_prefix_tokens, d))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + params["pos_embed"].astype(dt)
        if is_clip:
            x = _ln(x, params["ln_pre_scale"],
                    params["ln_pre_bias"]).astype(dt)

        n = x.shape[1]
        stats = {"a_x1": [], "a_q": [], "a_k": [], "a_v": [],
                 "a_ao": [], "a_x2": [], "a_h": []}
        for i in range(cfg.depth):
            blk = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
            xn1 = _ln(x, blk["ln1_scale"], blk["ln1_bias"])
            stats["a_x1"].append(jnp.max(jnp.abs(xn1)))
            qkv = (jnp.dot(xn1.astype(dt), blk["wqkv"].astype(dt),
                           preferred_element_type=jnp.float32)
                   + blk["bqkv"]).astype(dt)
            qf = qkv.astype(jnp.float32)
            stats["a_q"].append(jnp.max(jnp.abs(qf[..., :d])))
            stats["a_k"].append(jnp.max(jnp.abs(qf[..., d:2 * d])))
            stats["a_v"].append(jnp.max(jnp.abs(qf[..., 2 * d:])))
            o = mha_qkv_xla(qkv, nh).astype(jnp.float32)
            stats["a_ao"].append(jnp.max(jnp.abs(o)))
            x = x + (jnp.dot(o.astype(dt), blk["wo"].astype(dt),
                             preferred_element_type=jnp.float32)
                     + blk["bo"]).astype(dt)
            xn2 = _ln(x, blk["ln2_scale"], blk["ln2_bias"])
            stats["a_x2"].append(jnp.max(jnp.abs(xn2)))
            h = (jnp.dot(xn2.astype(dt), blk["w1"].astype(dt),
                         preferred_element_type=jnp.float32) + blk["b1"])
            h = _act_f(h)
            stats["a_h"].append(jnp.max(jnp.abs(h)))
            x = x + (jnp.dot(h.astype(dt), blk["w2"].astype(dt),
                             preferred_element_type=jnp.float32)
                     + blk["b2"]).astype(dt)
            # keep the trajectory exact: recompute the halves with the
            # reference blocks (the loop above IS the reference math)
        return {k: jnp.stack(v) for k, v in stats.items()}

    with jax.default_matmul_precision(
            "float32" if cfg.dtype == "float32" else "default"):
        out = probe(params, images)
    return {k: np.asarray(v, np.float32) for k, v in out.items()}


def static_activation_scales(params: Dict[str, Any], cfg,
                             images: Optional[jax.Array] = None,
                             margin: float = 1.0
                             ) -> Dict[str, np.ndarray]:
    """Calibrated per-layer activation quant scales a = absmax * margin
    (each quantized tensor maps [-a, a] onto [-127, 127]; values beyond
    a saturate).  ``margin > 1`` trades resolution for headroom."""
    if images is None:
        images = _synthetic_batch(cfg)
    stats = activation_absmax_stats(params, images, cfg)
    return {k: np.maximum(v * margin, 1e-12) for k, v in stats.items()}
