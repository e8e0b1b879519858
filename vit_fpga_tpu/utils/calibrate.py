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
