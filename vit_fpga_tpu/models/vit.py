"""Vision Transformer family — the models the reference was built to serve.

The reference repo advertises ViT ("VIT-FPGA") but ships only the host
dispatch layer; the transformer blocks lived in missing FPGA bitstreams
(SURVEY.md §0).  This module supplies the full model family, TPU-first:

  * params are pytrees of stacked per-layer arrays; the encoder runs as one
    ``lax.scan`` over depth (single trace, fast compiles, XLA pipelining)
  * patch embedding is a reshape + one big GEMM (MXU-shaped), not a conv
  * attention dispatches to the fused Pallas kernel on TPU
    (:mod:`vit_fpga_tpu.ops.attention`)
  * preprocessing (resize + scale + normalize + patchify) is in-graph, so
    raw uint8 images -> logits is ONE jitted XLA program (BASELINE
    north_star: "image-side preprocessing fuses into the first kernel")
  * bf16 compute with f32 LayerNorm statistics and f32 logits

Weight-layout conventions match ``utils/checkpoint.py``'s HuggingFace
importer, so published ViT checkpoints load directly.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import mha_qkv

Params = Dict[str, Any]

# ImageNet normalization used by the original ViT / HF pipelines.
IMAGENET_MEAN = (0.5, 0.5, 0.5)
IMAGENET_STD = (0.5, 0.5, 0.5)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    num_classes: int = 1000
    ln_eps: float = 1e-6
    dtype: str = "bfloat16"          # compute dtype; params stay f32
    attn_impl: str = "auto"          # auto | pallas | xla
    pool: str = "cls"                # cls | gap
    # Prefix (non-patch) tokens prepended to the sequence: 1 = CLS only
    # (ViT), 2 = CLS + distillation token (DeiT; models/deit.py).  All
    # prefix embeddings live in params["cls_token"] (1, P, D).
    num_prefix_tokens: int = 1
    hidden_act: str = "gelu"         # gelu (erf) | gelu_tanh | quick_gelu
    mlp_impl: str = "auto"           # auto | pallas (fused) | xla
    # Exact max-subtract softmax in the fused attention kernels instead
    # of the max-free exp(clip(s)) fast path.  Set (or auto-set via
    # utils/calibrate.choose_softmax_mode) for checkpoints whose
    # attention logits can leave the [-70, 80] clip window; training
    # forces it on so forward and backward describe the same function
    # at any logit magnitude.
    safe_softmax: bool = False
    remat: bool = False              # jax.checkpoint each block (training)
    # None = auto: unrolled python loop for inference (measured 1.2 ms/step
    # faster than lax.scan at ViT-B b64 — scan's per-layer weight slices
    # feeding custom calls cost real HBM), lax.scan when remat is on
    # (training wants the single-trace scan for compile time + memory).
    scan_blocks: Optional[bool] = None
    mean: Tuple[float, ...] = IMAGENET_MEAN
    std: Tuple[float, ...] = IMAGENET_STD
    # Optional NamedSharding applied to the (B, N, D) activations between
    # transformer blocks (Megatron-SP; see parallel.sharding).  Carried in
    # the config — NOT process state — so independently-traced models can't
    # inherit it by accident.  NamedSharding is hashable, so the frozen
    # dataclass stays usable as a static jit argument.
    activation_sharding: Any = None

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.n_patches + self.num_prefix_tokens

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


# Standard variants (Ti/S/B/L/H at the reference-relevant resolutions).
VARIANTS: Dict[str, Dict[str, int]] = {
    "vit_ti16": dict(patch_size=16, hidden_dim=192, depth=12, num_heads=3,
                     mlp_dim=768),
    "vit_s16": dict(patch_size=16, hidden_dim=384, depth=12, num_heads=6,
                    mlp_dim=1536),
    "vit_b16": dict(patch_size=16, hidden_dim=768, depth=12, num_heads=12,
                    mlp_dim=3072),
    "vit_b32": dict(patch_size=32, hidden_dim=768, depth=12, num_heads=12,
                    mlp_dim=3072),
    "vit_l16": dict(patch_size=16, hidden_dim=1024, depth=24, num_heads=16,
                    mlp_dim=4096),
    "vit_l14": dict(patch_size=14, hidden_dim=1024, depth=24, num_heads=16,
                    mlp_dim=4096),
    "vit_h14": dict(patch_size=14, hidden_dim=1280, depth=32, num_heads=16,
                    mlp_dim=5120),
}


def config(variant: str, image_size: int = 224, **overrides) -> ViTConfig:
    if variant not in VARIANTS:
        raise ValueError(
            f"unknown variant {variant!r}; have {sorted(VARIANTS)}")
    return ViTConfig(image_size=image_size, **VARIANTS[variant], **overrides)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def init_params(key: jax.Array, cfg: ViTConfig) -> Params:
    """Truncated-normal ViT init; per-block arrays stacked on a leading
    depth axis so the encoder can run under one ``lax.scan``."""
    d, l, m = cfg.hidden_dim, cfg.depth, cfg.mlp_dim
    p3 = cfg.patch_size * cfg.patch_size * 3
    ks = jax.random.split(key, 8)

    def tn(k, shape, std=0.02):
        return (std * jax.random.truncated_normal(
            k, -2.0, 2.0, shape)).astype(jnp.float32)

    return {
        "patch_embed": {"kernel": tn(ks[0], (p3, d)),
                        "bias": jnp.zeros((d,), jnp.float32)},
        "cls_token": jnp.zeros((1, cfg.num_prefix_tokens, d), jnp.float32),
        "pos_embed": tn(ks[1], (1, cfg.seq_len, d)),
        "blocks": {
            "ln1_scale": jnp.ones((l, d), jnp.float32),
            "ln1_bias": jnp.zeros((l, d), jnp.float32),
            "wqkv": tn(ks[2], (l, d, 3 * d)),
            "bqkv": jnp.zeros((l, 3 * d), jnp.float32),
            "wo": tn(ks[3], (l, d, d)),
            "bo": jnp.zeros((l, d), jnp.float32),
            "ln2_scale": jnp.ones((l, d), jnp.float32),
            "ln2_bias": jnp.zeros((l, d), jnp.float32),
            "w1": tn(ks[4], (l, d, m)),
            "b1": jnp.zeros((l, m), jnp.float32),
            "w2": tn(ks[5], (l, m, d)),
            "b2": jnp.zeros((l, d), jnp.float32),
        },
        "ln_f_scale": jnp.ones((d,), jnp.float32),
        "ln_f_bias": jnp.zeros((d,), jnp.float32),
        "head": {"kernel": tn(ks[6], (d, cfg.num_classes)),
                 "bias": jnp.zeros((cfg.num_classes,), jnp.float32)},
    }


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def interpolate_pos_embed(params: Params, old_image_size: int,
                          new_image_size: int, patch_size: int) -> Params:
    """Bicubic-resize the learned position grid so checkpoints trained at
    one resolution serve at another (e.g. ViT-L/16 @224 -> @384, BASELINE
    config 4).  The CLS token's embedding is carried over unchanged."""
    if old_image_size == new_image_size:
        return params
    old_g = old_image_size // patch_size
    new_g = new_image_size // patch_size
    pos = params["pos_embed"]          # (1, old_g^2 + P, D)
    d = pos.shape[-1]
    npre = params["cls_token"].shape[1]
    cls_pos, grid_pos = pos[:, :npre], pos[:, npre:]
    grid = grid_pos.reshape(1, old_g, old_g, d).astype(jnp.float32)
    grid = jax.image.resize(grid, (1, new_g, new_g, d), method="cubic")
    new_pos = jnp.concatenate(
        [cls_pos, grid.reshape(1, new_g * new_g, d).astype(pos.dtype)],
        axis=1)
    out = dict(params)
    out["pos_embed"] = new_pos
    return out


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layernorm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, 3) -> (B, N, patch*patch*3), row-major patch grid, pixel
    order (py, px, c) — one reshape/transpose, zero copies after fusion."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)


def preprocess(images_u8: jax.Array, cfg: ViTConfig) -> jax.Array:
    """uint8 (B, h, w, 3) -> normalized compute-dtype (B, S, S, 3), in-graph
    (resize + scale + normalize fuse into the first XLA program)."""
    x = images_u8.astype(jnp.float32) / 255.0
    s = cfg.image_size
    if images_u8.shape[1:3] != (s, s):
        x = jax.image.resize(x, (x.shape[0], s, s, 3), method="bilinear")
    x = (x - jnp.asarray(cfg.mean)) / jnp.asarray(cfg.std)
    return x.astype(cfg.compute_dtype)


def _attn_block_fits(cfg: ViTConfig) -> bool:
    """VMEM budget check for the fused attention-half mega-kernel (delegates
    to the kernel's own tier planner)."""
    from ..ops.attn_block import attn_plan
    from ..ops.common import LANE, pad_sublane_itemsize, round_up
    itemsize = 2 if cfg.dtype == "bfloat16" else 4
    n_pad = round_up(cfg.seq_len, pad_sublane_itemsize(itemsize))
    kv_pad = round_up(cfg.seq_len, LANE)
    return attn_plan(cfg.num_heads, cfg.hidden_dim, n_pad, kv_pad,
                     itemsize).n_sc >= 1


def _block(x, blk, cfg: ViTConfig, n_valid: int | None = None):
    """One pre-LN transformer block. ``blk`` holds this layer's params.

    Attention runs on the PACKED (B, N, 3D) qkv tensor — the fused Pallas
    kernel (or the einsum fallback) slices per-head q/k/v internally, so
    no head-split transpose ever materializes in HBM.  ``n_valid`` masks
    key/value columns >= n_valid (padded-residency encoders pass tokens
    already sublane-padded, so no per-layer pad/slice copies happen).
    """
    b, n, d = x.shape
    dt = cfg.compute_dtype

    attn_impl = cfg.attn_impl
    if attn_impl == "auto":
        attn_impl = ("pallas" if jax.default_backend() == "tpu"
                     else "xla")
    if attn_impl == "pallas" and _attn_block_fits(cfg):
        # whole attention half in one kernel (LN+QKV+MHA+proj+residual);
        # differentiable (Pallas fwd, XLA-recompute bwd)
        from ..ops.attn_block import attn_block
        x = attn_block(
            x, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv"],
            blk["bqkv"], blk["wo"], blk["bo"], cfg.num_heads,
            cfg.ln_eps, n_valid, cfg.safe_softmax)
    else:
        h = _layernorm(x, blk["ln1_scale"], blk["ln1_bias"], cfg.ln_eps)
        qkv = h @ blk["wqkv"].astype(dt) + blk["bqkv"].astype(dt)
        # pass cfg.attn_impl (not the locally resolved value) so "auto"
        # keeps its long-sequence flash routing inside mha_qkv
        o = mha_qkv(qkv, cfg.num_heads, n_valid=n_valid,
                    impl=cfg.attn_impl)
        x = x + (o @ blk["wo"].astype(dt) + blk["bo"].astype(dt))

    mlp_impl = cfg.mlp_impl
    n_chunks = 1
    mlp_vmem = 0
    if mlp_impl == "auto":
        # auto picks the fused kernel when w1+w2 fit VMEM unchunked —
        # under the default plan, or (bf16 mid-size geometries: CLIP-L,
        # ViT-L) under the raised 48 MB plan, which measured faster than
        # both the chunked kernel and XLA
        # (experiments/perf_mlp_unchunked.py).  The chunked variant wins
        # standalone (0.738 vs 0.772 ms at ViT-L@384) but LOSES in the
        # full model (43.45 vs 41.26 ms — its HBM accumulator round-trip
        # fights the neighboring kernels' pipelining), so oversize models
        # (ViT-H) default to XLA; mlp_impl="pallas" still selects the
        # chunked kernel explicitly.
        from ..ops.fused_mlp import (MLP_BIG_VMEM, mlp_fits_raised,
                                     mlp_weight_chunks)
        itemsize = 2 if cfg.dtype == "bfloat16" else 4
        n_chunks = mlp_weight_chunks(cfg.hidden_dim, cfg.mlp_dim, itemsize)
        # The raised plan only wins when enough token rows amortize it:
        # CLIP-L b256 (70k rows) 866 -> 1011 img/s, but ViT-L@384 b16
        # (9.5k rows) 411 -> 396 — small sweeps keep the XLA path.
        if (n_chunks > 1 and itemsize == 2 and b * n >= 32768
                and mlp_fits_raised(cfg.hidden_dim, cfg.mlp_dim, itemsize)):
            n_chunks, mlp_vmem = 1, MLP_BIG_VMEM
        elif n_chunks == 1 and b * n >= 32768:
            # very long grids (ViT-B b>=160): Mosaic deepens its buffer
            # pipeline and the default 16 MB scoped plan OOMs at compile
            # time (observed at b256: 17.27M > 16M); raise the plan
            mlp_vmem = MLP_BIG_VMEM
        mlp_impl = ("pallas" if jax.default_backend() == "tpu"
                    and n_chunks == 1 else "xla")
    elif mlp_impl == "pallas":
        from ..ops.fused_mlp import mlp_weight_chunks
        itemsize = 2 if cfg.dtype == "bfloat16" else 4
        n_chunks = mlp_weight_chunks(cfg.hidden_dim, cfg.mlp_dim, itemsize)
        if n_chunks == 0:   # nothing fits VMEM even chunked -> XLA
            mlp_impl = "xla"
    act_name = cfg.hidden_act
    if act_name == "gelu" and dt == jnp.bfloat16:
        act_name = "gelu_tanh"  # see _hidden_act
    if mlp_impl == "pallas" and act_name == "gelu":
        mlp_impl = "xla"  # Mosaic has no erf/erfc lowering (f32 mode)
    if mlp_impl == "pallas":
        from ..ops.fused_mlp import fused_mlp, fused_mlp_chunked
        if n_chunks > 1:
            x2 = fused_mlp_chunked(
                x.reshape(b * n, d), blk["ln2_scale"], blk["ln2_bias"],
                blk["w1"].astype(dt), blk["b1"], blk["w2"].astype(dt),
                blk["b2"], cfg.ln_eps, act_name, n_chunks)
        else:
            x2 = fused_mlp(
                x.reshape(b * n, d), blk["ln2_scale"], blk["ln2_bias"],
                blk["w1"].astype(dt), blk["b1"], blk["w2"].astype(dt),
                blk["b2"], cfg.ln_eps, act_name, mlp_vmem)
        return x2.reshape(b, n, d)
    h = _layernorm(x, blk["ln2_scale"], blk["ln2_bias"], cfg.ln_eps)
    h = h @ blk["w1"].astype(dt) + blk["b1"].astype(dt)
    h = _hidden_act(h, cfg.hidden_act)
    x = x + (h @ blk["w2"].astype(dt) + blk["b2"].astype(dt))
    return x


def _hidden_act(x, name: str):
    if name == "gelu":
        # In bf16 the tanh approximation differs from erf-GELU by ~5e-4
        # relative — an order of magnitude below bf16's own resolution —
        # while XLA's erf costs ~4.6 ms/step on ViT-B/16 batch 64 (v5e
        # measurement). erf is only observable (and only used) in f32.
        if x.dtype == jnp.bfloat16:
            return jax.nn.gelu(x, approximate=True)
        return jax.nn.gelu(x, approximate=False)
    if name == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    if name == "quick_gelu":  # x * sigmoid(1.702 x) — OpenAI CLIP
        return x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(f"unknown hidden_act {name!r}")


def _precision_ctx(cfg: ViTConfig):
    """f32 mode forces true-f32 matmuls (XLA's 'default' runs f32 matmuls
    at reduced precision on TPU and some CPU builds); bf16 mode takes the
    fast single-pass MXU route."""
    return jax.default_matmul_precision(
        "float32" if cfg.dtype == "float32" else "default")


def _fused_embed(params: Params, images: jax.Array, cfg: ViTConfig,
                 n_pad: int) -> jax.Array:
    """Images -> PADDED (B, n_pad, D) tokens, prefix rows first.

    Transpose-free dotg embed (ops/patch_embed.embed_tokens_dotg): the
    patchify transpose — the stage's real cost, measured in
    experiments/perf_patchify.py — never happens; GEMM + bias +
    pos-embed + prefix rows + tail zeros assemble in one XLA program.
    The prefix (CLS/distill) rows ride a folded (n_pad, D) table."""
    from ..ops.patch_embed import embed_tokens_dotg
    dt = cfg.compute_dtype
    n, d = cfg.seq_len, cfg.hidden_dim
    npre = cfg.num_prefix_tokens
    pos = params["pos_embed"][0].astype(jnp.float32)      # (N, D)
    bias = params["patch_embed"]["bias"].astype(jnp.float32)
    pre = params["cls_token"][0].astype(jnp.float32)      # (P, D)
    posb = jnp.concatenate([
        pre + pos[:npre],                                  # prefix rows
        pos[npre:] + bias,                                 # patch rows
        jnp.zeros((n_pad - n, d), jnp.float32),            # tail
    ], axis=0)
    return embed_tokens_dotg(images.astype(dt),
                             params["patch_embed"]["kernel"].astype(dt),
                             posb, cfg.patch_size, npre)


# ---------------------------------------------------------------------------
# Stats-epilogue encoder chain (round 3): each fused kernel consumes the
# previous half's LayerNorm (mu, rstd) stats and emits the next half's at
# its tail — the consumer's VPU preamble loses its reductions, and the
# producer's reductions overlap its tail MXU work (measured -0.21 ms /
# 12 ViT-B layers, experiments/perf_attn_lnepi.py).  Math is bit-
# identical to the per-kernel one-pass LN.  The chain carries a custom
# VJP whose backward is the XLA-recompute of the whole encoder, so
# accidental differentiation is correct (training proper uses the
# per-block kernels with their native backward kernels — trainers force
# safe_softmax=True, which routes off this chain).
# ---------------------------------------------------------------------------


def _stats_chain_mlp_vmem(cfg: ViTConfig, rows: int) -> Optional[int]:
    """MLP plan for the stats chain: 0 = default unchunked plan,
    MLP_BIG_VMEM = raised-VMEM unchunked plan, a NEGATIVE value -n =
    chunked stats kernel with n chunks, None = ineligible (mirrors
    _block's MLP dispatch decisions)."""
    from ..ops.fused_mlp import (MLP_BIG_VMEM, mlp_fits_raised,
                                 mlp_weight_chunks)
    itemsize = 2 if cfg.dtype == "bfloat16" else 4
    n_chunks = mlp_weight_chunks(cfg.hidden_dim, cfg.mlp_dim, itemsize)
    if n_chunks == 1:
        # very long grids (ViT-B b>=160) need the raised scoped-VMEM
        # plan: Mosaic deepens its buffer pipeline with grid length and
        # the default 16 MB plan OOMs at compile time (observed at b256:
        # 17.27M > 16M for the stats MLP kernel)
        return MLP_BIG_VMEM if rows >= 32768 else 0
    if (n_chunks > 1 and itemsize == 2 and rows >= 32768
            and mlp_fits_raised(cfg.hidden_dim, cfg.mlp_dim, itemsize)):
        return MLP_BIG_VMEM
    if n_chunks == 2:
        # big-weight, few-row geometries (ViT-L family): chunked stats
        # kernel — saves the per-chunk LN reductions the plain chunked
        # path recomputes (measured +0.9% img/s at vit_l16@384 b16 and
        # +0.7% at the CLIP-L geometry, 4/4 rounds each,
        # perf_l384_chain.py / perf_chain_smallrows.py).  At n_chunks=4
        # (ViT-H) the chain LOSES 4/4 — each extra chunk re-reads the
        # token + residual tiles, outweighing the saved reductions — so
        # those geometries keep the per-layer dispatch.
        return -n_chunks
    return None


def _stats_chain_supported(cfg: ViTConfig, batch: int) -> bool:
    from ..ops.attn_block import attn_plan
    from ..ops.common import LANE, round_up
    if (jax.default_backend() != "tpu" or cfg.safe_softmax
            or cfg.attn_impl not in ("auto", "pallas")
            or cfg.mlp_impl not in ("auto", "pallas")
            or cfg.remat or cfg.scan_blocks
            or cfg.activation_sharding is not None):
        return False
    from ..ops.common import pad_sublane_itemsize
    itemsize = 2 if cfg.dtype == "bfloat16" else 4
    n_pad = round_up(cfg.seq_len, pad_sublane_itemsize(itemsize))
    kv_pad = round_up(cfg.seq_len, LANE)
    plan = attn_plan(cfg.num_heads, cfg.hidden_dim, n_pad, kv_pad,
                     itemsize, batch=batch)
    if plan.n_sc < 1 or plan.reuse_q:
        return False
    return _stats_chain_mlp_vmem(cfg, batch * n_pad) is not None


def _chain_act(cfg: ViTConfig) -> str:
    act = cfg.hidden_act
    if act == "gelu":
        return "gelu_tanh"   # Mosaic has no erf; see _hidden_act
    return act


def _encoder_chain_xla(blocks, x, cfg: ViTConfig, n_valid: int):
    """Exact reference of the chained encoder (for the VJP)."""
    from ..ops.attn_block import attn_block_xla
    from ..ops.fused_mlp import fused_mlp_xla
    b, n_pad, d = x.shape
    act = _chain_act(cfg)
    for i in range(cfg.depth):
        blk = jax.tree_util.tree_map(lambda a: a[i], blocks)
        x = attn_block_xla(x, blk["ln1_scale"], blk["ln1_bias"],
                           blk["wqkv"], blk["bqkv"], blk["wo"],
                           blk["bo"], cfg.num_heads, cfg.ln_eps, n_valid)
        t = fused_mlp_xla(x.reshape(b * n_pad, d), blk["ln2_scale"],
                          blk["ln2_bias"], blk["w1"], blk["b1"],
                          blk["w2"], blk["b2"], eps=cfg.ln_eps, act=act)
        x = t.reshape(b, n_pad, d)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _encoder_stats_chain(blocks, x, cfg: ViTConfig, n_valid: int,
                         mlp_vmem: int):
    from ..ops.attn_block import STATS_LANES, attn_block_stats_pallas
    from ..ops.fused_mlp import (fused_mlp_chunked_stats_pallas,
                                 fused_mlp_stats_pallas)
    b, n_pad, d = x.shape
    act = _chain_act(cfg)
    # initial LN1 stats (one cheap XLA pass over the embed output; XLA
    # fuses it with the embed epilogue)
    xf = x.reshape(b * n_pad, d).astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    st = jnp.zeros((b * n_pad, STATS_LANES), jnp.float32)
    st = st.at[:, 0:1].set(mu)
    st = st.at[:, 1:2].set(jax.lax.rsqrt(var + cfg.ln_eps))
    st = st.reshape(b, n_pad, STATS_LANES)
    for i in range(cfg.depth):
        blk = jax.tree_util.tree_map(lambda a: a[i], blocks)
        x, st = attn_block_stats_pallas(
            x, st, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv"],
            blk["bqkv"], blk["wo"], blk["bo"], cfg.num_heads,
            eps=cfg.ln_eps, n_valid=n_valid, emit_stats=True)
        last = i == cfg.depth - 1
        if mlp_vmem < 0:   # chunked stats kernel (-n = n chunks)
            t, st2 = fused_mlp_chunked_stats_pallas(
                x.reshape(b * n_pad, d),
                st.reshape(b * n_pad, STATS_LANES),
                blk["ln2_scale"], blk["ln2_bias"], blk["w1"], blk["b1"],
                blk["w2"], blk["b2"], eps=cfg.ln_eps, act=act,
                n_chunks=-mlp_vmem, emit_stats=not last)
        else:
            t, st2 = fused_mlp_stats_pallas(
                x.reshape(b * n_pad, d),
                st.reshape(b * n_pad, STATS_LANES),
                blk["ln2_scale"], blk["ln2_bias"], blk["w1"], blk["b1"],
                blk["w2"], blk["b2"], eps=cfg.ln_eps, act=act,
                vmem_limit=mlp_vmem, emit_stats=not last)
        x = t.reshape(b, n_pad, d)
        if not last:
            st = st2.reshape(b, n_pad, STATS_LANES)
    return x


def _encoder_stats_chain_fwd(blocks, x, cfg, n_valid, mlp_vmem):
    return _encoder_stats_chain(blocks, x, cfg, n_valid, mlp_vmem), (
        blocks, x)


def _encoder_stats_chain_bwd(cfg, n_valid, mlp_vmem, res, g):
    blocks, x = res
    _, vjp = jax.vjp(
        lambda bl, xx: _encoder_chain_xla(bl, xx, cfg, n_valid),
        blocks, x)
    return vjp(g)


_encoder_stats_chain.defvjp(_encoder_stats_chain_fwd,
                            _encoder_stats_chain_bwd)


def _forward_features(params: Params, images: jax.Array,
                      cfg: ViTConfig) -> jax.Array:
    """Normalized images -> PRE-final-LN tokens (B, N+1, D); callers
    apply the final LayerNorm (forward slices the CLS row first)."""
    dt = cfg.compute_dtype

    # Padded residency: produce/pad the token tensor ONCE in the sublane-
    # padded layout and keep it across all blocks (n_valid masks the pad
    # keys) instead of letting every fused kernel pad/slice per layer —
    # saves ~0.4 ms/step at ViT-B/16 b64
    # (experiments/perf_padded_residency.py) and is bit-exact.  The MLP
    # runs the pad rows (1.5% extra GEMM rows at ViT-B with the pad-8
    # layout from ops/common.pad_sublane) but that is cheaper than 24
    # HBM pad/slice copies.
    n = cfg.seq_len
    from ..ops.common import pad_sublane, round_up
    n_pad = round_up(n, pad_sublane(dt))

    if cfg.attn_impl in ("auto", "pallas"):
        # transpose-free dotg embed: pure XLA, no fit-gate, any backend
        x = _fused_embed(params, images, cfg, n_pad)
    else:
        x = patchify(images.astype(dt), cfg.patch_size)
        x = x @ params["patch_embed"]["kernel"].astype(dt)
        x = x + params["patch_embed"]["bias"].astype(dt)
        b = x.shape[0]
        cls = jnp.broadcast_to(params["cls_token"].astype(dt),
                               (b, cfg.num_prefix_tokens, cfg.hidden_dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + params["pos_embed"].astype(dt)
        if n_pad != n:
            x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])

    # stats-epilogue chain: the fused kernels pass LN stats between
    # halves (see _encoder_stats_chain above) — the fast inference path
    if _stats_chain_supported(cfg, x.shape[0]):
        rows = x.shape[0] * n_pad
        x = _encoder_stats_chain(params["blocks"], x, cfg, n,
                                 _stats_chain_mlp_vmem(cfg, rows))
        return x[:, :n]

    block_fn = partial(_block, cfg=cfg, n_valid=n)
    if cfg.remat:
        block_fn = jax.checkpoint(block_fn)

    # optional sequence-parallel resharding between blocks (Megatron-SP;
    # set cfg.activation_sharding, e.g. to sequence_parallel_sharding(mesh))
    ns = cfg.activation_sharding

    def step(carry, blk):
        out = block_fn(carry, blk)
        if ns is not None:
            out = jax.lax.with_sharding_constraint(out, ns)
        return out, None

    use_scan = (cfg.scan_blocks if cfg.scan_blocks is not None
                else cfg.remat)
    if use_scan:
        x, _ = jax.lax.scan(step, x, params["blocks"])
    else:
        for i in range(cfg.depth):
            blk = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
            x, _ = step(x, blk)
    return x[:, :n]


def forward_features(params: Params, images: jax.Array,
                     cfg: ViTConfig) -> jax.Array:
    """Normalized images (B, S, S, 3) -> final-LN token features
    (B, N+1, D)."""
    with _precision_ctx(cfg):
        x = _forward_features(params, images, cfg)
        return _layernorm(x, params["ln_f_scale"], params["ln_f_bias"],
                          cfg.ln_eps)


def forward(params: Params, images: jax.Array, cfg: ViTConfig) -> jax.Array:
    """Normalized images -> f32 class logits (B, num_classes)."""
    with _precision_ctx(cfg):
        toks = _forward_features(params, images, cfg)
        if cfg.pool == "cls":
            # LayerNorm is per-token: normalize only the CLS row instead
            # of all N+1 tokens (saves ~0.3 ms/step at ViT-B b64)
            pooled = _layernorm(toks[:, :1], params["ln_f_scale"],
                                params["ln_f_bias"], cfg.ln_eps)[:, 0]
        elif cfg.pool == "gap":
            feats = _layernorm(toks, params["ln_f_scale"],
                               params["ln_f_bias"], cfg.ln_eps)
            pooled = feats[:, cfg.num_prefix_tokens:].mean(axis=1)
        else:
            raise ValueError(f"unknown pool {cfg.pool!r}")
        logits = (pooled.astype(jnp.float32) @ params["head"]["kernel"]
                  + params["head"]["bias"])
    return logits


def forward_raw(params: Params, images_u8: jax.Array,
                cfg: ViTConfig) -> jax.Array:
    """Raw uint8 images in -> logits out, one XLA program (the fused
    pipeline BASELINE's north_star asks for)."""
    return forward(params, preprocess(images_u8, cfg), cfg)


def latency_forward_supported(cfg: ViTConfig, batch: int) -> bool:
    from ..ops.common import LANE, pad_sublane, round_up
    from ..ops.vit_stack import stack_fits
    # the single-launch stack kernel uses the max-free softmax; hot-logit
    # checkpoints (cfg.safe_softmax) take the per-layer kernels instead
    return (cfg.dtype == "bfloat16" and cfg.pool == "cls" and batch <= 4
            and not cfg.safe_softmax
            and stack_fits(cfg.num_heads, cfg.hidden_dim, cfg.mlp_dim,
                           round_up(cfg.seq_len, pad_sublane(jnp.bfloat16)),
                           round_up(cfg.seq_len, LANE), batch))


def prep_latency(params: Params, cfg: ViTConfig) -> Params:
    """One-time fold for :func:`forward_latency`'s CLS-LAST embed: the
    compute-dtype kernel cast and the posb table with patch rows FIRST
    and the prefix rows after them (attention is permutation-equivariant,
    so token order is a free choice — ops/patch_embed.embed_tokens_dotg).
    Call OUTSIDE the per-request jit so none of this runs per call."""
    dt = cfg.compute_dtype
    n, d = cfg.seq_len, cfg.hidden_dim
    npre = cfg.num_prefix_tokens
    n_pad = _round_up_sub(n, dt)
    pos = params["pos_embed"][0].astype(jnp.float32)
    bias = params["patch_embed"]["bias"].astype(jnp.float32)
    pre = params["cls_token"][0].astype(jnp.float32)
    posb = jnp.concatenate([
        pos[npre:] + bias,                     # patch rows 0..npch-1
        pre + pos[:npre],                      # prefix rows (cls first)
        jnp.zeros((n_pad - n, d), jnp.float32),
    ], axis=0)
    return {
        "wp_cl": params["patch_embed"]["kernel"].astype(dt),
        "posb_cl": posb,
        "blocks": params["blocks"],
        "lfs": params["ln_f_scale"],
        "lfb": params["ln_f_bias"],
        "wh": params["head"]["kernel"],
        "bh": params["head"]["bias"],
    }


def _round_up_sub(n: int, dt) -> int:
    from ..ops.common import round_up
    return round_up(n, _stack_sublane(dt))


def forward_latency(params: Params, images: jax.Array,
                    cfg: ViTConfig) -> jax.Array:
    """Small-batch single-launch forward for LATENCY serving: the whole
    encoder runs as ONE pallas_call with the layer index on the grid, so
    layer i+1's weights stream from HBM while layer i computes
    (ops/vit_stack.py).  The embed stage is the transpose-free dotg
    (ops/patch_embed.embed_tokens_dotg) with the prefix rows placed
    AFTER the patches so the GEMM body lands at row offset 0 — the
    patchify transpose and the pad copy never happen (~8 µs vs ~18 µs
    for the XLA chain at batch 1, experiments/perf_patchify.py).
    ``params`` may be the plain tree or the :func:`prep_latency` fold.
    Inference-only (no VJP); use :func:`forward` for
    training/throughput."""
    from ..ops.patch_embed import embed_tokens_dotg
    from ..ops.vit_stack import vit_layers_pallas
    with _precision_ctx(cfg):
        dt = cfg.compute_dtype
        n, npre = cfg.seq_len, cfg.num_prefix_tokens
        npch = n - npre
        act = cfg.hidden_act
        if act == "gelu":
            act = "gelu_tanh"   # bf16 compute; see _hidden_act
        prep = params if "posb_cl" in params else prep_latency(params, cfg)
        x = embed_tokens_dotg(images.astype(dt), prep["wp_cl"],
                              prep["posb_cl"], cfg.patch_size, npre,
                              prefix_last=True)
        toks = vit_layers_pallas(x, prep["blocks"], cfg.num_heads,
                                 eps=cfg.ln_eps, act=act, n_valid=n)
        pooled_rows = toks[:, npch:npch + 1]   # CLS moved to the end
        pooled = _layernorm(pooled_rows, prep["lfs"], prep["lfb"],
                            cfg.ln_eps)[:, 0]
        return pooled.astype(jnp.float32) @ prep["wh"] + prep["bh"]


def full_latency_supported(cfg: ViTConfig, batch: int) -> bool:
    """Gate for :func:`forward_latency_logits` (one-kernel ViT)."""
    from ..ops.common import LANE, pad_sublane_itemsize, round_up
    from ..ops.vit_stack import stack_full_plan
    if cfg.num_prefix_tokens != 1 or cfg.num_classes < 1:
        return False
    if cfg.hidden_act not in ("gelu", "gelu_tanh", "quick_gelu"):
        return False
    itemsize = 2 if cfg.dtype == "bfloat16" else 4
    n_pad = round_up(cfg.seq_len, pad_sublane_itemsize(itemsize))
    kv_pad = round_up(cfg.seq_len, LANE)
    p3 = cfg.patch_size * cfg.patch_size * 3
    cls_pad = round_up(cfg.num_classes, LANE)
    return stack_full_plan(cfg.num_heads, cfg.hidden_dim, cfg.mlp_dim,
                           n_pad, kv_pad, batch, p3, cls_pad,
                           itemsize) >= 2


def prep_full_latency(params: Params, cfg: ViTConfig) -> Params:
    """One-time parameter fold for :func:`forward_latency_logits`: the
    posb table (bias/CLS/pos — ops/patch_embed.py), compute-dtype casts,
    and the 128-padded head.  Call OUTSIDE the per-request jit so none
    of this runs on the latency path."""
    from ..ops.common import LANE, round_up
    dt = cfg.compute_dtype
    n, d = cfg.seq_len, cfg.hidden_dim
    npre = cfg.num_prefix_tokens
    sub = _stack_sublane(dt)
    n_pad = round_up(n, sub)
    pos = params["pos_embed"][0].astype(jnp.float32)
    bias = params["patch_embed"]["bias"].astype(jnp.float32)
    pre = params["cls_token"][0].astype(jnp.float32)
    posb = jnp.concatenate([
        pre + pos[:npre],
        pos[npre:] + bias,
        jnp.zeros((n_pad - n, d), jnp.float32),
    ], axis=0)
    ncls = cfg.num_classes
    cls_pad = round_up(ncls, LANE)
    return {
        "wp": params["patch_embed"]["kernel"].astype(dt),
        "posb": posb,
        "blocks": params["blocks"],
        "lfs": params["ln_f_scale"],
        "lfb": params["ln_f_bias"],
        "wh": jnp.pad(params["head"]["kernel"].astype(dt),
                      [(0, 0), (0, cls_pad - ncls)]),
        "bh": jnp.pad(params["head"]["bias"].astype(jnp.float32),
                      [(0, cls_pad - ncls)]),
    }


def _stack_sublane(dt) -> int:
    from ..ops.common import pad_sublane
    return pad_sublane(dt)


def forward_latency_logits(params: Params, images: jax.Array,
                           cfg: ViTConfig,
                           interpret: bool = False) -> jax.Array:
    """ONE-kernel ViT forward for latency serving: patch-embed GEMM +
    every layer + final LN + classifier head inside a single pallas_call
    (ops/vit_stack.vit_full_pallas) — the BASELINE north star's "raw
    image tensor goes in and class logits come out in one XLA program",
    taken literally.  Inference-only; gate with
    :func:`full_latency_supported`.  ``params`` may be either the plain
    param tree or the :func:`prep_full_latency` fold (pass the fold to
    keep the posb/head prep off the per-request path)."""
    from ..ops.common import round_up
    from ..ops.vit_stack import vit_full_pallas
    with _precision_ctx(cfg):
        dt = cfg.compute_dtype
        n = cfg.seq_len
        npre = cfg.num_prefix_tokens
        n_pad = round_up(n, _stack_sublane(dt))
        prep = params if "posb" in params else prep_full_latency(
            params, cfg)
        p = patchify(images.astype(dt), cfg.patch_size)
        pp = jnp.pad(p, [(0, 0), (npre, n_pad - n), (0, 0)])
        act = cfg.hidden_act
        if act == "gelu":
            act = "gelu_tanh"   # see _hidden_act
        out = vit_full_pallas(
            pp, prep["wp"], prep["posb"], prep["blocks"], prep["lfs"],
            prep["lfb"], prep["wh"], prep["bh"], cfg.num_heads,
            eps=cfg.ln_eps, act=act, n_tokens=n, npre=npre,
            interpret=interpret)
        cls_pad = prep["wh"].shape[-1]
        return out.reshape(images.shape[0],
                           npre * cls_pad)[:, :cfg.num_classes]


def jit_forward(cfg: ViTConfig, raw: bool = False):
    """Compile-once entry; cfg is baked in as static."""
    fn = forward_raw if raw else forward
    return jax.jit(partial(fn, cfg=cfg))
