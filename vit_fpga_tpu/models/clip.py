"""CLIP image encoder — BASELINE config 5's model family.

A CLIP vision tower (ViT-L/14-style) reusing the shared transformer block
from :mod:`vit_fpga_tpu.models.vit`, with CLIP's structural deltas:

  * patch embedding without bias, a learned class embedding
  * an extra LayerNorm BEFORE the encoder (``ln_pre``) and one after
    (``ln_post``) applied to the pooled CLS token
  * quick-GELU activation (OpenAI checkpoints)
  * a final linear projection (no bias) into the shared image/text
    embedding space

The HF importer maps ``CLIPVisionModel``/``CLIPModel`` checkpoints into
this layout, so published openai/clip-vit-* weights run unmodified.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import vit as vit_mod

Params = Dict[str, Any]


def clip_vision_config(variant: str = "vit_l14", image_size: int = 224,
                       **overrides) -> vit_mod.ViTConfig:
    """A ViTConfig tuned to CLIP semantics (quick-GELU, eps 1e-5)."""
    defaults = dict(hidden_act="quick_gelu", ln_eps=1e-5,
                    mean=vit_mod.CLIP_MEAN, std=vit_mod.CLIP_STD,
                    num_classes=0)
    defaults.update(overrides)
    return vit_mod.config(variant, image_size=image_size, **defaults)


@dataclasses.dataclass(frozen=True)
class CLIPHead:
    """Projection geometry (embed dim of the shared space)."""
    projection_dim: int = 768


def init_params(key: jax.Array, cfg: vit_mod.ViTConfig,
                projection_dim: int = 768) -> Params:
    base = vit_mod.init_params(key, dataclasses.replace(cfg, num_classes=1))
    del base["head"]
    d = cfg.hidden_dim
    k1, k2 = jax.random.split(key)
    base["ln_pre_scale"] = jnp.ones((d,), jnp.float32)
    base["ln_pre_bias"] = jnp.zeros((d,), jnp.float32)
    base["proj"] = (0.02 * jax.random.truncated_normal(
        k2, -2.0, 2.0, (d, projection_dim))).astype(jnp.float32)
    return base


def _embed(params: Params, images: jax.Array,
           cfg: vit_mod.ViTConfig) -> jax.Array:
    """Images -> (B, N, D) tokens, CLS first, via the transpose-free
    dotg embed (ops/patch_embed.embed_tokens_dotg).  No tail rows:
    CLIP pads the token axis AFTER its pre-LN (padding before would
    LayerNorm the zero rows into bias rows)."""
    from ..ops.patch_embed import embed_tokens_dotg
    dt = cfg.compute_dtype
    d = cfg.hidden_dim
    pos = params["pos_embed"][0].astype(jnp.float32)      # (N, D)
    bias = params["patch_embed"]["bias"].astype(jnp.float32)
    pre = params["cls_token"][0].astype(jnp.float32)      # (1, D)
    posb = jnp.concatenate([pre + pos[:1], pos[1:] + bias], axis=0)
    return embed_tokens_dotg(images.astype(dt),
                             params["patch_embed"]["kernel"].astype(dt),
                             posb, cfg.patch_size, 1)


def forward(params: Params, images: jax.Array,
            cfg: vit_mod.ViTConfig) -> jax.Array:
    """Normalized images (B, S, S, 3) -> image embeddings
    (B, projection_dim) (unnormalized; callers L2-normalize for cosine
    similarity, as CLIP does)."""
    with vit_mod._precision_ctx(cfg):
        dt = cfg.compute_dtype
        x = _embed(params, images, cfg)
        x = vit_mod._layernorm(x, params["ln_pre_scale"],
                               params["ln_pre_bias"], cfg.ln_eps)

        # padded residency (see vit._forward_features): pad the token
        # axis once, run every block with n_valid, never pad per layer
        n = cfg.seq_len
        from ..ops.common import pad_sublane, round_up
        n_pad = round_up(n, pad_sublane(dt))
        if n_pad != n:
            x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])

        # stats-epilogue chain (see models/vit.py): fused kernels pass
        # LN stats between halves — CLIP-L lands in the 2-image
        # ao-scratch tier + raised-VMEM MLP, both chain-eligible
        if vit_mod._stats_chain_supported(cfg, x.shape[0]):
            rows = x.shape[0] * n_pad
            x = vit_mod._encoder_stats_chain(
                params["blocks"], x, cfg, n,
                vit_mod._stats_chain_mlp_vmem(cfg, rows))
            pooled = vit_mod._layernorm(x[:, 0], params["ln_f_scale"],
                                        params["ln_f_bias"], cfg.ln_eps)
            return pooled.astype(jnp.float32) @ params["proj"]

        block_fn = partial(vit_mod._block, cfg=cfg, n_valid=n)
        if cfg.remat:
            block_fn = jax.checkpoint(block_fn)

        def step(carry, blk):
            return block_fn(carry, blk), None

        use_scan = (cfg.scan_blocks if cfg.scan_blocks is not None
                    else cfg.remat)
        if use_scan:
            x, _ = jax.lax.scan(step, x, params["blocks"])
        else:   # unrolled: measured faster (see ViTConfig.scan_blocks)
            for i in range(cfg.depth):
                blk = jax.tree_util.tree_map(lambda a: a[i],
                                             params["blocks"])
                x, _ = step(x, blk)
        pooled = vit_mod._layernorm(x[:, 0], params["ln_f_scale"],
                                    params["ln_f_bias"], cfg.ln_eps)
        return pooled.astype(jnp.float32) @ params["proj"]


def forward_raw(params: Params, images_u8: jax.Array,
                cfg: vit_mod.ViTConfig) -> jax.Array:
    """Raw uint8 -> embeddings, one XLA program (decode happens host-side;
    resize/normalize/patchify fuse on device — BASELINE config 5)."""
    return forward(params, vit_mod.preprocess(images_u8, cfg), cfg)


def jit_forward(cfg: vit_mod.ViTConfig, raw: bool = False):
    fn = forward_raw if raw else forward
    return jax.jit(partial(fn, cfg=cfg))


def embed_normalized(params: Params, images: jax.Array,
                     cfg: vit_mod.ViTConfig) -> jax.Array:
    """L2-normalized embeddings (cosine-ready)."""
    e = forward(params, images, cfg)
    return e / jnp.linalg.norm(e, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# HuggingFace import (CLIPVisionModel / CLIPModel)
# ---------------------------------------------------------------------------

def from_hf_clip_state_dict(sd: Mapping[str, np.ndarray], depth: int,
                            prefix: str = "vision_model.") -> Params:
    g = lambda n: np.asarray(sd[n], dtype=np.float32)  # noqa: E731
    t = np.transpose

    conv_w = g(f"{prefix}embeddings.patch_embedding.weight")  # (D,3,P,P)
    d_model = conv_w.shape[0]

    def stack(fmt, transform=None):
        return np.stack([
            (transform(g(fmt.format(i=i))) if transform
             else g(fmt.format(i=i))) for i in range(depth)])

    lyr = f"{prefix}encoder.layers.{{i}}."
    wq = stack(lyr + "self_attn.q_proj.weight", t)
    wk = stack(lyr + "self_attn.k_proj.weight", t)
    wv = stack(lyr + "self_attn.v_proj.weight", t)
    bq = stack(lyr + "self_attn.q_proj.bias")
    bk = stack(lyr + "self_attn.k_proj.bias")
    bv = stack(lyr + "self_attn.v_proj.bias")

    params: Params = {
        "patch_embed": {
            "kernel": conv_w.transpose(2, 3, 1, 0).reshape(-1, d_model),
            "bias": np.zeros((d_model,), np.float32),  # CLIP conv: no bias
        },
        "cls_token": g(f"{prefix}embeddings.class_embedding").reshape(
            1, 1, d_model),
        "pos_embed": g(f"{prefix}embeddings.position_embedding.weight")[
            None, :, :],
        "ln_pre_scale": g(f"{prefix}pre_layrnorm.weight"),
        "ln_pre_bias": g(f"{prefix}pre_layrnorm.bias"),
        "blocks": {
            "ln1_scale": stack(lyr + "layer_norm1.weight"),
            "ln1_bias": stack(lyr + "layer_norm1.bias"),
            "wqkv": np.concatenate([wq, wk, wv], axis=2),
            "bqkv": np.concatenate([bq, bk, bv], axis=1),
            "wo": stack(lyr + "self_attn.out_proj.weight", t),
            "bo": stack(lyr + "self_attn.out_proj.bias"),
            "ln2_scale": stack(lyr + "layer_norm2.weight"),
            "ln2_bias": stack(lyr + "layer_norm2.bias"),
            "w1": stack(lyr + "mlp.fc1.weight", t),
            "b1": stack(lyr + "mlp.fc1.bias"),
            "w2": stack(lyr + "mlp.fc2.weight", t),
            "b2": stack(lyr + "mlp.fc2.bias"),
        },
        "ln_f_scale": g(f"{prefix}post_layernorm.weight"),
        "ln_f_bias": g(f"{prefix}post_layernorm.bias"),
    }
    if "visual_projection.weight" in sd:
        params["proj"] = g("visual_projection.weight").T
    else:
        params["proj"] = np.eye(d_model, dtype=np.float32)
    return params


def from_hf_clip_model(model) -> Params:
    """Convert a live ``transformers`` CLIPModel or CLIPVisionModel."""
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    cfg = getattr(model.config, "vision_config", model.config)
    return from_hf_clip_state_dict(sd, depth=cfg.num_hidden_layers)


# ---------------------------------------------------------------------------
# Text tower — completes the CLIP pair (the reference is vision-only; this
# is net-new capability so image-text similarity/contrastive training work
# end to end).  Sequences are tiny (max 77 tokens), so the blocks run as
# plain XLA with a causal mask; the MXU-critical path remains the vision
# tower.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_dim: int = 512
    depth: int = 12
    num_heads: int = 8
    mlp_dim: int = 2048
    max_positions: int = 77
    ln_eps: float = 1e-5
    projection_dim: int = 768


def init_text_params(key: jax.Array, cfg: CLIPTextConfig) -> Params:
    d, l, m = cfg.hidden_dim, cfg.depth, cfg.mlp_dim
    ks = jax.random.split(key, 8)

    def tn(k, shape, std=0.02):
        return (std * jax.random.truncated_normal(
            k, -2.0, 2.0, shape)).astype(jnp.float32)

    return {
        "token_embed": tn(ks[0], (cfg.vocab_size, d)),
        "pos_embed": tn(ks[1], (cfg.max_positions, d)),
        "blocks": {
            "ln1_scale": jnp.ones((l, d)), "ln1_bias": jnp.zeros((l, d)),
            "wqkv": tn(ks[2], (l, d, 3 * d)),
            "bqkv": jnp.zeros((l, 3 * d)),
            "wo": tn(ks[3], (l, d, d)), "bo": jnp.zeros((l, d)),
            "ln2_scale": jnp.ones((l, d)), "ln2_bias": jnp.zeros((l, d)),
            "w1": tn(ks[4], (l, d, m)), "b1": jnp.zeros((l, m)),
            "w2": tn(ks[5], (l, m, d)), "b2": jnp.zeros((l, d)),
        },
        "ln_f_scale": jnp.ones((d,)), "ln_f_bias": jnp.zeros((d,)),
        "proj": tn(ks[6], (d, cfg.projection_dim)),
    }


def _causal_text_block(x, blk, cfg: CLIPTextConfig):
    b, n, d = x.shape
    h = vit_mod._layernorm(x, blk["ln1_scale"], blk["ln1_bias"],
                           cfg.ln_eps)
    qkv = h @ blk["wqkv"] + blk["bqkv"]
    dh = d // cfg.num_heads
    q = qkv[..., :d].reshape(b, n, cfg.num_heads, dh)
    k = qkv[..., d:2 * d].reshape(b, n, cfg.num_heads, dh)
    v = qkv[..., 2 * d:].reshape(b, n, cfg.num_heads, dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (dh ** -0.5)
    causal = jnp.tril(jnp.ones((n, n), bool))
    scores = jnp.where(causal[None, None], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, n, d)
    x = x + (o @ blk["wo"] + blk["bo"])
    h = vit_mod._layernorm(x, blk["ln2_scale"], blk["ln2_bias"],
                           cfg.ln_eps)
    h = h @ blk["w1"] + blk["b1"]
    h = h * jax.nn.sigmoid(1.702 * h)          # quick-GELU
    return x + (h @ blk["w2"] + blk["b2"])


def text_forward(params: Params, input_ids: jax.Array,
                 cfg: CLIPTextConfig) -> jax.Array:
    """Token ids (B, N) int32 -> text embeddings (B, projection_dim).

    Pools at the EOT token, which CLIP identifies as the ARGMAX token id
    per sequence (EOT has the highest id in CLIP's vocab) — matching
    HF's CLIPTextModel pooling exactly."""
    b, n = input_ids.shape
    x = params["token_embed"][input_ids] + params["pos_embed"][:n]

    def step(carry, blk):
        return _causal_text_block(carry, blk, cfg), None

    x, _ = jax.lax.scan(step, x, params["blocks"])
    x = vit_mod._layernorm(x, params["ln_f_scale"], params["ln_f_bias"],
                           cfg.ln_eps)
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = x[jnp.arange(b), eot]
    return pooled.astype(jnp.float32) @ params["proj"]


def from_hf_clip_text_state_dict(sd: Mapping[str, np.ndarray], depth: int,
                                 prefix: str = "text_model.") -> Params:
    g = lambda n: np.asarray(sd[n], dtype=np.float32)  # noqa: E731
    t = np.transpose

    def stack(fmt, transform=None):
        return np.stack([
            (transform(g(fmt.format(i=i))) if transform
             else g(fmt.format(i=i))) for i in range(depth)])

    lyr = f"{prefix}encoder.layers.{{i}}."
    wq = stack(lyr + "self_attn.q_proj.weight", t)
    wk = stack(lyr + "self_attn.k_proj.weight", t)
    wv = stack(lyr + "self_attn.v_proj.weight", t)
    bq = stack(lyr + "self_attn.q_proj.bias")
    bk = stack(lyr + "self_attn.k_proj.bias")
    bv = stack(lyr + "self_attn.v_proj.bias")
    d_model = wq.shape[1]
    params: Params = {
        "token_embed": g(f"{prefix}embeddings.token_embedding.weight"),
        "pos_embed": g(f"{prefix}embeddings.position_embedding.weight"),
        "blocks": {
            "ln1_scale": stack(lyr + "layer_norm1.weight"),
            "ln1_bias": stack(lyr + "layer_norm1.bias"),
            "wqkv": np.concatenate([wq, wk, wv], axis=2),
            "bqkv": np.concatenate([bq, bk, bv], axis=1),
            "wo": stack(lyr + "self_attn.out_proj.weight", t),
            "bo": stack(lyr + "self_attn.out_proj.bias"),
            "ln2_scale": stack(lyr + "layer_norm2.weight"),
            "ln2_bias": stack(lyr + "layer_norm2.bias"),
            "w1": stack(lyr + "mlp.fc1.weight", t),
            "b1": stack(lyr + "mlp.fc1.bias"),
            "w2": stack(lyr + "mlp.fc2.weight", t),
            "b2": stack(lyr + "mlp.fc2.bias"),
        },
        "ln_f_scale": g(f"{prefix}final_layer_norm.weight"),
        "ln_f_bias": g(f"{prefix}final_layer_norm.bias"),
    }
    if "text_projection.weight" in sd:
        params["proj"] = g("text_projection.weight").T
    else:
        params["proj"] = np.eye(d_model, dtype=np.float32)
    return params


# ---------------------------------------------------------------------------
# Contrastive training (CLIP objective)
# ---------------------------------------------------------------------------

def contrastive_loss(image_emb: jax.Array, text_emb: jax.Array,
                     logit_scale: jax.Array) -> jax.Array:
    """Symmetric InfoNCE over the in-batch similarity matrix."""
    ie = image_emb / jnp.linalg.norm(image_emb, axis=-1, keepdims=True)
    te = text_emb / jnp.linalg.norm(text_emb, axis=-1, keepdims=True)
    logits = jnp.exp(logit_scale) * ie @ te.T
    labels = jnp.arange(logits.shape[0])
    li = -jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1),
                              labels[:, None], axis=-1).mean()
    lt = -jnp.take_along_axis(jax.nn.log_softmax(logits.T, axis=-1),
                              labels[:, None], axis=-1).mean()
    return 0.5 * (li + lt)


def make_clip_train_step(vision_cfg: vit_mod.ViTConfig,
                         text_cfg: CLIPTextConfig, optimizer):
    """Jitted contrastive step over {vision, text, logit_scale} params."""

    def loss_fn(params, images, input_ids):
        ie = forward(params["vision"], images, vision_cfg)
        te = text_forward(params["text"], input_ids, text_cfg)
        return contrastive_loss(ie, te, params["logit_scale"])

    @jax.jit
    def step(params, opt_state, images, input_ids):
        loss, grads = jax.value_and_grad(loss_fn)(params, images,
                                                  input_ids)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def latency_forward_supported(cfg: vit_mod.ViTConfig, batch: int) -> bool:
    from ..ops.common import LANE, pad_sublane, round_up
    from ..ops.vit_stack import stack_fits
    import jax.numpy as jnp
    return (cfg.dtype == "bfloat16" and batch <= 4
            and stack_fits(cfg.num_heads, cfg.hidden_dim, cfg.mlp_dim,
                           round_up(cfg.seq_len, pad_sublane(jnp.bfloat16)),
                           round_up(cfg.seq_len, LANE), batch))


def forward_latency(params: Params, images: jax.Array,
                    cfg: vit_mod.ViTConfig) -> jax.Array:
    """Small-batch single-launch CLIP image encoder (see
    vit.forward_latency): the whole encoder is ONE pallas_call with the
    layer index on the grid; ln_pre/ln_post/projection stay outside."""
    from ..ops.vit_stack import vit_layers_pallas
    with vit_mod._precision_ctx(cfg):
        x = _embed(params, images, cfg)
        x = vit_mod._layernorm(x, params["ln_pre_scale"],
                               params["ln_pre_bias"], cfg.ln_eps)
        toks = vit_layers_pallas(x, params["blocks"], cfg.num_heads,
                                 eps=cfg.ln_eps, act="quick_gelu"
                                 if cfg.hidden_act == "quick_gelu"
                                 else "gelu_tanh")
        pooled = vit_mod._layernorm(toks[:, :1], params["ln_f_scale"],
                                    params["ln_f_bias"], cfg.ln_eps)[:, 0]
        return pooled.astype(jnp.float32) @ params["proj"]
