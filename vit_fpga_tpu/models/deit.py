"""DeiT (Data-efficient image Transformer) — ViT + a distillation token.

DeiT is architecturally a ViT whose sequence carries TWO prefix tokens
(CLS + distillation) and whose classifier is the average of two linear
heads, one per prefix token (Touvron et al., 2021).  The encoder is
exactly :mod:`vit_fpga_tpu.models.vit` with ``num_prefix_tokens=2`` —
every fused kernel (attention mega-kernel, fused MLP, fused embed,
latency stack) applies unchanged, because the prefix rows ride the same
folded pos-bias table as CLS.

Reference parity hook: the reference repo serves a single ViT program
(SURVEY.md §2.2); DeiT extends the model family the same host runtime
can dispatch, demonstrating the rebuilt stack is model-agnostic.

HuggingFace importer: ``DeiTForImageClassificationWithTeacher`` state
dicts load via :func:`from_hf_deit_state_dict` (layout matches
``utils/checkpoint.from_hf_vit_state_dict`` apart from the extra token
and the dual heads).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from . import vit

Params = Dict[str, Any]

# DeiT/16 variants at 224 px (original paper sizes).
VARIANTS = {
    "deit_ti16": dict(patch_size=16, hidden_dim=192, depth=12,
                      num_heads=3, mlp_dim=768),
    "deit_s16": dict(patch_size=16, hidden_dim=384, depth=12,
                     num_heads=6, mlp_dim=1536),
    "deit_b16": dict(patch_size=16, hidden_dim=768, depth=12,
                     num_heads=12, mlp_dim=3072),
}


def config(variant: str, image_size: int = 224,
           **overrides) -> vit.ViTConfig:
    if variant not in VARIANTS:
        raise ValueError(
            f"unknown variant {variant!r}; have {sorted(VARIANTS)}")
    base = dict(VARIANTS[variant], num_prefix_tokens=2,
                # DeiT checkpoints use torchvision-style ImageNet stats
                mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))
    base.update(overrides)
    return vit.ViTConfig(image_size=image_size, **base)


def init_params(key: jax.Array, cfg: vit.ViTConfig) -> Params:
    """ViT init + the distillation head (cls_token already holds both
    prefix embeddings because cfg.num_prefix_tokens == 2)."""
    assert cfg.num_prefix_tokens == 2, "DeiT needs CLS + distill tokens"
    params = vit.init_params(key, cfg)
    k = jax.random.split(key, 9)[8]
    params["head_dist"] = {
        "kernel": (0.02 * jax.random.truncated_normal(
            k, -2.0, 2.0, (cfg.hidden_dim, cfg.num_classes))
        ).astype(jnp.float32),
        "bias": jnp.zeros((cfg.num_classes,), jnp.float32),
    }
    return params


def forward(params: Params, images: jax.Array,
            cfg: vit.ViTConfig) -> jax.Array:
    """Normalized images -> f32 logits: mean of the CLS head and the
    distillation head (DeiT inference-time fusion)."""
    with vit._precision_ctx(cfg):
        toks = vit._forward_features(params, images, cfg)
        # final LN over just the two prefix rows (same CLS-slice trick
        # as vit.forward)
        pre = vit._layernorm(toks[:, :2], params["ln_f_scale"],
                             params["ln_f_bias"], cfg.ln_eps)
        prf = pre.astype(jnp.float32)
        logits_cls = (prf[:, 0] @ params["head"]["kernel"]
                      + params["head"]["bias"])
        if "head_dist" not in params:   # single-head DeiT checkpoint
            return logits_cls
        logits_dist = (prf[:, 1] @ params["head_dist"]["kernel"]
                       + params["head_dist"]["bias"])
    return (logits_cls + logits_dist) * 0.5


def forward_raw(params: Params, images_u8: jax.Array,
                cfg: vit.ViTConfig) -> jax.Array:
    return forward(params, vit.preprocess(images_u8, cfg), cfg)


def from_hf_deit_state_dict(sd: Mapping[str, np.ndarray],
                            depth: int) -> Params:
    """Convert a HF ``DeiTForImageClassificationWithTeacher`` (or bare
    ``DeiTModel``) state dict to our stacked layout."""
    from ..utils.checkpoint import from_hf_vit_state_dict
    g = lambda name: np.asarray(sd[name], dtype=np.float32)  # noqa: E731
    sd = dict(sd)
    prefix = "deit." if any(k.startswith("deit.") for k in sd) else ""
    # Reuse the ViT importer by aliasing the embeddings DeiT shares.
    base = {k.replace("deit.", "vit.", 1) if prefix else "vit." + k: v
            for k, v in sd.items()}
    params = from_hf_vit_state_dict(base, depth=depth)
    cls = g(f"{prefix}embeddings.cls_token")
    dist = g(f"{prefix}embeddings.distillation_token")
    params["cls_token"] = np.concatenate([cls, dist], axis=1)  # (1, 2, D)
    if "cls_classifier.weight" in sd:      # WithTeacher: dual heads
        params["head"] = {"kernel": g("cls_classifier.weight").T,
                          "bias": g("cls_classifier.bias")}
        params["head_dist"] = {
            "kernel": g("distillation_classifier.weight").T,
            "bias": g("distillation_classifier.bias")}
    # plain DeiTForImageClassification keeps its single CLS head
    # ('classifier.*', already imported); forward() then uses CLS only.
    return params


def from_hf_deit_model(model) -> Params:
    sd = {k: v.detach().cpu().numpy()
          for k, v in model.state_dict().items()}
    return from_hf_deit_state_dict(sd, depth=model.config.num_hidden_layers)
