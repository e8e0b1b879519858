"""Checkpoint I/O: native save/load + HuggingFace ViT/CLIP weight import.

The reference has NO on-disk checkpoint story — its only state import/export
is the in-memory ``net_data`` ctor and a broken ``get_net_data`` exporter
(src/netFPGA.cpp:58-107, 206-237; SURVEY.md §5 "Checkpoint / resume: none").
The rebuild needs one to run published ViT weights, so:

  * :func:`save_params` / :func:`load_params` — flat-key ``.npz``
    round-trip for any pytree of arrays (dependency-free, works for every
    model family here).
  * :func:`from_hf_vit_state_dict` — converts a HuggingFace
    ``ViTForImageClassification``/``ViTModel`` state dict into this
    package's stacked-scan layout (see models/vit.py), so published
    google/vit-* checkpoints run unmodified.

Conversion conventions: torch ``nn.Linear`` stores (out, in) and computes
``x @ W.T`` — our kernels are (in, out), hence the transposes; the HF conv
patch embedding (D, 3, P, P) becomes our (P*P*3, D) GEMM kernel with pixel
order (py, px, c).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import numpy as np

Params = Dict[str, Any]
_SEP = "::"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    else:
        out[prefix[:-len(_SEP)]] = np.asarray(tree)
    return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> Params:
    tree: Params = {}
    for key, val in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_params(path: str, params: Any) -> None:
    """Write a pytree of arrays to a single ``.npz`` file."""
    flat = _flatten(params)
    tmp = path + ".tmp"
    np.savez(tmp, **flat)
    # numpy appends .npz to names without suffix
    if not tmp.endswith(".npz"):
        tmp += ".npz"
    os.replace(tmp, path)


def load_params(path: str) -> Params:
    with np.load(path) as z:
        return _unflatten({k: z[k] for k in z.files})


# ---------------------------------------------------------------------------
# Training-state checkpoint/resume (orbax; arbitrary pytrees incl. optax
# state).  The reference has no resume story at all (SURVEY.md §5).
# ---------------------------------------------------------------------------

def save_train_state(path: str, state: Any) -> None:
    """Write an arbitrary pytree (params + optimizer state + step, ...)
    atomically with orbax."""
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_train_state(path: str, like: Any = None) -> Any:
    """Restore a pytree saved by :func:`save_train_state`; pass ``like``
    (a matching abstract/concrete pytree) to restore exact leaf types."""
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, item=like)
        return ckptr.restore(path)


# ---------------------------------------------------------------------------
# HuggingFace ViT import
# ---------------------------------------------------------------------------

def from_hf_vit_state_dict(sd: Mapping[str, np.ndarray], depth: int,
                           prefix: str = "vit.") -> Params:
    """Convert a HF ViT state dict (numpy arrays) to our stacked layout.

    Accepts both ``ViTForImageClassification`` (with ``classifier.*``) and
    bare ``ViTModel`` (no head -> zero head of size 0 is NOT created; the
    'head' entry is only present when a classifier exists).
    """
    g = lambda name: np.asarray(sd[name], dtype=np.float32)  # noqa: E731

    conv_w = g(f"{prefix}embeddings.patch_embeddings.projection.weight")
    d_model = conv_w.shape[0]
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, d_model)

    def stack(fmt: str, transform=None):
        mats = []
        for i in range(depth):
            m = g(fmt.format(i=i))
            mats.append(transform(m) if transform else m)
        return np.stack(mats)

    t = np.transpose
    lyr = f"{prefix}encoder.layer.{{i}}."
    wq = stack(lyr + "attention.attention.query.weight", t)
    wk = stack(lyr + "attention.attention.key.weight", t)
    wv = stack(lyr + "attention.attention.value.weight", t)
    bq = stack(lyr + "attention.attention.query.bias")
    bk = stack(lyr + "attention.attention.key.bias")
    bv = stack(lyr + "attention.attention.value.bias")

    params: Params = {
        "patch_embed": {
            "kernel": patch_kernel,
            "bias": g(f"{prefix}embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": g(f"{prefix}embeddings.cls_token"),
        "pos_embed": g(f"{prefix}embeddings.position_embeddings"),
        "blocks": {
            "ln1_scale": stack(lyr + "layernorm_before.weight"),
            "ln1_bias": stack(lyr + "layernorm_before.bias"),
            "wqkv": np.concatenate([wq, wk, wv], axis=2),
            "bqkv": np.concatenate([bq, bk, bv], axis=1),
            "wo": stack(lyr + "attention.output.dense.weight", t),
            "bo": stack(lyr + "attention.output.dense.bias"),
            "ln2_scale": stack(lyr + "layernorm_after.weight"),
            "ln2_bias": stack(lyr + "layernorm_after.bias"),
            "w1": stack(lyr + "intermediate.dense.weight", t),
            "b1": stack(lyr + "intermediate.dense.bias"),
            "w2": stack(lyr + "output.dense.weight", t),
            "b2": stack(lyr + "output.dense.bias"),
        },
        "ln_f_scale": g(f"{prefix}layernorm.weight"),
        "ln_f_bias": g(f"{prefix}layernorm.bias"),
    }
    if "classifier.weight" in sd:
        params["head"] = {"kernel": g("classifier.weight").T,
                          "bias": g("classifier.bias")}
    return params


def from_hf_vit_model(model) -> Params:
    """Convert a live ``transformers`` ViT torch module.

    Returns params only; prefer :func:`import_hf_vit`, which also builds
    the matching config and auto-calibrates the softmax window."""
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    depth = model.config.num_hidden_layers
    return from_hf_vit_state_dict(sd, depth=depth)


# ---------------------------------------------------------------------------
# Trust-boundary calibration (VERDICT r3 #5)
# ---------------------------------------------------------------------------

def autocalibrated(params: Any, cfg, source: str = "checkpoint"):
    """Return ``cfg`` with ``safe_softmax`` measured for this checkpoint.

    Production import paths call this so a hot-logit checkpoint can never
    silently saturate the max-free softmax clip window
    (ops/attn_block.py [-70, 80]); the manual utils/calibrate API stays
    for explicit control.  Loud by design: routing to the exact
    max-subtract path is logged as a WARNING because it costs ~3% of
    throughput and means the checkpoint's attention logits are unusually
    hot."""
    from . import calibrate
    from .log import get_logger
    res = calibrate.choose_softmax_mode(params, cfg)
    if res.safe and not cfg.safe_softmax:
        get_logger("checkpoint").warning(
            "%s has hot attention logits (score range [%.1f, %.1f] vs "
            "clip window [-70, 80]): routing to the exact max-subtract "
            "softmax kernels (cfg.safe_softmax=True)", source,
            res.score_min, res.score_max)
    import dataclasses
    return dataclasses.replace(cfg, safe_softmax=res.safe)


def import_hf_vit(model, image_size: int = 0, dtype: str = "bfloat16",
                  calibrate: bool = True, **overrides):
    """Canonical HF ViT import: returns ``(params, cfg)`` with the config
    built from the checkpoint's own geometry and the softmax window
    auto-calibrated (a hot-logit checkpoint arrives with
    ``cfg.safe_softmax=True`` — no manual step).

    ``model`` is a live ``transformers`` ViT module
    (``ViTForImageClassification`` or bare ``ViTModel``)."""
    from ..models.vit import ViTConfig
    hf = model.config
    params = from_hf_vit_model(model)
    n_classes = (params["head"]["bias"].shape[0]
                 if "head" in params else 0)
    cfg = ViTConfig(
        image_size=image_size or hf.image_size,
        patch_size=hf.patch_size,
        hidden_dim=hf.hidden_size,
        depth=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        mlp_dim=hf.intermediate_size,
        num_classes=n_classes,
        ln_eps=hf.layer_norm_eps,
        hidden_act={"gelu": "gelu", "gelu_new": "gelu_tanh"}.get(
            hf.hidden_act, hf.hidden_act),
        dtype=dtype,
        **overrides,
    )
    if calibrate:
        cfg = autocalibrated(params, cfg, source="HF ViT import")
    return params, cfg
