"""Multi-chip ViT forward/training with the FUSED Pallas kernels.

Round 2 left "fast" and "multi-chip" disjoint: mesh training forced the
XLA block implementations because Pallas custom calls are opaque to XLA's
SPMD partitioner (train/trainer.py).  This module closes that gap the
explicit way: the whole model body runs under ``jax.shard_map``, so every
device executes the fused mega-kernels on its LOCAL shard and the
collectives are spelled out:

  * dp (data parallel): batch-sharded, no communication in the forward;
    the gradient all-reduce falls out of shard_map's transpose of the
    replicated-in params.
  * tp (tensor parallel, Megatron-style): attention heads and mlp_dim
    columns are split across devices.  Each device runs the mega-kernel
    on its head-group / column-block (``residual=False`` partial mode,
    ops/attn_block.py, ops/fused_mlp.py) and ONE ``psum`` per half
    combines the partial out-projections — the textbook 2-allreduce/layer
    Megatron block, with the GEMM+softmax math still inside the fused
    kernels.

Tensor-parallel parameter layout
--------------------------------
The packed qkv weight (D, 3D) cannot be head-group-sharded with a plain
PartitionSpec (a last-dim split crosses the q|k|v boundaries), so the
sharded path carries wqkv as (L, D, 3, D) and bqkv as (L, 3, D): axis -1
is the head dimension, and P(..., "tp") gives each device the packed
(D, 3, D/tp) block of ITS heads — which reshapes (contiguously, no
transpose) to the (D, 3*Da) packed layout the kernel expects.
:func:`to_tp_layout` / :func:`from_tp_layout` convert to/from the
canonical models/vit.py layout (checkpoints stay canonical).

Reference parity: the reference has no distributed path at all (SURVEY.md
§2.3 — its one parallelism mechanism is the host/device ring); this is
net-new capability, designed per the scaling-book recipe.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import vit
from ..ops.common import round_up

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Parameter layout
# ---------------------------------------------------------------------------


def to_tp_layout(params: Params) -> Params:
    """Canonical -> tp layout: wqkv (L,D,3D)->(L,D,3,D), bqkv (L,3D)->(L,3,D).

    Pure reshapes (the packed layout is [q|k|v] along columns, so axis 1
    of the reshape indexes q/k/v and axis -1 the head columns)."""
    out = dict(params)
    blocks = dict(params["blocks"])
    l, d, d3 = blocks["wqkv"].shape
    blocks["wqkv"] = blocks["wqkv"].reshape(l, d, 3, d3 // 3)
    blocks["bqkv"] = blocks["bqkv"].reshape(l, 3, d3 // 3)
    out["blocks"] = blocks
    return out


def from_tp_layout(params: Params) -> Params:
    out = dict(params)
    blocks = dict(params["blocks"])
    l, d, _, da = blocks["wqkv"].shape
    blocks["wqkv"] = blocks["wqkv"].reshape(l, d, 3 * da)
    blocks["bqkv"] = blocks["bqkv"].reshape(l, 3 * da)
    out["blocks"] = blocks
    return out


def vit_tp_param_specs() -> Params:
    """PartitionSpecs for the tp layout (see module docstring)."""
    return {
        "patch_embed": {"kernel": P(None, None), "bias": P(None)},
        "cls_token": P(None, None, None),
        "pos_embed": P(None, None, None),
        "blocks": {
            "ln1_scale": P(None, None), "ln1_bias": P(None, None),
            "wqkv": P(None, None, None, "tp"), "bqkv": P(None, None, "tp"),
            "wo": P(None, "tp", None), "bo": P(None, None),
            "ln2_scale": P(None, None), "ln2_bias": P(None, None),
            "w1": P(None, None, "tp"), "b1": P(None, "tp"),
            "w2": P(None, "tp", None), "b2": P(None, None),
        },
        "ln_f_scale": P(None), "ln_f_bias": P(None),
        "head": {"kernel": P(None, None), "bias": P(None)},
    }


def vit_tp_param_sharding(mesh: Mesh) -> Params:
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), vit_tp_param_specs(),
        is_leaf=lambda x: isinstance(x, P))


def _data_axes(mesh: Mesh):
    return ("dcn", "dp") if "dcn" in mesh.axis_names else ("dp",)


def batch_spec(mesh: Mesh, ndim: int) -> P:
    return P(_data_axes(mesh), *([None] * (ndim - 1)))


# ---------------------------------------------------------------------------
# Tensor-parallel partial ops (custom VJP: Pallas forward, XLA-recompute
# backward — the same rematerialization contract as the full fused kernels)
# ---------------------------------------------------------------------------


def _attn_partial_xla(x, ls, lb, wqkv, bqkv, wo, num_heads, eps, n_valid):
    """OutProj(MHA(QKV(LN(x)))) for a LOCAL head group — no residual, no
    output bias (added once after the tp psum)."""
    from ..ops.attention import mha_qkv_xla
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ls + lb).astype(x.dtype)
    qkv = (jnp.dot(xn, wqkv.astype(x.dtype),
                   preferred_element_type=jnp.float32)
           + bqkv).astype(x.dtype)
    o = mha_qkv_xla(qkv, num_heads, n_valid=n_valid)
    return jnp.dot(o, wo.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def attn_partial(x, ls, lb, wqkv, bqkv, wo, num_heads: int, eps: float,
                 n_valid: Optional[int], impl: str,
                 safe_softmax: bool = False):
    """Partial attention half over a local head group (tp shard).

    x: (B, N, D_model); wqkv: (D_model, 3*Da); wo: (Da, D_model) with
    Da = num_heads(local) * dh.  Returns the un-psummed partial output."""
    return _attn_partial_fwd_impl(x, ls, lb, wqkv, bqkv, wo, num_heads,
                                  eps, n_valid, impl, safe_softmax)


def _attn_partial_fwd_impl(x, ls, lb, wqkv, bqkv, wo, num_heads, eps,
                           n_valid, impl, safe_softmax):
    if impl in ("pallas", "interpret"):
        from ..ops.attn_block import attn_block_pallas
        bo = jnp.zeros((x.shape[-1],), jnp.float32)
        return attn_block_pallas(x, ls, lb, wqkv, bqkv, wo, bo, num_heads,
                                 eps=eps, n_valid=n_valid, residual=False,
                                 safe_softmax=safe_softmax,
                                 interpret=(impl == "interpret"))
    return _attn_partial_xla(x, ls, lb, wqkv, bqkv, wo, num_heads, eps,
                             n_valid)


def _attn_partial_fwd(x, ls, lb, wqkv, bqkv, wo, num_heads, eps, n_valid,
                      impl, safe_softmax):
    out = _attn_partial_fwd_impl(x, ls, lb, wqkv, bqkv, wo, num_heads,
                                 eps, n_valid, impl, safe_softmax)
    return out, (x, ls, lb, wqkv, bqkv, wo)


def _attn_partial_bwd(num_heads, eps, n_valid, impl, safe_softmax, res, g):
    _, vjp = jax.vjp(
        lambda *a: _attn_partial_xla(*a, num_heads=num_heads, eps=eps,
                                     n_valid=n_valid), *res)
    return vjp(g)


attn_partial.defvjp(_attn_partial_fwd, _attn_partial_bwd)


def _mlp_partial_xla(x, ls, lb, w1, b1, w2, eps, act):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ls + lb).astype(x.dtype)
    h = jnp.dot(xn, w1.astype(x.dtype),
                preferred_element_type=jnp.float32) + b1
    h = vit._hidden_act(h, act).astype(x.dtype)
    return jnp.dot(h, w2.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def mlp_partial(x, ls, lb, w1, b1, w2, eps: float, act: str, impl: str):
    """Partial MLP half over a local mlp_dim column block (tp shard).
    x: (T, D); w1: (D, M/tp); w2: (M/tp, D).  No residual / b2 — those
    happen once after the psum."""
    return _mlp_partial_fwd_impl(x, ls, lb, w1, b1, w2, eps, act, impl)


def _mlp_partial_fwd_impl(x, ls, lb, w1, b1, w2, eps, act, impl):
    if impl in ("pallas", "interpret"):
        from ..ops.fused_mlp import fused_mlp_pallas
        b2 = jnp.zeros((x.shape[-1],), jnp.float32)
        return fused_mlp_pallas(x, ls, lb, w1, b1, w2, b2, eps=eps,
                                act=act, residual=False,
                                interpret=(impl == "interpret"))
    return _mlp_partial_xla(x, ls, lb, w1, b1, w2, eps, act)


def _mlp_partial_fwd(x, ls, lb, w1, b1, w2, eps, act, impl):
    out = _mlp_partial_fwd_impl(x, ls, lb, w1, b1, w2, eps, act, impl)
    return out, (x, ls, lb, w1, b1, w2)


def _mlp_partial_bwd(eps, act, impl, res, g):
    _, vjp = jax.vjp(
        lambda *a: _mlp_partial_xla(*a, eps=eps, act=act), *res)
    return vjp(g)


mlp_partial.defvjp(_mlp_partial_fwd, _mlp_partial_bwd)


# ---------------------------------------------------------------------------
# The shard_map model body
# ---------------------------------------------------------------------------


def _block_fits(cfg: vit.ViTConfig, tp: int) -> bool:
    """Do the tp-partial fused kernels fit VMEM for this geometry?"""
    from ..ops.attn_block import attn_plan
    from ..ops.common import LANE, pad_sublane_itemsize, round_up as ru
    from ..ops.fused_mlp import mlp_weight_chunks
    itemsize = 2 if cfg.dtype == "bfloat16" else 4
    n_pad = ru(cfg.seq_len, pad_sublane_itemsize(itemsize))
    kv_pad = ru(cfg.seq_len, LANE)
    ok_attn = attn_plan(cfg.num_heads // tp, cfg.hidden_dim, n_pad, kv_pad,
                        itemsize, d_attn=cfg.hidden_dim // tp).n_sc >= 1
    ok_mlp = mlp_weight_chunks(cfg.hidden_dim, cfg.mlp_dim // tp,
                               itemsize) == 1
    return ok_attn and ok_mlp


def _forward_local(params: Params, images: jax.Array, cfg: vit.ViTConfig,
                   tp: int, impl: str) -> jax.Array:
    """Per-device forward on LOCAL shards (runs inside shard_map).

    ``params`` is the local tp-layout shard: wqkv (L, D, 3, Da),
    bqkv (L, 3, Da), w1 (L, D, M/tp), w2 (L, M/tp, D)."""
    dt = cfg.compute_dtype
    n, d = cfg.seq_len, cfg.hidden_dim
    heads_loc = cfg.num_heads // tp
    from ..ops.common import pad_sublane
    n_pad = round_up(n, pad_sublane(dt))

    if tp == 1 and impl in ("pallas", "xla"):
        # no tensor-parallel splits: each dp shard runs the FULL
        # single-device dispatch (fused embed, stats-epilogue chain,
        # tiered kernels) on its local batch — dp is embarrassingly
        # parallel, so the best single-chip path is the right body
        l = cfg.depth
        pcanon = {**params, "blocks": {
            **params["blocks"],
            "wqkv": params["blocks"]["wqkv"].reshape(l, d, 3 * d),
            "bqkv": params["blocks"]["bqkv"].reshape(l, 3 * d)}}
        toks = vit._forward_features(pcanon, images, cfg)
        if cfg.pool == "cls":
            pooled = vit._layernorm(toks[:, :1], params["ln_f_scale"],
                                    params["ln_f_bias"], cfg.ln_eps)[:, 0]
        else:
            feats = vit._layernorm(toks, params["ln_f_scale"],
                                   params["ln_f_bias"], cfg.ln_eps)
            pooled = feats[:, cfg.num_prefix_tokens:].mean(axis=1)
        return (pooled.astype(jnp.float32) @ params["head"]["kernel"]
                + params["head"]["bias"])

    if impl == "pallas":
        # transpose-free dotg embed (pure XLA, shards on batch freely)
        x = vit._fused_embed(params, images, cfg, n_pad)
    else:
        x = vit.patchify(images.astype(dt), cfg.patch_size)
        x = x @ params["patch_embed"]["kernel"].astype(dt)
        x = x + params["patch_embed"]["bias"].astype(dt)
        b = x.shape[0]
        cls = jnp.broadcast_to(params["cls_token"].astype(dt),
                               (b, cfg.num_prefix_tokens, d))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + params["pos_embed"].astype(dt)
        if n_pad != n:
            x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, 0)])

    act = cfg.hidden_act
    if act == "gelu" and (dt == jnp.bfloat16 or impl == "pallas"):
        act = "gelu_tanh"   # Mosaic has no erf; see models/vit.py

    def block(x, blk):
        b = x.shape[0]
        wqkv = blk["wqkv"].reshape(d, 3 * blk["wqkv"].shape[-1])
        bqkv = blk["bqkv"].reshape(3 * blk["bqkv"].shape[-1])
        y = attn_partial(x, blk["ln1_scale"], blk["ln1_bias"], wqkv, bqkv,
                         blk["wo"], heads_loc, cfg.ln_eps, n, impl,
                         cfg.safe_softmax)
        if tp > 1:
            y = jax.lax.psum(y, "tp")
        x = x + y + blk["bo"].astype(dt)
        t = x.reshape(b * n_pad, d)
        y2 = mlp_partial(t, blk["ln2_scale"], blk["ln2_bias"], blk["w1"],
                         blk["b1"], blk["w2"], cfg.ln_eps, act, impl)
        if tp > 1:
            y2 = jax.lax.psum(y2, "tp")
        return (t + y2 + blk["b2"].astype(dt)).reshape(b, n_pad, d)

    block_fn = jax.checkpoint(block) if cfg.remat else block
    for i in range(cfg.depth):
        blk = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
        x = block_fn(x, blk)
    toks = x[:, :n]

    if cfg.pool == "cls":
        pooled = vit._layernorm(toks[:, :1], params["ln_f_scale"],
                                params["ln_f_bias"], cfg.ln_eps)[:, 0]
    else:
        feats = vit._layernorm(toks, params["ln_f_scale"],
                               params["ln_f_bias"], cfg.ln_eps)
        pooled = feats[:, cfg.num_prefix_tokens:].mean(axis=1)
    return (pooled.astype(jnp.float32) @ params["head"]["kernel"]
            + params["head"]["bias"])


# ---------------------------------------------------------------------------
# Public builders
# ---------------------------------------------------------------------------


def make_sharded_forward(cfg: vit.ViTConfig, mesh: Mesh,
                         impl: str = "auto", raw: bool = False):
    """Jitted batch-sharded inference forward over the mesh with the FUSED
    kernels per shard: fn(params_tp, images) -> logits.

    ``impl``: "pallas" (TPU), "interpret" (CPU validation of the actual
    kernels), "xla", or "auto".  ``raw=True`` takes uint8 images and runs
    the in-graph preprocess per shard (BASELINE config 5's serving
    disposition)."""
    impl = _resolve_impl(cfg=cfg, mesh=mesh, impl=impl)
    tp = mesh.shape.get("tp", 1)
    ispec = P(_data_axes(mesh), None, None, None)

    def body(params, images):
        if raw:
            images = vit.preprocess(images, cfg)
        with vit._precision_ctx(cfg):
            return _forward_local(params, images, cfg, tp, impl)

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(vit_tp_param_specs(), ispec),
                       out_specs=P(_data_axes(mesh), None),
                       check_vma=False)
    return jax.jit(fn)


def _resolve_impl(cfg: vit.ViTConfig, mesh: Mesh, impl: str) -> str:
    tp = mesh.shape.get("tp", 1)
    if cfg.num_heads % tp != 0 or cfg.mlp_dim % tp != 0:
        raise ValueError(
            f"tp={tp} must divide num_heads={cfg.num_heads} and "
            f"mlp_dim={cfg.mlp_dim}")
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl in ("pallas", "interpret") and not _block_fits(cfg, tp):
        impl = "xla"
    return impl


def make_sharded_train_step(cfg: vit.ViTConfig, optimizer,
                            mesh: Mesh, impl: str = "auto",
                            donate: bool = True):
    """Build ``step(params_tp, opt_state, images, labels) -> (params_tp,
    opt_state, metrics)`` with the fused kernels running per-shard under
    shard_map (dp batch shards; Megatron tp head-group/column shards with
    one psum per half).  Gradients: shard_map's transpose inserts the dp
    all-reduce for the replicated params; the optimizer update runs on the
    tp-sharded layout."""
    import dataclasses
    cfg = dataclasses.replace(cfg, safe_softmax=True)  # training: exact
    impl = _resolve_impl(cfg, mesh, impl)
    tp = mesh.shape.get("tp", 1)
    daxes = _data_axes(mesh)
    ispec = P(daxes, None, None, None)
    lspec = P(daxes)

    def loss_body(params, images, labels):
        with vit._precision_ctx(cfg):
            logits = _forward_local(params, images, cfg, tp, impl)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        valid = labels >= 0
        safe = jnp.maximum(labels, 0)
        nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
        loss_sum = jnp.where(valid, nll, 0.0).sum()
        n = valid.sum()
        correct = jnp.where(valid, logits.argmax(-1) == labels,
                            False).sum()
        loss_sum, n, correct = jax.lax.psum(
            (loss_sum, n.astype(jnp.float32),
             correct.astype(jnp.float32)), daxes)
        n = jnp.maximum(n, 1.0)
        return loss_sum / n, correct / n

    loss_sm = jax.shard_map(
        loss_body, mesh=mesh,
        in_specs=(vit_tp_param_specs(), ispec, lspec),
        out_specs=(P(), P()), check_vma=False)

    def step(params, opt_state, images, labels):
        (loss, acc), grads = jax.value_and_grad(
            lambda p: loss_sm(p, images, labels), has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    pshard = vit_tp_param_sharding(mesh)
    rep = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(pshard, None, NamedSharding(mesh, ispec),
                      NamedSharding(mesh, lspec)),
        out_shardings=(pshard, None,
                       {"loss": rep, "accuracy": rep}),
        donate_argnums=(0, 1) if donate else ())


def init_sharded_train_state(key: jax.Array, cfg: vit.ViTConfig,
                             optimizer, mesh: Mesh):
    """Init canonical params, convert to tp layout, place on mesh."""
    params = to_tp_layout(vit.init_params(key, cfg))
    params = jax.device_put(params, vit_tp_param_sharding(mesh))
    opt_state = optimizer.init(params)
    return params, opt_state
