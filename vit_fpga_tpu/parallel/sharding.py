"""Sharding layouts for the model families (scaling-book recipe).

Pick a mesh, annotate parameter/data shardings with PartitionSpecs, and let
XLA's SPMD partitioner insert the collectives (psum / all-gather /
reduce-scatter over ICI).  No hand-written communication — the TPU-native
answer to what a CUDA framework would do with NCCL calls.

ViT tensor-parallel layout (Megatron-style):
  * attention: qkv projection is column-parallel (heads split across
    ``tp``), output projection row-parallel -> one psum per block
  * MLP: w1 column-parallel, w2 row-parallel -> one psum per block
  * layernorms, embeddings, cls/pos tokens: replicated (tiny)
  * batch dim of activations: sharded over ``dp``
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def vit_param_specs() -> Dict[str, Any]:
    """PartitionSpec pytree matching models/vit.py's param layout."""
    return {
        "patch_embed": {"kernel": P(None, "tp"), "bias": P("tp")},
        "cls_token": P(None, None, None),
        "pos_embed": P(None, None, None),
        "blocks": {
            "ln1_scale": P(None, None), "ln1_bias": P(None, None),
            "wqkv": P(None, None, "tp"), "bqkv": P(None, "tp"),
            "wo": P(None, "tp", None), "bo": P(None, None),
            "ln2_scale": P(None, None), "ln2_bias": P(None, None),
            "w1": P(None, None, "tp"), "b1": P(None, "tp"),
            "w2": P(None, "tp", None), "b2": P(None, None),
        },
        "ln_f_scale": P(None), "ln_f_bias": P(None),
        "head": {"kernel": P(None, None), "bias": P(None)},
    }


def vit_param_sharding(mesh: Mesh) -> Dict[str, Any]:
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), vit_param_specs(),
        is_leaf=lambda x: isinstance(x, P))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) dim over the data axes; replicate the
    rest.  On a hybrid ("dcn", "dp", "tp") mesh the batch spans both
    data axes — the gradient all-reduce then decomposes into a fast ICI
    reduce-scatter/all-gather within a slice plus one DCN all-reduce of
    the already-reduced shards (the multi-slice recipe)."""
    batch_axes = (("dcn", "dp") if "dcn" in mesh.axis_names else "dp")
    return _ns(mesh, batch_axes, *([None] * (ndim - 1)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: Any, shardings: Any) -> Any:
    """Place a param pytree onto the mesh with the given shardings."""
    return jax.device_put(params, shardings)


# ---------------------------------------------------------------------------
# Sequence-parallel activation sharding (Megatron-SP style): between
# transformer blocks the (B, N, D) activations are sharded along the token
# axis over 'tp' in addition to batch over 'dp', so LayerNorms/residuals
# compute on 1/tp of the tokens per device; XLA inserts the all-gather /
# reduce-scatter pairs around the tp-sharded matmuls.  Carried in
# ``ViTConfig.activation_sharding`` (no process-global trace-time state).
# ---------------------------------------------------------------------------


def sequence_parallel_sharding(mesh: Mesh) -> NamedSharding:
    """(B, N, D) activations: batch over dp, tokens over tp."""
    return NamedSharding(mesh, P("dp", "tp", None))


def mlp_param_sharding(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    layers = params["layers"]
    out = []
    for i, _ in enumerate(layers):
        if i % 2 == 0:   # column-parallel
            out.append({"w": _ns(mesh, None, "tp"), "b": _ns(mesh, "tp")})
        else:            # row-parallel
            out.append({"w": _ns(mesh, "tp", None), "b": _ns(mesh)})
    return {"layers": out}
