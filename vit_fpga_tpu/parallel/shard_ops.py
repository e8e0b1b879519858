"""Pallas kernels composed with SPMD sharding via shard_map.

The PartitionSpec layer (parallel/sharding.py) lets XLA partition the
plain-XLA graph; Pallas kernels, however, are opaque to the SPMD
partitioner, so multi-chip runs wrap them in ``jax.shard_map``: each
device executes the kernel on its local batch shard, and XLA handles the
surrounding collectives.  Batch (dp) sharding needs no communication at
all for the attention/MLP kernels — the batch axis is embarrassingly
parallel across cells.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P


def mha_qkv_sharded(qkv, num_heads: int, mesh: Mesh,
                    impl: str = "auto"):
    """Packed-qkv attention with the batch dim sharded over the mesh's
    'dp' axis; each device runs the fused kernel on its shard."""
    from ..ops.attention import mha_qkv

    fn = jax.shard_map(
        partial(mha_qkv, num_heads=num_heads, impl=impl),
        mesh=mesh,
        in_specs=P("dp", None, None),
        out_specs=P("dp", None, None),
    )
    return fn(qkv)


def fused_mlp_sharded(x, ln_scale, ln_bias, w1, b1, w2, b2, mesh: Mesh,
                      eps: float = 1e-6, act: str = "gelu_tanh"):
    """Fused MLP with token rows sharded over 'dp'; weights replicated."""
    from ..ops.fused_mlp import fused_mlp_xla, fused_mlp

    def body(x, s, b, w1, b1, w2, b2):
        if jax.default_backend() == "tpu":
            return fused_mlp(x, s, b, w1, b1, w2, b2, eps, act)
        return fused_mlp_xla(x, s, b, w1, b1, w2, b2, eps=eps, act=act)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("dp", None), P(None), P(None), P(None, None),
                  P(None), P(None, None), P(None)),
        out_specs=P("dp", None),
    )
    return fn(x, ln_scale, ln_bias, w1, b1, w2, b2)
