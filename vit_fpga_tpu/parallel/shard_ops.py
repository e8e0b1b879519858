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


def ring_attention(q, k, v, mesh: Mesh, axis: str = "sp",
                   scale: float | None = None):
    """Sequence-parallel attention: q/k/v sharded along the token axis
    over ``axis``; k/v shards rotate around the ring via ``ppermute``
    while each device maintains online-softmax statistics for its local
    q block (the cross-device generalization of blockwise flash
    attention — O(N/devices) memory per chip, compute fully overlapped
    with the neighbor exchange by XLA's scheduler).

    Shapes: (B, H, N, Dh) each, N divisible by the axis size.  Full
    bidirectional attention (ViT semantics — no causal mask).
    """
    import jax.numpy as jnp

    if scale is None:
        scale = q.shape[-1] ** -0.5
    n_dev = mesh.shape[axis]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def body(q, k, v):
        # local shards: (B, H, n_loc, Dh)
        qf = q.astype(jnp.float32)
        # derive the carry inits from qf so shard_map marks them as
        # varying over the sp axis (literal inits are unvarying and the
        # fori_loop carry types then mismatch)
        m = jnp.full_like(qf[..., :1], -jnp.inf)
        l = jnp.zeros_like(m)
        acc = jnp.zeros_like(qf)

        def step(i, carry):
            acc, m, l, k, v = carry
            s = jnp.einsum("bhqd,bhkd->bhqk", qf, k.astype(jnp.float32)
                           ) * scale
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
            return acc, m_new, l, k, v

        acc, m, l, k, v = jax.lax.fori_loop(
            0, n_dev, step, (acc, m, l, k, v))
        return (acc / l).astype(q.dtype)

    spec = P(None, None, axis, None)
    fn = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec)
    return fn(q, k, v)
