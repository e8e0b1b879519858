"""Custom-VJP fused kernels: gradients match the XLA reference.

Run in interpret mode on CPU (Pallas forward interpreted, backward is
the XLA recompute path).
"""

import numpy as np

import jax
import jax.numpy as jnp


def _rand(rng, *shape, s=0.05):
    return jnp.asarray(rng.normal(size=shape) * s, jnp.float32)


def test_fused_mlp_grad_matches_xla(monkeypatch):
    from vit_fpga_tpu.ops import fused_mlp as m
    orig = m.fused_mlp_pallas
    monkeypatch.setattr(
        m, "fused_mlp_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    rng = np.random.default_rng(0)
    x = _rand(rng, 32, 64, s=1.0)
    args = (x, jnp.ones((64,)), jnp.zeros((64,)), _rand(rng, 64, 128),
            jnp.zeros((128,)), _rand(rng, 128, 64), jnp.zeros((64,)))

    def loss_fused(*a):
        return jnp.sum(m.fused_mlp(*a, 1e-6, "gelu_tanh") ** 2)

    def loss_ref(*a):
        return jnp.sum(m.fused_mlp_xla(*a, eps=1e-6,
                                       act="gelu_tanh") ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 3, 5))(*args)
    g2 = jax.grad(loss_ref, argnums=(0, 3, 5))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_attn_block_grad_matches_xla(monkeypatch):
    from vit_fpga_tpu.ops import attn_block as m
    orig = m.attn_block_pallas
    monkeypatch.setattr(
        m, "attn_block_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    rng = np.random.default_rng(1)
    d, nh = 64, 4
    x = _rand(rng, 2, 33, d, s=1.0)
    args = (x, jnp.ones((d,)), jnp.zeros((d,)), _rand(rng, d, 3 * d),
            jnp.zeros((3 * d,)), _rand(rng, d, d), jnp.zeros((d,)))

    def loss_fused(*a):
        return jnp.sum(m.attn_block(*a, nh, 1e-6) ** 2)

    def loss_ref(*a):
        return jnp.sum(m.attn_block_xla(*a, num_heads=nh, eps=1e-6) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 3, 5))(*args)
    g2 = jax.grad(loss_ref, argnums=(0, 3, 5))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
