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


def test_fused_mlp_native_bwd_matches_vjp():
    """The native backward kernel (in-kernel remat, VMEM grad accum)
    matches jax.vjp of the XLA reference on every cotangent."""
    from vit_fpga_tpu.ops.fused_mlp import (fused_mlp_bwd_pallas,
                                            fused_mlp_xla)
    rng = np.random.default_rng(5)
    t, d, m_ = 70, 64, 128
    x = _rand(rng, t, d, s=1.0)
    s = _rand(rng, d, s=0.1) + 1.0
    b = _rand(rng, d, s=0.1)
    w1 = _rand(rng, d, m_)
    b1 = _rand(rng, m_, s=0.1)
    w2 = _rand(rng, m_, d)
    b2 = _rand(rng, d, s=0.1)
    g = _rand(rng, t, d, s=1.0)
    for act in ("gelu_tanh", "quick_gelu", "relu"):
        _, vjp = jax.vjp(lambda *a: fused_mlp_xla(*a, act=act),
                         x, s, b, w1, b1, w2, b2)
        ref = vjp(g)
        got = fused_mlp_bwd_pallas(x, s, b, w1, b1, w2, g, act=act,
                                   block_t=32, interpret=True)
        for r, o in zip(ref, got):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=2e-4, atol=2e-5)


def test_attn_block_native_bwd_matches_vjp():
    """Native attention-half backward matches jax.vjp of the XLA
    reference on every cotangent (incl. the qkv bias, which shifts the
    scores and must be in the in-kernel recompute)."""
    from vit_fpga_tpu.ops import attn_block as ab
    rng = np.random.default_rng(6)
    B, N, D, H = 2, 13, 32, 4
    x = _rand(rng, B, N, D, s=0.3)
    ls = _rand(rng, D, s=0.1) + 1.0
    lb = _rand(rng, D, s=0.1)
    wq = _rand(rng, D, 3 * D, s=0.2)
    bq = _rand(rng, 3 * D, s=0.2)
    wo = _rand(rng, D, D, s=0.2)
    bo = _rand(rng, D, s=0.2)
    g = _rand(rng, B, N, D, s=0.3)
    _, vjp = jax.vjp(lambda *a: ab.attn_block_xla(*a, num_heads=H),
                     x, ls, lb, wq, bq, wo, bo)
    ref = vjp(g)
    got = ab.attn_block_bwd_pallas(x, ls, lb, wq, bq, wo, g, H,
                                   interpret=True)
    for r, o in zip(ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=3e-4, atol=3e-5)


def test_attn_block_native_bwd_pairs_matches_vjp():
    """Head-PAIR-packed backward (dh=64 geometry, round 5) matches
    jax.vjp AND the unpacked kernel: the block-diagonal packing of all
    six score-space GEMMs must be exact (zero-masked panels kill the
    cross-head terms; lane-masked selects discard the dv/dk garbage
    blocks)."""
    from vit_fpga_tpu.ops import attn_block as ab
    rng = np.random.default_rng(7)
    B, N, D, H = 2, 13, 128, 2          # dh = 64, even heads
    x = _rand(rng, B, N, D, s=0.3)
    ls = _rand(rng, D, s=0.1) + 1.0
    lb = _rand(rng, D, s=0.1)
    wq = _rand(rng, D, 3 * D, s=0.2)
    bq = _rand(rng, 3 * D, s=0.2)
    wo = _rand(rng, D, D, s=0.2)
    bo = _rand(rng, D, s=0.2)
    g = _rand(rng, B, N, D, s=0.3)
    _, vjp = jax.vjp(lambda *a: ab.attn_block_xla(*a, num_heads=H),
                     x, ls, lb, wq, bq, wo, bo)
    ref = vjp(g)
    got = ab.attn_block_bwd_pallas(x, ls, lb, wq, bq, wo, g, H,
                                   pairs=True, interpret=True)
    for r, o in zip(ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=3e-4, atol=3e-5)
    # packed vs unpacked: same math up to f32 rounding (the packed path
    # multiplies by reciprocal where the unpacked divides, and the
    # accumulation order differs) — not bit-identical
    base = ab.attn_block_bwd_pallas(x, ls, lb, wq, bq, wo, g, H,
                                    pairs=False, interpret=True)
    for b_, o in zip(base, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(b_),
                                   rtol=1e-3, atol=1e-5)
