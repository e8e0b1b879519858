"""Fused row-wise int8 linear kernels + fast int8 ViT."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_fpga_tpu.models import quantized, vit
from vit_fpga_tpu.ops import quant_fused as qf


def test_fused_kernel_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(100, 64)), jnp.float32)
    w = rng.normal(size=(64, 48)).astype(np.float32)
    wq, ws = qf.quantize_weight_colwise(w)
    b = jnp.asarray(rng.normal(size=(48,)), jnp.float32)
    ref = qf.int8_linear_rowwise_ref(x, jnp.asarray(wq), jnp.asarray(ws),
                                     b, act="gelu_tanh")
    out = qf.int8_linear_fused(x, jnp.asarray(wq), jnp.asarray(ws), b,
                               act="gelu_tanh", block_t=64,
                               out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_rowwise_close_to_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(32, 64)), jnp.float32)
    w = rng.normal(size=(64, 48)).astype(np.float32)
    wq, ws = qf.quantize_weight_colwise(w)
    b = jnp.zeros((48,), jnp.float32)
    ref = np.asarray(x) @ w
    out = np.asarray(qf.int8_linear_rowwise_ref(
        x, jnp.asarray(wq), jnp.asarray(ws), b))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 0.03 * scale


def test_fast_int8_vit_tolerance(monkeypatch):
    # route the fused kernel through interpret mode on CPU
    orig = qf.int8_linear_fused
    monkeypatch.setattr(
        qf, "int8_linear_fused",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    cfg = vit.ViTConfig(image_size=32, patch_size=8, hidden_dim=64,
                        depth=2, num_heads=4, mlp_dim=128, num_classes=10,
                        dtype="float32", attn_impl="xla")
    params = vit.init_params(jax.random.key(0), cfg)
    qp = quantized.quantize_vit_fast(params)
    imgs = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 32, 32, 3)), jnp.float32)
    ref = np.asarray(vit.forward(params, imgs, cfg))
    out = np.asarray(quantized.vit_forward_int8_fast(qp, imgs, cfg))
    assert out.shape == ref.shape
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.3, f"fast int8 logits off by {rel:.3f}"
    assert (out.argmax(-1) == ref.argmax(-1)).mean() >= 0.5


def test_fused_kernel_with_layernorm():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(40, 64)) * 3.0, jnp.float32)
    ls = jnp.asarray(rng.normal(size=(64,)) * 0.1 + 1.0, jnp.float32)
    lb = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    wq, ws = qf.quantize_weight_colwise(w)
    b = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    # reference: LN (f32) then rowwise-int8 linear
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + 1e-6) * ls + lb
    ref = qf.int8_linear_rowwise_ref(xn, jnp.asarray(wq), jnp.asarray(ws),
                                     b)
    out = qf.int8_linear_fused(x, jnp.asarray(wq), jnp.asarray(ws), b,
                               ln_scale=ls, ln_bias=lb, ln_eps=1e-6,
                               block_t=32, out_dtype=jnp.float32,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
