"""CLS-LAST fused embed parity (ops/patch_embed.py round 3).

Attention is permutation-equivariant, so token order is a free choice:
placing the prefix rows AFTER the patches lets the embed kernel consume
the UNPADDED patch matrix (no XLA pad copy) while keeping valid tokens
contiguous.  These tests pin (a) the kernel math against a jnp replica
and (b) the rewired latency forwards against the canonical forwards —
the permutation must be invisible in the logits.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

import vit_fpga_tpu.ops.patch_embed as pe
import vit_fpga_tpu.ops.vit_stack as vs
from vit_fpga_tpu.models import quantized, vit


def _cfg(dtype):
    return vit.ViTConfig(image_size=16, patch_size=8, hidden_dim=32,
                         depth=2, num_heads=4, mlp_dim=64, num_classes=5,
                         dtype=dtype, attn_impl="xla", mlp_impl="xla",
                         hidden_act="gelu_tanh")


def test_embed_cls_last_matches_ref():
    rng = np.random.default_rng(0)
    b, npch, p3, n_pad, d = 2, 5, 24, 8, 32
    patches = jnp.asarray(rng.normal(size=(b, npch, p3)), jnp.bfloat16)
    kernel = jnp.asarray(rng.normal(size=(p3, d)) * 0.1, jnp.bfloat16)
    posb = jnp.asarray(rng.normal(size=(n_pad, d)), jnp.float32)
    got = np.asarray(pe.embed_tokens_cls_last(patches, kernel, posb,
                                              interpret=True), np.float32)
    acc = np.asarray(patches, np.float32) @ np.asarray(kernel, np.float32)
    ref = np.concatenate([
        acc + np.asarray(posb)[None, :npch],
        np.broadcast_to(np.asarray(posb)[None, npch:],
                        (b, n_pad - npch, d)),
    ], axis=1).astype(jnp.bfloat16).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_embed_int8_cls_last_matches_ref():
    from vit_fpga_tpu.ops.quant_fused import quantize_weight_colwise
    rng = np.random.default_rng(1)
    b, npch, p3, n_pad, d = 2, 5, 24, 8, 32
    patches = jnp.asarray(rng.normal(size=(b, npch, p3)), jnp.bfloat16)
    wq, ws = quantize_weight_colwise(
        np.asarray(rng.normal(size=(p3, d)) * 0.1, np.float32))
    posb = jnp.asarray(rng.normal(size=(n_pad, d)), jnp.float32)
    got = np.asarray(pe.embed_tokens_int8_cls_last(
        patches, jnp.asarray(wq), jnp.asarray(ws), posb,
        interpret=True), np.float32)
    pf = np.asarray(patches, np.float32)
    sx = np.maximum(np.abs(pf).max(axis=-1, keepdims=True), 1e-12) / 127.0
    xq = np.clip(np.rint(pf / sx), -127, 127)
    emb = (xq @ wq.astype(np.float32)) * (sx * ws[None, None])
    ref = np.concatenate([
        emb + np.asarray(posb)[None, :npch],
        np.broadcast_to(np.asarray(posb)[None, npch:],
                        (b, n_pad - npch, d)),
    ], axis=1).astype(jnp.bfloat16).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def _interp(monkeypatch, module, name):
    orig = getattr(module, name)
    monkeypatch.setattr(module, name,
                        functools.partial(orig, interpret=True))


def test_forward_latency_cls_last_matches_forward(monkeypatch):
    """forward_latency (cls-last embed + stack kernel) == forward, both
    through the plain tree and the prep_latency fold."""
    _interp(monkeypatch, pe, "embed_tokens_cls_last")
    _interp(monkeypatch, vs, "vit_layers_pallas")
    cfg = _cfg("bfloat16")
    params = vit.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    ref = np.asarray(vit.forward(params, imgs, cfg), np.float32)
    got = np.asarray(vit.forward_latency(params, imgs, cfg), np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.05
    fold = vit.prep_latency(params, cfg)
    got_f = np.asarray(vit.forward_latency(fold, imgs, cfg), np.float32)
    np.testing.assert_allclose(got_f, got, rtol=1e-5, atol=1e-5)


def test_int8_latency_cls_last_matches_one_kernel(monkeypatch):
    """vit_forward_int8_latency (cls-last) == the one-kernel int8 path
    (identical row-quant math, different token order)."""
    from vit_fpga_tpu.ops import quant_fused as qf
    _interp(monkeypatch, pe, "embed_tokens_int8_cls_last")
    _interp(monkeypatch, vs, "vit_layers_int8_pallas")
    _interp(monkeypatch, qf, "int8_linear_fused")
    cfg = _cfg("bfloat16")
    params = vit.init_params(jax.random.key(2), cfg)
    qp = quantized.quantize_vit_fast(params)
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    ref = np.asarray(quantized.vit_forward_int8_latency_logits(
        qp, imgs, cfg, interpret=True), np.float32)
    got = np.asarray(quantized.vit_forward_int8_latency(qp, imgs, cfg),
                     np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.05
    fold = quantized.prep_int8_latency(qp, cfg)
    got_f = np.asarray(quantized.vit_forward_int8_latency(fold, imgs, cfg),
                       np.float32)
    np.testing.assert_allclose(got_f, got, rtol=1e-5, atol=1e-5)


def test_embed_cls_last_fit_gate():
    b16 = vit.config("vit_b16")
    n_pad = 208
    assert pe.embed_cls_last_fits(196, n_pad, 768, b16.hidden_dim, 2)
    # ViT-H/14 @ 448px: 1024 patches x 588 -> blows the 13 MB budget
    assert not pe.embed_cls_last_fits(1024, 1040, 588, 1280, 4)
