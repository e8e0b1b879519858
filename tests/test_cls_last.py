"""Transpose-free dotg embed parity (ops/patch_embed.embed_tokens_dotg).

The embed stage's cost was the patchify transpose, not the GEMM
(experiments/perf_patchify.py): the dotg embed reshapes the raw image
with contiguous splits only and contracts (P, P*3) against a 3-d view
of the kernel — no transpose, no pad copy.  Token order stays a free
choice (attention is permutation-equivariant): the throughput path
keeps prefix-FIRST, the latency paths use prefix-LAST.  These tests
pin (a) the dotg math against the naive patchify chain in both
orderings, (b) its gradient (training uses it via vit._fused_embed),
and (c) the rewired latency forwards against the canonical forwards —
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


def _naive(images, kernel, posb, patch, npre, prefix_last):
    x = vit.patchify(np.asarray(images, np.float32), patch)
    acc = x @ np.asarray(kernel, np.float32)
    pb = np.asarray(posb, np.float32)
    b, npch = acc.shape[:2]
    n_pad, d = pb.shape
    if prefix_last:
        parts = [acc + pb[None, :npch],
                 np.broadcast_to(pb[None, npch:], (b, n_pad - npch, d))]
    else:
        parts = [np.broadcast_to(pb[None, :npre], (b, npre, d)),
                 acc + pb[None, npre:npre + npch]]
        if n_pad > npre + npch:
            parts.append(np.broadcast_to(pb[None, npre + npch:],
                                         (b, n_pad - npre - npch, d)))
    return np.concatenate(parts, axis=1)


def test_embed_dotg_matches_naive_both_orders():
    rng = np.random.default_rng(0)
    patch, gh = 4, 3
    npch, p3, d, npre = gh * gh, patch * patch * 3, 32, 2
    imgs = jnp.asarray(rng.normal(size=(2, gh * patch, gh * patch, 3)),
                       jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(p3, d)) * 0.1, jnp.float32)
    for n_pad in (npre + npch, 16):          # no tail / padded tail
        posb = np.zeros((n_pad, d), np.float32)
        posb[:npre + npch] = rng.normal(size=(npre + npch, d))
        posb = jnp.asarray(posb)
        for prefix_last in (False, True):
            got = np.asarray(pe.embed_tokens_dotg(
                imgs, kernel, posb, patch, npre,
                prefix_last=prefix_last), np.float32)
            ref = _naive(imgs, kernel, posb, patch, npre, prefix_last)
            np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_embed_dotg_gradient_matches_naive():
    """vit._fused_embed is differentiated in training; dotg's VJP must
    match the patchify chain's."""
    rng = np.random.default_rng(1)
    patch, gh, d, npre = 4, 2, 16, 1
    p3 = patch * patch * 3
    imgs = jnp.asarray(rng.normal(size=(1, gh * patch, gh * patch, 3)),
                       jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(p3, d)) * 0.1, jnp.float32)
    posb = jnp.asarray(rng.normal(size=(npre + gh * gh, d)), jnp.float32)

    def f_dotg(img, k):
        return jnp.sum(pe.embed_tokens_dotg(img, k, posb, patch, npre) ** 2)

    def f_naive(img, k):
        x = vit.patchify(img, patch)
        acc = x @ k
        body = acc + posb[None, npre:]
        pre = jnp.broadcast_to(posb[None, :npre], (1, npre, d))
        return jnp.sum(jnp.concatenate([pre, body], axis=1) ** 2)

    g1 = jax.grad(f_dotg, argnums=(0, 1))(imgs, kernel)
    g2 = jax.grad(f_naive, argnums=(0, 1))(imgs, kernel)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def _interp(monkeypatch, module, name):
    orig = getattr(module, name)
    monkeypatch.setattr(module, name,
                        functools.partial(orig, interpret=True))


def test_forward_latency_cls_last_matches_forward(monkeypatch):
    """forward_latency (dotg cls-last embed + stack kernel) == forward,
    both through the plain tree and the prep_latency fold."""
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
    """vit_forward_int8_latency (dotg cls-last) == the one-kernel int8
    path (same blocks; the embed differs only by the bf16-dequant embed
    weight, well inside the int8 tolerance)."""
    from vit_fpga_tpu.ops import quant_fused as qf
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
    assert np.abs(got - ref).max() / scale < 0.06
    fold = quantized.prep_int8_latency(qp, cfg)
    got_f = np.asarray(quantized.vit_forward_int8_latency(fold, imgs, cfg),
                       np.float32)
    np.testing.assert_allclose(got_f, got, rtol=1e-5, atol=1e-5)
