"""Full-model single-launch kernel parity (embed + layers + head in ONE
pallas_call — ops/vit_stack.vit_full_pallas / vit_full_int8_pallas)."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_fpga_tpu.models import quantized, vit


def _cfg(dtype):
    return vit.ViTConfig(image_size=16, patch_size=8, hidden_dim=32,
                         depth=2, num_heads=4, mlp_dim=64, num_classes=5,
                         dtype=dtype, attn_impl="xla", mlp_impl="xla",
                         hidden_act="gelu_tanh")


def test_full_latency_supported_gates():
    assert vit.full_latency_supported(vit.config("vit_b16"), 1)
    assert vit.full_latency_supported(_cfg("float32"), 2)
    # GAP pooling / no head -> unsupported
    import dataclasses
    bad = dataclasses.replace(_cfg("float32"), num_classes=0)
    assert not vit.full_latency_supported(bad, 1)


def test_vit_full_kernel_matches_forward_f32():
    """f32 one-kernel forward == the per-layer forward + head."""
    cfg = _cfg("float32")
    params = vit.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    ref = np.asarray(vit.forward(params, imgs, cfg), np.float32)
    got = np.asarray(
        vit.forward_latency_logits(params, imgs, cfg, interpret=True),
        np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_vit_full_kernel_matches_forward_bf16():
    cfg = _cfg("bfloat16")
    params = vit.init_params(jax.random.key(1), cfg)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    ref = np.asarray(vit.forward(params, imgs, cfg), np.float32)
    got = np.asarray(
        vit.forward_latency_logits(params, imgs, cfg, interpret=True),
        np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.05


def test_vit_full_int8_matches_reference():
    """Int8 one-kernel forward == a jnp replica of the same row-quant
    math (embed + per-layer int8 refs + int8 head)."""
    from vit_fpga_tpu.ops.quant_block import (attn_block_int8_ref,
                                              mlp_block_int8_ref)
    cfg = _cfg("bfloat16")
    params = vit.init_params(jax.random.key(2), cfg)
    qp = quantized.quantize_vit_fast(params)
    assert quantized.full_int8_latency_supported(qp, cfg, 2)
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)

    def rq(xf):
        absmax = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
        sx = absmax / 127.0
        xq = jnp.clip(jnp.rint(xf / sx), -127, 127)
        return xq, sx

    # reference embed (same math as the kernel prologue, f32 quant sim)
    dt = jnp.bfloat16
    p = vit.patchify(imgs.astype(dt), cfg.patch_size)
    pe = qp["patch_embed"]
    pos = qp["pos_embed"][0].astype(jnp.float32)
    pre = qp["cls_token"][0].astype(jnp.float32)
    d = cfg.hidden_dim
    posb = jnp.concatenate(
        [pre + pos[:1], pos[1:] + pe["b"].astype(jnp.float32)], axis=0)
    toks = []
    for b in range(2):
        xq, sx = rq(p[b].astype(jnp.float32))
        acc = xq @ pe["wq"].astype(jnp.float32)
        emb = acc * (sx * pe["ws"].astype(jnp.float32))
        emb = jnp.concatenate([jnp.zeros((1, d)), emb], axis=0) + posb
        toks.append(emb.astype(dt))
    h = jnp.stack(toks)
    for i in range(cfg.depth):
        blk = jax.tree_util.tree_map(lambda a: a[i], qp["blocks"])
        h = attn_block_int8_ref(h, blk["ln1_scale"], blk["ln1_bias"],
                                blk["wqkv_q"], blk["wqkv_s"], blk["bqkv"],
                                blk["wo_q"], blk["wo_s"], blk["bo"],
                                cfg.num_heads, eps=cfg.ln_eps)
        b_, n_, d_ = h.shape
        h = mlp_block_int8_ref(
            h.reshape(b_ * n_, d_), blk["ln2_scale"], blk["ln2_bias"],
            blk["w1_q"], blk["w1_s"], blk["b1"], blk["w2_q"],
            blk["w2_s"], blk["b2"], eps=cfg.ln_eps).reshape(b_, n_, d_)
    cls_t = h[:, 0].astype(jnp.float32)
    mu = jnp.mean(cls_t, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(cls_t * cls_t, axis=-1, keepdims=True) - mu * mu, 0.0)
    xn = ((cls_t - mu) * jax.lax.rsqrt(var + cfg.ln_eps)
          * qp["ln_f_scale"].astype(jnp.float32)
          + qp["ln_f_bias"].astype(jnp.float32))
    hd = qp["head"]
    rqx, rs = rq(xn)
    ref = np.asarray(
        (rqx @ hd["wq"].astype(jnp.float32))
        * (rs * hd["ws"].astype(jnp.float32))
        + hd["b"].astype(jnp.float32), np.float32)

    got = np.asarray(quantized.vit_forward_int8_latency_logits(
        qp, imgs, cfg, interpret=True), np.float32)
    assert got.shape == ref.shape
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.05
