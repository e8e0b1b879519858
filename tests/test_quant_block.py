"""Int8 transformer-block mega-kernel parity tests (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from vit_fpga_tpu.ops import quant_block as qb
from vit_fpga_tpu.ops.quant_fused import quantize_weight_colwise


def _mk(rng, shape, scale=0.1):
    return jnp.asarray(rng.normal(size=shape) * scale, jnp.float32)


def test_mlp_block_int8_matches_ref():
    rng = np.random.default_rng(0)
    t, d, m = 40, 64, 128
    x = _mk(rng, (t, d), 1.0)
    ls = _mk(rng, (d,), 0.1) + 1.0
    lb = _mk(rng, (d,), 0.1)
    w1q, w1s = quantize_weight_colwise(np.asarray(_mk(rng, (d, m))))
    w2q, w2s = quantize_weight_colwise(np.asarray(_mk(rng, (m, d))))
    b1 = _mk(rng, (m,), 0.5)
    b2 = _mk(rng, (d,), 0.5)
    args = (x, ls, lb, jnp.asarray(w1q), jnp.asarray(w1s), b1,
            jnp.asarray(w2q), jnp.asarray(w2s), b2)
    ref = qb.mlp_block_int8_ref(*args, act="gelu_tanh")
    out = qb.mlp_block_int8(*args, act="gelu_tanh", block_t=32,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_attn_block_int8_matches_ref():
    rng = np.random.default_rng(1)
    B, N, D, H = 2, 13, 32, 4
    x = _mk(rng, (B, N, D), 1.0)
    ls = _mk(rng, (D,), 0.1) + 1.0
    lb = _mk(rng, (D,), 0.1)
    wqkvq, wqkvs = quantize_weight_colwise(np.asarray(_mk(rng, (D, 3 * D))))
    woq, wos = quantize_weight_colwise(np.asarray(_mk(rng, (D, D))))
    bqkv = _mk(rng, (3 * D,), 0.2)
    bo = _mk(rng, (D,), 0.2)
    args = (x, ls, lb, jnp.asarray(wqkvq), jnp.asarray(wqkvs), bqkv,
            jnp.asarray(woq), jnp.asarray(wos), bo, H)
    ref = qb.attn_block_int8_ref(*args)
    out = qb.attn_block_int8(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_vit_int8_headless_returns_features():
    """Headless checkpoints (HF ViTModel imports) must not KeyError in the
    int8 forwards — they return pooled features instead (ADVICE r1)."""
    from vit_fpga_tpu.models import quantized, vit
    cfg = vit.config("vit_ti16", image_size=32, num_classes=10,
                     dtype="float32", attn_impl="xla")
    params = vit.init_params(jax.random.key(0), cfg)
    params.pop("head")
    qp = quantized.quantize_vit(params)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3), jnp.float32)
    feats = quantized.vit_forward_int8(qp, x, cfg)
    assert feats.shape == (2, cfg.hidden_dim)
    assert np.isfinite(np.asarray(feats, np.float32)).all()


def test_int8_block_fits_geometries():
    from vit_fpga_tpu.models import quantized, vit
    assert quantized._int8_block_fits(vit.config("vit_b16"))
    assert quantized._int8_block_fits(vit.config("vit_l14"))


def test_int8_latency_stack_matches_fast_path():
    """The int8 layers-on-grid kernel matches the per-layer int8 fast
    encoder semantics (interpret mode)."""
    import vit_fpga_tpu.ops.vit_stack as vs
    from vit_fpga_tpu.models import quantized, vit
    from vit_fpga_tpu.ops.quant_block import (attn_block_int8_ref,
                                              mlp_block_int8_ref)
    cfg = vit.ViTConfig(image_size=16, patch_size=8, hidden_dim=32,
                        depth=2, num_heads=4, mlp_dim=64, num_classes=5,
                        dtype="bfloat16", attn_impl="xla", mlp_impl="xla")
    params = vit.init_params(jax.random.key(0), cfg)
    qp = quantized.quantize_vit_fast(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 32)), jnp.bfloat16)
    # reference: the per-layer int8 block composition
    h = x
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
    ref = np.asarray(h, np.float32)
    got = np.asarray(vs.vit_layers_int8_pallas(
        x, qp["blocks"], cfg.num_heads, eps=cfg.ln_eps, act="gelu_tanh",
        interpret=True), np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.03


def test_mlp_block_t_tiering_pinned():
    """The adaptive int8 MLP row-tile keeps its MEASURED decisions
    (ADVICE r4): 640 at ViT-B b64 geometry, 256 at batch-1 row counts
    and at CLIP-L/ViT-L weight footprints, and conservative fallback at
    untested mid geometries near the VMEM cutoff."""
    from vit_fpga_tpu.ops.quant_block import mlp_block_t, mlp_plan_int8
    assert mlp_block_t(12800, 768, 3072) == 640     # ViT-B b64 (200*64)
    assert mlp_block_t(200, 768, 3072) == 256       # ViT-B batch-1
    assert mlp_block_t(67584, 1024, 4096) == 256    # CLIP-L b256 (264*256)
    assert mlp_block_t(9248, 1024, 4096) == 256     # ViT-L@384 b16
    assert mlp_block_t(12800, 896, 3584) == 256     # untested mid geometry
    # default-plan geometries pass through mlp_block_t with no override
    assert mlp_plan_int8(12800, 768, 3072) == (640, 0)
    assert mlp_plan_int8(67584, 1024, 4096) == (256, 0)
    # ViT-H (12.5 MB int8 weights) engages the raised plan (round 5)
    bt, vmem = mlp_plan_int8(32 * 264, 1280, 5120)
    assert bt > 0 and vmem == qb.MLP_INT8_BIG_VMEM
    # absurd geometry: nothing fits even raised -> per-linear fallback
    assert mlp_plan_int8(1024, 4096, 16384) == (0, 0)

def test_attn_plan_raised_cap_near_default():
    """Fast-tier attention plans whose tile-model estimate sits near the
    16 MB default scoped-VMEM plan carry a RAISED enforcement cap:
    Mosaic's true stack demand varies with the grid count (ViT-H int8
    compiles at grid=32 but asks 18.77 MB at grid=4 — found by a
    batch-4 end-to-end drive, round 5), so small-batch dispatch must
    not compile-OOM on a geometry the model accepts.  Tier decisions
    (imgs, n_sc, reuse_q) are unchanged by the cap."""
    from vit_fpga_tpu.ops.attn_block import attn_plan
    # ViT-H int8: near-edge fast tier -> cap raised, same tier
    for batch in (4, 32):
        imgs, n_sc, reuse_q, vmem = qb.score_slots_int8(
            16, 1280, 264, 384, batch=batch)
        assert (imgs, n_sc, reuse_q) == (1, 1, False)
        assert vmem > 16 * 1024 * 1024
    # CLIP-L int8 fast tier is near-edge too (est ~12.7 MiB)
    assert qb.score_slots_int8(16, 1024, 264, 384, batch=4)[3] > 0
    # comfortable geometries keep the default plan (cap 0)
    p = attn_plan(12, 768, 208, 256, itemsize=2, batch=1)
    assert (p.imgs, p.reuse_q, p.vmem_limit) == (1, False, 0)
