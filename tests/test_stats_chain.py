"""Stats-epilogue kernel chain (round 3): the producer kernel emits the
consumer's LayerNorm (mu, rstd) stats; math must match the standalone
kernels exactly (interpret mode; full-model parity on hw in
test_tpu_hw.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_fpga_tpu.ops.attn_block import (STATS_LANES, attn_block_pallas,
                                         attn_block_stats_pallas)
from vit_fpga_tpu.ops.fused_mlp import (fused_mlp_pallas,
                                        fused_mlp_stats_pallas)


def _stats_of(x2d, eps=1e-6):
    xf = np.asarray(x2d, np.float32)
    mu = xf.mean(-1, keepdims=True)
    var = np.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.0)
    st = np.zeros((xf.shape[0], STATS_LANES), np.float32)
    st[:, 0:1] = mu
    st[:, 1:2] = 1.0 / np.sqrt(var + eps)
    return st


def test_stats_chain_kernels_match_standalone():
    rng = np.random.default_rng(0)
    b, n, d, nh, m = 2, 32, 64, 2, 128
    x = jnp.asarray(rng.normal(size=(b, n, d)) * 0.5, jnp.float32)
    ls = jnp.ones((d,)); lb = jnp.zeros((d,))
    wq = jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.1, jnp.float32)
    bq = jnp.zeros((3 * d,))
    wo = jnp.asarray(rng.normal(size=(d, d)) * 0.1, jnp.float32)
    bo = jnp.zeros((d,))
    st = jnp.asarray(_stats_of(np.asarray(x).reshape(-1, d))
                     .reshape(b, n, STATS_LANES))

    want = attn_block_pallas(x, ls, lb, wq, bq, wo, bo, nh, n_valid=28,
                             interpret=True)
    got, sto = attn_block_stats_pallas(x, st, ls, lb, wq, bq, wo, bo, nh,
                                       n_valid=28, emit_stats=True,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want[:, :n]),
                               rtol=1e-5, atol=1e-5)
    # emitted stats == direct stats of the output
    ref_st = _stats_of(np.asarray(got).reshape(-1, d))
    np.testing.assert_allclose(
        np.asarray(sto).reshape(-1, STATS_LANES)[:, :2], ref_st[:, :2],
        rtol=1e-4, atol=1e-5)

    w1 = jnp.asarray(rng.normal(size=(d, m)) * 0.1, jnp.float32)
    b1 = jnp.zeros((m,))
    w2 = jnp.asarray(rng.normal(size=(m, d)) * 0.1, jnp.float32)
    b2 = jnp.zeros((d,))
    want2 = fused_mlp_pallas(got.reshape(b * n, d), ls, lb, w1, b1, w2,
                             b2, act="gelu_tanh", interpret=True)
    got2, st2 = fused_mlp_stats_pallas(
        got.reshape(b * n, d), sto.reshape(b * n, STATS_LANES), ls, lb,
        w1, b1, w2, b2, act="gelu_tanh", emit_stats=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-5, atol=1e-5)
    got3, none = fused_mlp_stats_pallas(
        got.reshape(b * n, d), sto.reshape(b * n, STATS_LANES), ls, lb,
        w1, b1, w2, b2, act="gelu_tanh", emit_stats=False, interpret=True)
    assert none is None
    np.testing.assert_allclose(np.asarray(got3), np.asarray(got2),
                               rtol=0, atol=0)


def test_chunked_stats_mlp_matches_standalone():
    """fused_mlp_chunked_stats_pallas == fused_mlp_pallas (chunk math is
    exact: h-column chunks are disjoint), and its emitted stats equal
    direct stats of the output."""
    from vit_fpga_tpu.ops.fused_mlp import fused_mlp_chunked_stats_pallas
    rng = np.random.default_rng(2)
    t, d, m = 64, 64, 256
    x = jnp.asarray(rng.normal(size=(t, d)) * 0.5, jnp.float32)
    ls = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32)
    lb = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, m)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(m,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(m, d)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    st = jnp.asarray(_stats_of(np.asarray(x)))

    want = fused_mlp_pallas(x, ls, lb, w1, b1, w2, b2, act="gelu_tanh",
                            interpret=True)
    got, sto = fused_mlp_chunked_stats_pallas(
        x, st, ls, lb, w1, b1, w2, b2, act="gelu_tanh", n_chunks=4,
        emit_stats=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    ref_st = _stats_of(np.asarray(got))
    np.testing.assert_allclose(np.asarray(sto)[:, :2], ref_st[:, :2],
                               rtol=1e-4, atol=1e-5)
    got2, none = fused_mlp_chunked_stats_pallas(
        x, st, ls, lb, w1, b1, w2, b2, act="gelu_tanh", n_chunks=4,
        emit_stats=False, interpret=True)
    assert none is None
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got),
                               rtol=0, atol=0)


def test_stats_chain_gating():
    """The chain only engages on TPU with max-free softmax and unchunked
    MLP; CPU / safe_softmax / remat configs route off it."""
    import dataclasses
    from vit_fpga_tpu.models import vit
    cfg = vit.config("vit_b16", dtype="bfloat16")
    assert not vit._stats_chain_supported(cfg, 64)   # CPU backend here
    hot = dataclasses.replace(cfg, safe_softmax=True)
    assert not vit._stats_chain_supported(hot, 64)
    rem = dataclasses.replace(cfg, remat=True)
    assert not vit._stats_chain_supported(rem, 64)


def test_mlp_vmem_plan_raised_for_long_grids():
    """ViT-B's unchunked MLP keeps the default scoped-VMEM plan at b64
    but needs the raised plan at >=32768 rows: Mosaic deepens its buffer
    pipeline with grid length and the 16 MB default OOMs at compile time
    (observed at b256: 17.27M > 16M)."""
    from vit_fpga_tpu.models import vit
    from vit_fpga_tpu.ops.fused_mlp import MLP_BIG_VMEM
    cfg = vit.config("vit_b16", dtype="bfloat16")
    assert vit._stats_chain_mlp_vmem(cfg, 64 * 208) == 0
    assert vit._stats_chain_mlp_vmem(cfg, 256 * 208) == MLP_BIG_VMEM


def test_encoder_chain_xla_matches_block_loop():
    """The chain's XLA reference (used for its VJP) equals the normal
    block loop on CPU."""
    from vit_fpga_tpu.models import vit
    rng = np.random.default_rng(1)
    cfg = vit.ViTConfig(image_size=32, patch_size=8, hidden_dim=64,
                        depth=2, num_heads=2, mlp_dim=128, num_classes=8,
                        dtype="float32", attn_impl="xla", mlp_impl="xla",
                        hidden_act="gelu_tanh")
    params = vit.init_params(jax.random.key(0), cfg)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.asarray(rng.normal(size=p.shape),
                                         p.dtype), params)
    x = jnp.asarray(rng.normal(size=(2, 24, 64)) * 0.5, jnp.float32)
    want = x
    for i in range(cfg.depth):
        blk = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
        want = vit._block(want, blk, cfg, n_valid=17)
    got = vit._encoder_chain_xla(params["blocks"], x, cfg, 17)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_int8_stats_chain_kernels_match_standalone():
    """attn_block_int8_stats / mlp_block_int8_stats == the plain int8
    mega-kernels exactly (same quantized math; LN normalize runs
    elementwise from the producer (mu, rstd) tile)."""
    from vit_fpga_tpu.ops.quant_block import (attn_block_int8,
                                              attn_block_int8_stats,
                                              mlp_block_int8,
                                              mlp_block_int8_stats)
    from vit_fpga_tpu.ops.quant_fused import quantize_weight_colwise as qc
    rng = np.random.default_rng(3)
    b, n, d, nh, m = 2, 32, 64, 2, 128
    x = jnp.asarray(rng.normal(size=(b, n, d)) * 0.5, jnp.float32)
    ls = jnp.ones((d,)); lb = jnp.zeros((d,))

    def q(shape, scale=0.1):
        wq, ws = qc(rng.normal(size=shape).astype(np.float32) * scale)
        return jnp.asarray(wq), jnp.asarray(ws)

    wqkv_q, wqkv_s = q((d, 3 * d))
    bqkv = jnp.zeros((3 * d,))
    wo_q, wo_s = q((d, d))
    bo = jnp.zeros((d,))
    st = jnp.asarray(_stats_of(np.asarray(x).reshape(-1, d))
                     .reshape(b, n, STATS_LANES))

    want = attn_block_int8(x, ls, lb, wqkv_q, wqkv_s, bqkv, wo_q, wo_s,
                           bo, nh, n_valid=28, interpret=True)
    got, sto = attn_block_int8_stats(x, st, ls, lb, wqkv_q, wqkv_s, bqkv,
                                     wo_q, wo_s, bo, nh, n_valid=28,
                                     emit_stats=True, interpret=True)
    # ULP-level: (xf-mu)*rstd may fuse differently from rsqrt inline
    np.testing.assert_allclose(np.asarray(got[:, :n]),
                               np.asarray(want[:, :n]), rtol=1e-4,
                               atol=1e-5)
    ref_st = _stats_of(np.asarray(got).reshape(-1, d))
    np.testing.assert_allclose(
        np.asarray(sto).reshape(-1, STATS_LANES)[:, :2], ref_st[:, :2],
        rtol=1e-4, atol=1e-5)

    w1_q, w1_s = q((d, m))
    b1 = jnp.zeros((m,))
    w2_q, w2_s = q((m, d))
    b2 = jnp.zeros((d,))
    want2 = mlp_block_int8(got.reshape(b * n, d), ls, lb, w1_q, w1_s, b1,
                           w2_q, w2_s, b2, act="gelu_tanh",
                           interpret=True)
    got2, st2 = mlp_block_int8_stats(
        got.reshape(b * n, d), sto.reshape(b * n, STATS_LANES), ls, lb,
        w1_q, w1_s, b1, w2_q, w2_s, b2, act="gelu_tanh", emit_stats=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-4, atol=1e-5)
    ref_st2 = _stats_of(np.asarray(got2))
    np.testing.assert_allclose(np.asarray(st2)[:, :2], ref_st2[:, :2],
                               rtol=1e-4, atol=1e-5)
    got3, none = mlp_block_int8_stats(
        got.reshape(b * n, d), sto.reshape(b * n, STATS_LANES), ls, lb,
        w1_q, w1_s, b1, w2_q, w2_s, b2, act="gelu_tanh", emit_stats=False,
        interpret=True)
    assert none is None
    np.testing.assert_allclose(np.asarray(got3), np.asarray(got2),
                               rtol=0, atol=0)


def test_int8_stats_chain_gating():
    """The int8 chain engages only on TPU with fitting mega-kernels."""
    from vit_fpga_tpu.models import vit
    from vit_fpga_tpu.models.quantized import _int8_stats_chain_supported
    cfg = vit.config("vit_b16", dtype="bfloat16")
    # CPU backend in this suite: never supported off-TPU
    assert not _int8_stats_chain_supported(cfg, 64)


def test_int8_stats_chain_bf16_tiles():
    """bf16 stats tiles (round-4 probe: halves the chain's boundary HBM
    traffic) — outputs must track the f32-tile chain within the bf16
    stats precision, and emitted stats follow the input tile dtype."""
    from vit_fpga_tpu.ops.quant_block import (attn_block_int8_stats,
                                              mlp_block_int8_stats)
    from vit_fpga_tpu.ops.quant_fused import quantize_weight_colwise as qc
    rng = np.random.default_rng(7)
    b, n, d, nh, m = 2, 32, 64, 2, 128
    x = jnp.asarray(rng.normal(size=(b, n, d)) * 0.5, jnp.float32)
    ls = jnp.ones((d,)); lb = jnp.zeros((d,))

    def q(shape, scale=0.1):
        wq, ws = qc(rng.normal(size=shape).astype(np.float32) * scale)
        return jnp.asarray(wq), jnp.asarray(ws)

    wqkv_q, wqkv_s = q((d, 3 * d))
    wo_q, wo_s = q((d, d))
    z3, zd = jnp.zeros((3 * d,)), jnp.zeros((d,))
    st32 = jnp.asarray(_stats_of(np.asarray(x).reshape(-1, d))
                       .reshape(b, n, STATS_LANES))
    want, wsto = attn_block_int8_stats(x, st32, ls, lb, wqkv_q, wqkv_s,
                                       z3, wo_q, wo_s, zd, nh, n_valid=28,
                                       emit_stats=True, interpret=True)
    got, sto = attn_block_int8_stats(x, st32.astype(jnp.bfloat16), ls, lb,
                                     wqkv_q, wqkv_s, z3, wo_q, wo_s, zd,
                                     nh, n_valid=28, emit_stats=True,
                                     interpret=True)
    assert sto.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got[:, :n], np.float32),
                               np.asarray(want[:, :n], np.float32),
                               rtol=0.05, atol=0.05)

    w1_q, w1_s = q((d, m))
    w2_q, w2_s = q((m, d))
    got2, st2 = mlp_block_int8_stats(
        got.reshape(b * n, d), sto.reshape(b * n, STATS_LANES), ls, lb,
        w1_q, w1_s, jnp.zeros((m,)), w2_q, w2_s, zd, act="gelu_tanh",
        emit_stats=True, interpret=True)
    want2, _ = mlp_block_int8_stats(
        want.reshape(b * n, d), wsto.reshape(b * n, STATS_LANES), ls, lb,
        w1_q, w1_s, jnp.zeros((m,)), w2_q, w2_s, zd, act="gelu_tanh",
        emit_stats=True, interpret=True)
    assert st2.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got2, np.float32),
                               np.asarray(want2, np.float32),
                               rtol=0.05, atol=0.08)
