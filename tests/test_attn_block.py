"""Fused attention-half mega-kernel parity."""

import numpy as np

import jax
import jax.numpy as jnp

from vit_fpga_tpu.ops.attn_block import attn_block_pallas, attn_block_xla


def test_attn_block_pallas_matches_xla():
    rng = np.random.default_rng(0)
    b, n, nh, dh = 2, 197, 4, 32
    d = nh * dh
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    ls = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32)
    lb = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * d,)) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.normal(size=(d, d)) * 0.05, jnp.float32)
    bo = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    ref = attn_block_xla(x, ls, lb, wqkv, bqkv, wo, bo, nh)
    out = attn_block_pallas(x, ls, lb, wqkv, bqkv, wo, bo, nh,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_model_block_uses_same_semantics():
    """The XLA fallback in vit._block equals attn_block_xla on the same
    params (guards the mega-kernel wiring against drift)."""
    from vit_fpga_tpu.models import vit
    cfg = vit.ViTConfig(image_size=32, patch_size=8, hidden_dim=64,
                        depth=1, num_heads=4, mlp_dim=128, num_classes=4,
                        dtype="float32", attn_impl="xla")
    params = vit.init_params(jax.random.key(0), cfg)
    blk = jax.tree_util.tree_map(lambda a: a[0], params["blocks"])
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, cfg.seq_len, 64)), jnp.float32)
    ref = attn_block_xla(x, blk["ln1_scale"], blk["ln1_bias"],
                         blk["wqkv"], blk["bqkv"], blk["wo"], blk["bo"],
                         4, eps=cfg.ln_eps)
    # reproduce the model's xla branch
    h = vit._layernorm(x, blk["ln1_scale"], blk["ln1_bias"], cfg.ln_eps)
    qkv = h @ blk["wqkv"] + blk["bqkv"]
    from vit_fpga_tpu.ops.attention import mha_qkv
    o = mha_qkv(qkv, 4, impl="xla")
    got = x + (o @ blk["wo"] + blk["bo"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
