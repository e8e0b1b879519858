"""ViT model tests: shapes, attention kernel parity, HF checkpoint parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_fpga_tpu.models import vit
from vit_fpga_tpu.ops.attention import mha_pallas, mha_xla


def _tiny_cfg(**kw):
    base = dict(image_size=32, patch_size=8, hidden_dim=64, depth=2,
                num_heads=4, mlp_dim=128, num_classes=10, dtype="float32",
                attn_impl="xla")
    base.update(kw)
    return vit.ViTConfig(**base)


def test_forward_shapes_and_dtype():
    cfg = _tiny_cfg()
    params = vit.init_params(jax.random.key(0), cfg)
    imgs = jnp.zeros((3, 32, 32, 3), jnp.float32)
    logits = vit.forward(params, imgs, cfg)
    assert logits.shape == (3, 10) and logits.dtype == jnp.float32
    feats = vit.forward_features(params, imgs, cfg)
    assert feats.shape == (3, cfg.seq_len, 64)


def test_forward_raw_uint8_pipeline():
    cfg = _tiny_cfg()
    params = vit.init_params(jax.random.key(0), cfg)
    raw = np.random.default_rng(0).integers(0, 256, (2, 48, 40, 3),
                                            np.uint8)
    logits = vit.jit_forward(cfg, raw=True)(params, jnp.asarray(raw))
    assert logits.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_patchify_layout():
    # pixel order within a patch must be (py, px, c)
    img = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    out = np.asarray(vit.patchify(jnp.asarray(img), 2))
    assert out.shape == (2, 4, 12)
    # patch (0,0) of image 0 = rows 0-1, cols 0-1
    expect = img[0, 0:2, 0:2, :].reshape(-1)
    np.testing.assert_array_equal(out[0, 0], expect)
    # patch grid is row-major: patch 1 = rows 0-1, cols 2-3
    np.testing.assert_array_equal(out[0, 1], img[0, 0:2, 2:4, :].reshape(-1))


@pytest.mark.parametrize("n", [17, 128, 197])
def test_pallas_attention_matches_xla(n):
    rng = np.random.default_rng(0)
    b, h, dh = 2, 3, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
               for _ in range(3))
    ref = mha_xla(q, k, v)
    out = mha_pallas(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_attention_key_masking():
    rng = np.random.default_rng(1)
    b, h, n, dh = 1, 2, 64, 32
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
               for _ in range(3))
    ref = mha_xla(q, k, v, n_valid=40)
    out = mha_pallas(q, k, v, n_valid=40, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_scan_encoder_matches_unrolled_blocks():
    """The lax.scan over stacked blocks must equal a python loop."""
    cfg = _tiny_cfg()
    params = vit.init_params(jax.random.key(1), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 32, 32, 3)), jnp.float32)
    ref_feats = vit.forward_features(params, imgs, cfg)

    # unrolled reimplementation (same matmul precision as the model)
    with vit._precision_ctx(cfg):
        dt = cfg.compute_dtype
        x = vit.patchify(imgs.astype(dt), cfg.patch_size)
        x = x @ params["patch_embed"]["kernel"].astype(dt) + \
            params["patch_embed"]["bias"].astype(dt)
        cls = jnp.broadcast_to(params["cls_token"].astype(dt),
                               (2, 1, cfg.hidden_dim))
        x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(dt)
        for i in range(cfg.depth):
            blk = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
            x = vit._block(x, blk, cfg)
        x = vit._layernorm(x, params["ln_f_scale"], params["ln_f_bias"],
                           cfg.ln_eps)
    np.testing.assert_allclose(np.asarray(ref_feats), np.asarray(x),
                               rtol=1e-5, atol=1e-5)


def test_hf_vit_checkpoint_parity():
    """Converted HF ViT weights must reproduce HF logits."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.ViTConfig(
        image_size=32, patch_size=8, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, num_labels=10)
    torch.manual_seed(0)
    model = transformers.ViTForImageClassification(hf_cfg).eval()

    from vit_fpga_tpu.utils.checkpoint import from_hf_vit_model
    params = from_hf_vit_model(model)
    cfg = _tiny_cfg(ln_eps=hf_cfg.layer_norm_eps)

    rng = np.random.default_rng(3)
    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        hf_logits = model(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).logits.numpy()
    ours = np.asarray(vit.forward(params, jnp.asarray(imgs), cfg))
    np.testing.assert_allclose(ours, hf_logits, rtol=1e-4, atol=1e-4)


def test_save_load_roundtrip(tmp_path):
    from vit_fpga_tpu.utils.checkpoint import load_params, save_params
    cfg = _tiny_cfg()
    params = vit.init_params(jax.random.key(2), cfg)
    p = str(tmp_path / "vit.npz")
    save_params(p, params)
    back = load_params(p)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_variant_registry():
    cfg = vit.config("vit_b16")
    assert cfg.seq_len == 197 and cfg.hidden_dim == 768
    cfg = vit.config("vit_l16", image_size=384)
    assert cfg.seq_len == 577
    with pytest.raises(ValueError):
        vit.config("vit_nope")
