"""Checkpoint/resume + pos-embed interpolation tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_fpga_tpu.models import vit


def _tiny_cfg(image_size=32, **kw):
    base = dict(image_size=image_size, patch_size=8, hidden_dim=64,
                depth=2, num_heads=4, mlp_dim=128, num_classes=6,
                dtype="float32", attn_impl="xla")
    base.update(kw)
    return vit.ViTConfig(**base)


def test_pos_embed_interpolation_serves_new_resolution():
    cfg224 = _tiny_cfg(32)
    cfg384 = _tiny_cfg(48)
    params = vit.init_params(jax.random.key(0), cfg224)
    up = vit.interpolate_pos_embed(params, 32, 48, 8)
    assert up["pos_embed"].shape == (1, cfg384.seq_len, 64)
    imgs = jnp.zeros((2, 48, 48, 3), jnp.float32)
    logits = vit.forward(up, imgs, cfg384)
    assert logits.shape == (2, 6)
    assert np.all(np.isfinite(np.asarray(logits)))
    # identity when sizes match
    same = vit.interpolate_pos_embed(params, 32, 32, 8)
    assert same is params


def test_train_state_resume_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    import optax
    from vit_fpga_tpu.train.trainer import (init_train_state,
                                            make_vit_train_step)
    from vit_fpga_tpu.utils.checkpoint import (load_train_state,
                                               save_train_state)
    cfg = _tiny_cfg()
    opt = optax.adamw(1e-3)
    params, opt_state = init_train_state(jax.random.key(0), cfg, opt)
    step = make_vit_train_step(cfg, opt, donate=False)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 6, 4), jnp.int32)
    params, opt_state, _ = step(params, opt_state, imgs, labels)

    state = {"params": params, "opt_state": opt_state, "step": 1}
    path = str(tmp_path / "ckpt")
    save_train_state(path, state)
    restored = load_train_state(path, like=state)
    assert restored["step"] == 1

    # resumed training continues identically
    p1, o1, m1 = step(params, opt_state, imgs, labels)
    p2, o2, m2 = step(restored["params"], restored["opt_state"], imgs,
                      labels)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# Trust-boundary calibration (VERDICT r3 #5): importing a hot-logit
# checkpoint through the IMPORT PATH (not the manual calibrate API) must
# land on the exact max-subtract softmax.
# ---------------------------------------------------------------------------

def _tiny_hf_vit(hot: bool):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.ViTConfig(
        image_size=32, patch_size=8, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, num_labels=6)
    torch.manual_seed(0)
    model = transformers.ViTForImageClassification(hf_cfg).eval()
    if hot:
        # inflate q/k so attention scores blow past the [-70, 80] window
        with torch.no_grad():
            for blk in model.vit.encoder.layer:
                blk.attention.attention.query.weight *= 40.0
                blk.attention.attention.key.weight *= 40.0
    return model


def test_hf_import_path_autocalibrates_hot_checkpoint():
    from vit_fpga_tpu.utils.checkpoint import import_hf_vit
    params, cfg = import_hf_vit(_tiny_hf_vit(hot=True), dtype="float32")
    assert cfg.safe_softmax, "hot HF checkpoint must import onto the " \
                             "exact max-subtract softmax path"
    # the built config matches the checkpoint's own geometry
    assert (cfg.hidden_dim, cfg.depth, cfg.num_heads, cfg.mlp_dim,
            cfg.num_classes) == (64, 2, 4, 128, 6)
    assert "head" in params


def test_hf_import_path_keeps_fast_path_for_cold_checkpoint():
    from vit_fpga_tpu.utils.checkpoint import import_hf_vit
    _, cfg = import_hf_vit(_tiny_hf_vit(hot=False), dtype="float32")
    assert not cfg.safe_softmax


def test_autocalibrated_is_idempotent_and_loud(caplog):
    import logging
    from vit_fpga_tpu.utils.checkpoint import autocalibrated
    cfg = _tiny_cfg()
    params = vit.init_params(jax.random.key(0), cfg)
    # make it hot by scaling qkv weights the same way serving would see
    params["blocks"]["wqkv"] = params["blocks"]["wqkv"] * 40.0
    with caplog.at_level(logging.WARNING):
        out = autocalibrated(params, cfg, source="unit-test ckpt")
    assert out.safe_softmax
    assert any("hot attention logits" in r.message for r in caplog.records)
    # already-safe configs don't warn again
    with caplog.at_level(logging.WARNING):
        caplog.clear()
        out2 = autocalibrated(params, out, source="unit-test ckpt")
    assert out2.safe_softmax
    assert not any("hot attention logits" in r.message
                   for r in caplog.records)
