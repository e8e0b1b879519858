"""DeiT model family: dual prefix tokens, dual heads, HF parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_fpga_tpu.models import deit, vit


def test_deit_config_geometry():
    cfg = deit.config("deit_b16")
    assert cfg.num_prefix_tokens == 2
    assert cfg.seq_len == 14 * 14 + 2 == 198
    assert cfg.hidden_dim == 768


def test_deit_forward_shapes_and_single_head():
    cfg = deit.config("deit_ti16", image_size=32, patch_size=8,
                      hidden_dim=64, depth=2, num_heads=2, mlp_dim=128,
                      num_classes=7, dtype="float32")
    params = deit.init_params(jax.random.key(0), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, 32, 32, 3)), jnp.float32)
    logits = deit.forward(params, imgs, cfg)
    assert logits.shape == (3, 7)
    # dual-head average differs from the CLS head alone
    single = dict(params)
    single.pop("head_dist")
    logits_cls = deit.forward(single, imgs, cfg)
    assert logits_cls.shape == (3, 7)
    assert not np.allclose(np.asarray(logits), np.asarray(logits_cls))


def test_deit_prefix_tokens_fused_embed_matches_xla():
    """The fused-embed path (prefix rows in the folded posb table) must
    match the XLA concat path for num_prefix_tokens=2."""
    cfg = deit.config("deit_ti16", image_size=32, patch_size=8,
                      hidden_dim=64, depth=1, num_heads=2, mlp_dim=128,
                      num_classes=4, dtype="float32")
    params = deit.init_params(jax.random.key(1), cfg)
    # give prefix tokens + pos distinct values so mistakes show
    params["cls_token"] = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 2, 64)), jnp.float32)
    imgs = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 32, 32, 3)), jnp.float32)

    from vit_fpga_tpu.ops.common import round_up
    n_pad = round_up(cfg.seq_len, 8)

    # XLA reference chain
    x = vit.patchify(imgs, cfg.patch_size)
    x = x @ params["patch_embed"]["kernel"] + params["patch_embed"]["bias"]
    cls = jnp.broadcast_to(params["cls_token"], (2, 2, 64))
    want = jnp.concatenate([cls, x], axis=1) + params["pos_embed"]
    want = jnp.pad(want, [(0, 0), (0, n_pad - cfg.seq_len), (0, 0)])

    got = vit._fused_embed(params, imgs, cfg, n_pad)   # dotg: pure XLA
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_hf_deit_checkpoint_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.DeiTConfig(
        image_size=32, patch_size=8, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, num_labels=5)
    torch.manual_seed(0)
    model = transformers.DeiTForImageClassificationWithTeacher(
        hf_cfg).eval()

    params = deit.from_hf_deit_model(model)
    cfg = deit.config("deit_ti16", image_size=32, patch_size=8,
                      hidden_dim=64, depth=2, num_heads=4, mlp_dim=128,
                      num_classes=5, dtype="float32",
                      ln_eps=hf_cfg.layer_norm_eps)

    rng = np.random.default_rng(3)
    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        hf_logits = model(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).logits
    ours = np.asarray(deit.forward(params, jnp.asarray(imgs), cfg))
    np.testing.assert_allclose(ours, hf_logits.numpy(),
                               rtol=2e-4, atol=2e-4)
