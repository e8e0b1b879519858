"""CLIP vision tower tests incl. HF checkpoint parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_fpga_tpu.models import clip, vit


def _tiny_cfg():
    return vit.ViTConfig(image_size=32, patch_size=8, hidden_dim=64,
                         depth=2, num_heads=4, mlp_dim=128, num_classes=0,
                         dtype="float32", attn_impl="xla",
                         hidden_act="quick_gelu", ln_eps=1e-5)


def test_forward_shapes():
    cfg = _tiny_cfg()
    params = clip.init_params(jax.random.key(0), cfg, projection_dim=32)
    imgs = jnp.zeros((2, 32, 32, 3), jnp.float32)
    emb = clip.forward(params, imgs, cfg)
    assert emb.shape == (2, 32)
    norm = clip.embed_normalized(params, imgs, cfg)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(norm), axis=-1),
                               1.0, rtol=1e-5)


def test_hf_clip_checkpoint_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    vis_cfg = transformers.CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, projection_dim=32)
    torch.manual_seed(0)
    model = transformers.CLIPVisionModelWithProjection(vis_cfg).eval()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = clip.from_hf_clip_state_dict(sd, depth=2)
    cfg = _tiny_cfg()

    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        hf_emb = model(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).image_embeds
    ours = np.asarray(clip.forward(params, jnp.asarray(imgs), cfg))
    np.testing.assert_allclose(ours, hf_emb.numpy(), rtol=2e-4, atol=2e-4)


def test_clip_l14_config():
    cfg = clip.clip_vision_config("vit_l14", image_size=224)
    assert cfg.seq_len == 257 and cfg.hidden_dim == 1024
    assert cfg.hidden_act == "quick_gelu"


def _tiny_text_cfg():
    return clip.CLIPTextConfig(vocab_size=99, hidden_dim=32, depth=2,
                               num_heads=4, mlp_dim=64, max_positions=16,
                               projection_dim=24)


def test_text_forward_shapes_and_eot_pooling():
    cfg = _tiny_text_cfg()
    params = clip.init_text_params(jax.random.key(0), cfg)
    ids = jnp.asarray([[5, 7, 98, 0, 0], [3, 98, 0, 0, 0]], jnp.int32)
    emb = clip.text_forward(params, ids, cfg)
    assert emb.shape == (2, 24)
    assert np.isfinite(np.asarray(emb)).all()


def test_hf_clip_text_checkpoint_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    txt_cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16, projection_dim=24,
        eos_token_id=98, bos_token_id=97)
    torch.manual_seed(1)
    model = transformers.CLIPTextModelWithProjection(txt_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = clip.from_hf_clip_text_state_dict(sd, depth=2)
    cfg = _tiny_text_cfg()
    # EOT (id 98) is the max id per row, matching HF's argmax pooling
    ids = np.asarray([[5, 7, 2, 98, 0], [3, 1, 98, 0, 0]], np.int64)
    import torch as _t
    with _t.no_grad():
        hf_emb = model(_t.from_numpy(ids)).text_embeds
    ours = np.asarray(clip.text_forward(
        params, jnp.asarray(ids, jnp.int32), cfg))
    np.testing.assert_allclose(ours, hf_emb.numpy(), rtol=2e-4, atol=2e-4)


def test_contrastive_loss_and_train_step():
    import optax
    vcfg = _tiny_cfg()
    tcfg = _tiny_text_cfg()
    params = {
        "vision": clip.init_params(jax.random.key(0), vcfg,
                                   projection_dim=24),
        "text": clip.init_text_params(jax.random.key(1), tcfg),
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = clip.make_clip_train_step(vcfg, tcfg, opt)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 99, size=(4, 8)), jnp.int32)
    losses = []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state, imgs, ids)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert min(losses[3:]) < losses[0]   # learns the batch


def test_clip_latency_forward_matches(monkeypatch):
    """The single-launch encoder path matches the per-layer CLIP forward
    (interpret mode off-TPU)."""
    import vit_fpga_tpu.ops.vit_stack as vs
    orig = vs.vit_layers_pallas
    monkeypatch.setattr(
        vs, "vit_layers_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    cfg = clip.clip_vision_config("vit_ti16", image_size=32,
                                  dtype="float32", attn_impl="xla",
                                  mlp_impl="xla")
    params = clip.init_params(jax.random.key(0), cfg, projection_dim=16)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                       jnp.float32)
    ref = np.asarray(clip.forward(params, imgs, cfg))
    got = np.asarray(clip.forward_latency(params, imgs, cfg))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)
