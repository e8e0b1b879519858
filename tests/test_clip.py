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
