"""Softmax clip-window calibration (utils/calibrate.py): hot-logit
checkpoints are detected and routed to the exact max-subtract kernels;
normal checkpoints keep the max-free fast path (VERDICT r2 #7)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vit_fpga_tpu.models import vit
from vit_fpga_tpu.utils import calibrate

CFG = vit.ViTConfig(image_size=32, patch_size=8, hidden_dim=64, depth=2,
                    num_heads=2, mlp_dim=128, num_classes=10,
                    dtype="float32")


def _params(seed=0, qk_scale=1.0):
    rng = np.random.default_rng(seed)
    params = vit.init_params(jax.random.key(seed), CFG)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.asarray(rng.normal(size=p.shape),
                                         p.dtype), params)
    if qk_scale != 1.0:
        # scale the q and k projection columns -> scores scale by ^2
        blocks = dict(params["blocks"])
        w = np.array(blocks["wqkv"])
        d = CFG.hidden_dim
        w[:, :, :2 * d] *= qk_scale
        b = np.array(blocks["bqkv"])
        b[:, :2 * d] *= qk_scale
        blocks["wqkv"] = jnp.asarray(w)
        blocks["bqkv"] = jnp.asarray(b)
        params = {**params, "blocks": blocks}
    return params


def test_normal_checkpoint_keeps_maxfree():
    res = calibrate.choose_softmax_mode(_params(), CFG)
    assert not res.safe
    assert res.score_max < 40.0
    cfg = calibrate.calibrated_config(_params(), CFG)
    assert cfg.safe_softmax is False


def test_hot_checkpoint_routes_safe():
    params = _params(qk_scale=14.0)
    res = calibrate.choose_softmax_mode(params, CFG)
    assert res.safe, f"hot logits not detected: {res}"
    assert (res.score_max * calibrate.DEFAULT_MARGIN > calibrate._EXP_HI
            or res.score_min * calibrate.DEFAULT_MARGIN < calibrate._EXP_LO)
    cfg = calibrate.calibrated_config(params, CFG)
    assert cfg.safe_softmax is True


def test_safe_kernel_matches_oracle_on_hot_logits():
    """With scores far outside the clip window, the max-free kernel
    deviates from the exact softmax but the safe kernel does not."""
    from vit_fpga_tpu.ops.attn_block import (attn_block_pallas,
                                             attn_block_xla)
    rng = np.random.default_rng(5)
    b, n, d, nh = 2, 17, 64, 2
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    ls = jnp.ones((d,)); lb = jnp.zeros((d,))
    # huge q/k weights -> |scores| >> 80
    wqkv = jnp.asarray(rng.normal(size=(d, 3 * d)), jnp.float32)
    wqkv = wqkv.at[:, :2 * d].mul(30.0)
    bqkv = jnp.zeros((3 * d,))
    wo = jnp.asarray(rng.normal(size=(d, d)), jnp.float32) * 0.1
    bo = jnp.zeros((d,))

    want = attn_block_xla(x, ls, lb, wqkv, bqkv, wo, bo, nh)
    safe = attn_block_pallas(x, ls, lb, wqkv, bqkv, wo, bo, nh,
                             safe_softmax=True, interpret=True)
    fast = attn_block_pallas(x, ls, lb, wqkv, bqkv, wo, bo, nh,
                             safe_softmax=False, interpret=True)
    np.testing.assert_allclose(np.asarray(safe), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # sanity: this regime genuinely breaks the max-free path
    assert np.max(np.abs(np.asarray(fast) - np.asarray(want))) > 1e-3


def test_safe_kernel_matches_maxfree_in_window():
    """Inside the window both kernel modes are exact (shift invariance)."""
    from vit_fpga_tpu.ops.attn_block import attn_block_pallas
    rng = np.random.default_rng(6)
    b, n, d, nh = 2, 17, 64, 2
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    ls = jnp.ones((d,)); lb = jnp.zeros((d,))
    wqkv = jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.1, jnp.float32)
    bqkv = jnp.zeros((3 * d,))
    wo = jnp.asarray(rng.normal(size=(d, d)) * 0.1, jnp.float32)
    bo = jnp.zeros((d,))
    a = attn_block_pallas(x, ls, lb, wqkv, bqkv, wo, bo, nh,
                          safe_softmax=True, interpret=True)
    bfast = attn_block_pallas(x, ls, lb, wqkv, bqkv, wo, bo, nh,
                              safe_softmax=False, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bfast),
                               rtol=2e-5, atol=2e-5)


def test_hot_checkpoint_end_to_end_forward_matches_oracle():
    """calibrated_config + fused (interpret) forward == XLA oracle on a
    hot-logit checkpoint."""
    params = _params(qk_scale=14.0)
    cfg = calibrate.calibrated_config(params, CFG)
    assert cfg.safe_softmax
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    ref_cfg = dataclasses.replace(cfg, attn_impl="xla", mlp_impl="xla")
    want = vit.forward(params, images, ref_cfg)
    # fused path via shard_model interpret on a 1-device mesh exercises
    # the safe kernel end to end without TPU hardware
    from vit_fpga_tpu.parallel.mesh import make_mesh
    from vit_fpga_tpu.parallel import shard_model as sm
    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    fwd = sm.make_sharded_forward(cfg, mesh, impl="interpret")
    got = fwd(sm.to_tp_layout(params), images)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_latency_path_gated_on_safe_softmax():
    cfg = vit.config("vit_b16", dtype="bfloat16")
    hot = dataclasses.replace(cfg, safe_softmax=True)
    assert vit.latency_forward_supported(cfg, 1)
    assert not vit.latency_forward_supported(hot, 1)


# (the embed VMEM fit-gate test left with the round-2 embed kernel: the
# transpose-free dotg embed is pure XLA and needs no gate — see
# ops/patch_embed.embed_tokens_dotg and experiments/perf_patchify.py)
