"""Fused-kernel multi-chip path (parallel/shard_model.py): parity of the
shard_map forward/train step against the single-device XLA reference on
the virtual 8-device CPU mesh, in both "xla" mode (sharding structure)
and "interpret" mode (the actual Pallas kernels per shard)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_fpga_tpu.models import vit
from vit_fpga_tpu.parallel.mesh import make_mesh
from vit_fpga_tpu.parallel import shard_model as sm

CFG = vit.ViTConfig(image_size=32, patch_size=8, hidden_dim=64, depth=2,
                    num_heads=4, mlp_dim=128, num_classes=16,
                    dtype="float32", attn_impl="xla", mlp_impl="xla")


def _setup(cfg=CFG, batch=8, seed=0):
    rng = np.random.default_rng(seed)
    params = vit.init_params(jax.random.key(seed), cfg)
    # non-trivial weights so parity is meaningful
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.asarray(rng.normal(size=p.shape),
                                         p.dtype), params)
    images = jnp.asarray(rng.normal(size=(batch, cfg.image_size,
                                          cfg.image_size, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, cfg.num_classes, size=(batch,)),
                         jnp.int32)
    return params, images, labels


def test_tp_layout_roundtrip():
    params, _, _ = _setup()
    tp = sm.to_tp_layout(params)
    assert tp["blocks"]["wqkv"].shape == (2, 64, 3, 64)
    back = sm.from_tp_layout(tp)
    np.testing.assert_array_equal(back["blocks"]["wqkv"],
                                  params["blocks"]["wqkv"])
    np.testing.assert_array_equal(back["blocks"]["bqkv"],
                                  params["blocks"]["bqkv"])


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
def test_sharded_forward_parity_xla(dp, tp):
    params, images, _ = _setup()
    mesh = make_mesh(dp=dp, tp=tp)
    fwd = sm.make_sharded_forward(CFG, mesh, impl="xla")
    got = fwd(sm.to_tp_layout(params), images)
    want = vit.forward(params, images, CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("dp,tp", [(4, 2), (8, 1)])
def test_sharded_forward_parity_interpret_kernels(dp, tp):
    """The actual fused Pallas kernels (interpret mode) per shard."""
    params, images, _ = _setup()
    mesh = make_mesh(dp=dp, tp=tp)
    fwd = sm.make_sharded_forward(CFG, mesh, impl="interpret")
    got = fwd(sm.to_tp_layout(params), images)
    want = vit.forward(params, images, CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_sharded_forward_raw_uint8():
    params, _, _ = _setup()
    rng = np.random.default_rng(3)
    raw = jnp.asarray(rng.integers(0, 256, size=(8, 32, 32, 3)), jnp.uint8)
    mesh = make_mesh(dp=4, tp=2)
    fwd = sm.make_sharded_forward(CFG, mesh, impl="xla", raw=True)
    got = fwd(sm.to_tp_layout(params), raw)
    want = vit.forward_raw(params, raw, CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("impl", ["xla", "interpret"])
def test_sharded_train_step_matches_single_device(impl):
    """One fused-sharded train step == the single-device step: loss and
    updated params match (the dp grad all-reduce + tp partial grads are
    exactly the full-batch gradient)."""
    cfg = CFG
    params, images, labels = _setup()
    optimizer = optax.sgd(1e-2)
    mesh = make_mesh(dp=4, tp=2)

    ptp = jax.device_put(sm.to_tp_layout(params),
                         sm.vit_tp_param_sharding(mesh))
    opt_state = optimizer.init(ptp)
    step = sm.make_sharded_train_step(cfg, optimizer, mesh, impl=impl,
                                      donate=False)
    p2, _, metrics = step(ptp, opt_state, images, labels)

    # single-device reference
    from vit_fpga_tpu.train.trainer import make_vit_train_step
    ref_step = make_vit_train_step(cfg, optimizer, mesh=None, donate=False)
    rp, _, rmetrics = ref_step(params, optimizer.init(params), images,
                               labels)

    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(rmetrics["loss"]), rtol=1e-4)
    got = sm.from_tp_layout(jax.device_get(p2))
    for path in (("blocks", "wqkv"), ("blocks", "w2"), ("head", "kernel"),
                 ("blocks", "ln1_scale"), ("blocks", "bo")):
        a, b = got, jax.device_get(rp)
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg="/".join(path))


def test_sharded_train_step_padded_labels():
    """-1 labels (partial-batch padding) contribute zero loss, matching
    trainer.cross_entropy semantics."""
    params, images, labels = _setup()
    labels = labels.at[-3:].set(-1)
    optimizer = optax.sgd(1e-2)
    mesh = make_mesh(dp=4, tp=2)
    ptp = jax.device_put(sm.to_tp_layout(params),
                         sm.vit_tp_param_sharding(mesh))
    step = sm.make_sharded_train_step(CFG, optimizer, mesh, impl="xla",
                                      donate=False)
    _, _, metrics = step(ptp, optimizer.init(ptp), images, labels)

    from vit_fpga_tpu.train.trainer import make_vit_train_step
    ref_step = make_vit_train_step(CFG, optimizer, mesh=None, donate=False)
    _, _, rmetrics = ref_step(params, optimizer.init(params), images,
                              labels)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(rmetrics["loss"]), rtol=1e-4)


def test_sharded_hybrid_mesh():
    """dcn×dp×tp multi-slice mesh: batch spans (dcn, dp)."""
    from vit_fpga_tpu.parallel.mesh import make_hybrid_mesh
    params, images, labels = _setup()
    optimizer = optax.sgd(1e-2)
    mesh = make_hybrid_mesh(dcn=2, dp=2, tp=2)
    ptp = jax.device_put(sm.to_tp_layout(params),
                         sm.vit_tp_param_sharding(mesh))
    step = sm.make_sharded_train_step(CFG, optimizer, mesh, impl="xla",
                                      donate=False)
    _, _, metrics = step(ptp, optimizer.init(ptp), images, labels)
    from vit_fpga_tpu.train.trainer import make_vit_train_step
    ref_step = make_vit_train_step(CFG, optimizer, mesh=None, donate=False)
    _, _, rmetrics = ref_step(params, optimizer.init(params), images,
                              labels)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(rmetrics["loss"]), rtol=1e-4)


def test_sharded_forward_bf16_realistic_geometry():
    """ViT-S-like bf16 geometry through the interpret kernels on the mesh
    — catches sharding regressions the tiny f32 smoke config can't (bf16
    collectives, head_dim 64 panels, padded-residency rows)."""
    cfg = vit.ViTConfig(image_size=64, patch_size=16, hidden_dim=128,
                        depth=2, num_heads=2, mlp_dim=256, num_classes=10,
                        dtype="bfloat16")
    rng = np.random.default_rng(7)
    params = vit.init_params(jax.random.key(1), cfg)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.asarray(rng.normal(size=p.shape),
                                         p.dtype), params)
    images = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    fwd = sm.make_sharded_forward(cfg, mesh, impl="interpret")
    got = fwd(sm.to_tp_layout(params), images)
    import dataclasses
    ref_cfg = dataclasses.replace(cfg, attn_impl="xla", mlp_impl="xla")
    want = vit.forward(params, images, ref_cfg)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.08, atol=0.15)
