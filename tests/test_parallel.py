"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_fpga_tpu.models import mlp, vit
from vit_fpga_tpu.parallel.mesh import make_mesh
from vit_fpga_tpu.parallel.sharding import (batch_sharding,
                                            mlp_param_sharding,
                                            shard_params,
                                            vit_param_sharding)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _tiny_cfg(**kw):
    base = dict(image_size=32, patch_size=8, hidden_dim=64, depth=2,
                num_heads=4, mlp_dim=128, num_classes=10, dtype="float32",
                attn_impl="xla")
    base.update(kw)
    return vit.ViTConfig(**base)


def test_mesh_factoring():
    m = make_mesh(dp=4, tp=2)
    assert m.shape == {"dp": 4, "tp": 2}
    m = make_mesh(tp=2)
    assert m.shape == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=3)


def test_vit_forward_dp_tp_matches_single_device():
    cfg = _tiny_cfg()
    params = vit.init_params(jax.random.key(0), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 32, 32, 3)), jnp.float32)
    ref = np.asarray(vit.forward(params, imgs, cfg))

    mesh = make_mesh(dp=4, tp=2)
    sharded = shard_params(params, vit_param_sharding(mesh))
    imgs_s = jax.device_put(imgs, batch_sharding(mesh, 4))
    fwd = jax.jit(lambda p, x: vit.forward(p, x, cfg))
    out = np.asarray(fwd(sharded, imgs_s))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_vit_train_step_dp_tp():
    import optax
    from vit_fpga_tpu.train.trainer import (init_train_state,
                                            make_vit_train_step)
    cfg = _tiny_cfg()
    mesh = make_mesh(dp=4, tp=2)
    opt = optax.adamw(1e-3)
    params, opt_state = init_train_state(jax.random.key(0), cfg, opt, mesh)
    step = make_vit_train_step(cfg, opt, mesh)
    rng = np.random.default_rng(1)
    imgs = jax.device_put(
        jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32),
        batch_sharding(mesh, 4))
    labels = jax.device_put(jnp.asarray(rng.integers(0, 10, 8), jnp.int32),
                            batch_sharding(mesh, 1))
    losses = []
    for _ in range(3):
        params, opt_state, metrics = step(params, opt_state, imgs, labels)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"loss should drop: {losses}"


def test_trainer_loop_single_and_mesh():
    from vit_fpga_tpu.train.trainer import Trainer
    cfg = _tiny_cfg(num_classes=4)
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, 8), jnp.int32)
    batches = [(imgs, labels)] * 4

    tr = Trainer(cfg, learning_rate=1e-3)
    hist = tr.fit(batches)
    assert hist[-1]["loss"] < hist[0]["loss"]

    tr2 = Trainer(cfg, learning_rate=1e-3, mesh=make_mesh(dp=2, tp=4))
    hist2 = tr2.fit(batches)
    assert hist2[-1]["loss"] < hist2[0]["loss"]


def test_mlp_tp_sharded_forward_parity():
    params, acts = mlp.random_model(32, [64, 64, 8], seed=0)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(16, 32)),
                    jnp.float32)
    ref = np.asarray(mlp.forward(params, x, acts=acts))
    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(params, mlp_param_sharding(mesh, params))
    xs = jax.device_put(x, batch_sharding(mesh, 2))
    out = np.asarray(jax.jit(
        lambda p, x: mlp.forward(p, x, acts=acts))(sharded, xs))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_graft_entry_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sequence_parallel_train_step_matches():
    """SP activation resharding must not change the math.  The sharding is
    carried in the config (no process-global to reset between traces)."""
    import optax
    from vit_fpga_tpu.train.trainer import (init_train_state,
                                            make_vit_train_step)
    cfg = _tiny_cfg()
    mesh = make_mesh(dp=4, tp=2)
    opt = optax.adamw(1e-3)
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 10, 8), jnp.int32)

    losses = {}
    for sp in (False, True):
        params, opt_state = init_train_state(jax.random.key(0), cfg, opt,
                                             mesh)
        step = make_vit_train_step(cfg, opt, mesh, donate=False,
                                   sequence_parallel=sp)
        _, _, metrics = step(params, opt_state,
                             jax.device_put(imgs, batch_sharding(mesh, 4)),
                             jax.device_put(labels,
                                            batch_sharding(mesh, 1)))
        losses[sp] = float(metrics["loss"])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)
