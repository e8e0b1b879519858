"""Training data pipeline tests (host loader + device prefetch)."""

import numpy as np

import jax
import jax.numpy as jnp

from vit_fpga_tpu.runtime.data import (HostLoader, device_prefetch,
                                       synthetic_source)


def test_host_loader_batches_everything():
    src = synthetic_source(37, 8, 10, seed=1)
    loader = HostLoader(src, batch_size=8, workers=3)
    batches = list(loader)
    total = sum(int((lb >= 0).sum()) for _, lb in batches)
    assert total == 37
    for imgs, labels in batches:
        assert imgs.shape == (8, 8, 8, 3) and imgs.dtype == np.uint8
        assert labels.shape == (8,) and labels.dtype == np.int32
    loader.close()


def test_device_prefetch_roundtrip():
    src = synthetic_source(20, 8, 4, seed=2)
    loader = HostLoader(src, batch_size=4, workers=2)
    host = list(loader)
    dev = list(device_prefetch(iter(host), prefetch=2))
    assert len(dev) == len(host)
    for (hi, hl), (di, dl) in zip(host, dev):
        assert isinstance(di, jax.Array)
        np.testing.assert_array_equal(np.asarray(di), hi)
        np.testing.assert_array_equal(np.asarray(dl), hl)


def test_device_prefetch_mesh_sharding():
    from vit_fpga_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(dp=4, tp=2)
    src = synthetic_source(16, 8, 4, seed=3)
    loader = HostLoader(src, batch_size=8, workers=2)
    dev = list(device_prefetch(loader, prefetch=1, sharding=mesh))
    assert len(dev) == 2
    imgs, labels = dev[0]
    assert len(imgs.sharding.device_set) == 8
    assert imgs.shape == (8, 8, 8, 3)


def test_loader_feeds_training_loop():
    import optax
    from vit_fpga_tpu.models import vit
    from vit_fpga_tpu.train.trainer import (init_train_state,
                                            make_vit_train_step)
    cfg = vit.ViTConfig(image_size=8, patch_size=4, hidden_dim=32,
                        depth=1, num_heads=4, mlp_dim=64, num_classes=4,
                        dtype="float32", attn_impl="xla")
    opt = optax.sgd(1e-3)
    params, opt_state = init_train_state(jax.random.key(0), cfg, opt)
    step = make_vit_train_step(cfg, opt, donate=False)
    loader = HostLoader(synthetic_source(24, 8, 4), batch_size=8)
    n = 0
    for imgs, labels in device_prefetch(loader, prefetch=2):
        x = imgs.astype(jnp.float32) / 255.0
        params, opt_state, m = step(params, opt_state, x,
                                    jnp.maximum(labels, 0))
        assert np.isfinite(float(m["loss"]))
        n += 1
    assert n == 3
