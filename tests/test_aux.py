"""Auxiliary subsystem tests: perf counters, tracing, metrics, pooling,
multi-model residency."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_fpga_tpu.backends.tpu import NetTPU
from vit_fpga_tpu.defines import random_net
from vit_fpga_tpu.runtime import perf
from vit_fpga_tpu.utils.log import Metrics, get_logger


def test_perf_counters_disabled_mode(monkeypatch):
    """With counters compiled out, getters return 0 — the reference's
    #ifdef-disabled behavior (src/netFPGA.cpp:593-611)."""
    monkeypatch.setattr(perf, "PERFORMANCE_COUNTERS", False)
    net = NetTPU(random_net(8, [4], seed=0))
    net.launch_forward(np.zeros(8, np.float32))
    assert net.get_forward_performance() == 0


def test_device_trace_writes_profile(tmp_path):
    with perf.device_trace(str(tmp_path)):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    found = glob.glob(str(tmp_path / "**" / "*"), recursive=True)
    assert any(os.path.isfile(f) for f in found), "no trace artifacts"


def test_metrics_registry():
    Metrics.reset()
    Metrics.incr("test/counter")
    Metrics.incr("test/counter", 2)
    Metrics.gauge("test/gauge", 4.5)
    snap = Metrics.snapshot()
    assert snap["test/counter"] == 3.0
    assert snap["gauge/test/gauge"] == 4.5
    Metrics.reset()
    assert "test/counter" not in Metrics.snapshot()


def test_ring_metrics_recorded():
    Metrics.reset()
    from vit_fpga_tpu.runtime.pipeline import StreamingRing
    ring = StreamingRing(1)
    ring.try_submit(lambda: 1, None)
    ring.try_submit(lambda: 2, None)  # dropped
    snap = Metrics.snapshot()
    assert snap["ring/submitted"] == 1.0 and snap["ring/dropped"] == 1.0


def test_gap_pooling():
    from vit_fpga_tpu.models import vit
    cfg = vit.ViTConfig(image_size=32, patch_size=8, hidden_dim=64,
                        depth=1, num_heads=4, mlp_dim=128, num_classes=5,
                        dtype="float32", attn_impl="xla", pool="gap")
    params = vit.init_params(jax.random.key(0), cfg)
    logits = vit.forward(params, jnp.zeros((2, 32, 32, 3)), cfg)
    assert logits.shape == (2, 5)
    feats = vit.forward_features(params, jnp.zeros((2, 32, 32, 3)), cfg)
    want = (np.asarray(feats)[:, 1:].mean(axis=1).astype(np.float32)
            @ np.asarray(params["head"]["kernel"])
            + np.asarray(params["head"]["bias"]))
    np.testing.assert_allclose(np.asarray(logits), want, rtol=1e-4,
                               atol=1e-5)


def test_two_models_alternate_without_restage_conflict():
    """Two backends alternating must each keep correct outputs (the
    reference's single global device buffer forced restaging on every
    swap, src/netFPGA.cpp:254; ours caches per instance)."""
    a = NetTPU(random_net(8, [4], seed=1))
    b = NetTPU(random_net(8, [4], seed=2))
    x = np.ones(8, np.float32)
    ya1, yb1 = a.launch_forward(x), b.launch_forward(x)
    ya2, yb2 = a.launch_forward(x), b.launch_forward(x)
    np.testing.assert_array_equal(ya1, ya2)
    np.testing.assert_array_equal(yb1, yb2)
    assert not np.allclose(ya1, yb1)


def test_logger_namespaced():
    log = get_logger("vit_fpga_tpu.test")
    assert log.name == "vit_fpga_tpu.test"
