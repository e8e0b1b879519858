"""NetTPU vs NetCPU parity (run on the CPU platform via conftest)."""

import numpy as np

from vit_fpga_tpu.backends.cpu import NetCPU
from vit_fpga_tpu.backends.tpu import NetTPU
from vit_fpga_tpu.defines import (ACT_IDENTITY, ACT_RELU2, NetSets,
                                  random_net)
from vit_fpga_tpu.runtime.engine import Engine


def test_forward_parity_with_oracle():
    data = random_net(64, [128, 32, 10], seed=11)
    cpu, tpu = NetCPU(data), NetTPU(data)
    x = np.random.default_rng(0).normal(size=(8, 64)).astype(np.float32)
    np.testing.assert_allclose(tpu.forward_batch(x), cpu.forward_batch(x),
                               rtol=1e-4, atol=1e-5)


def test_single_input_and_perf_counter():
    data = random_net(16, [8], seed=1)
    tpu = NetTPU(data)
    out = tpu.launch_forward(np.ones(16, np.float32))
    assert out.shape == (8,)
    assert tpu.get_forward_performance() > 0


def test_compile_cache_shared_across_instances():
    eng = Engine.get()
    data = random_net(12, [6, 3], seed=2)
    a, b = NetTPU(data), NetTPU(data)
    x = np.zeros((1, 12), np.float32)
    a.forward_batch(x)
    n = eng.n_compiled
    b.forward_batch(x)  # same (acts, dtype) signature -> no new compile entry
    assert eng.n_compiled == n
    np.testing.assert_array_equal(a.forward_batch(x), b.forward_batch(x))


def test_param_residency_restage_on_training():
    data = random_net(4, [4, 2], seed=3,
                      activations=[ACT_RELU2, ACT_IDENTITY])
    tpu = NetTPU(data)
    x = np.ones((2, 4), np.float32)
    before = tpu.forward_batch(x)
    rng = np.random.default_rng(0)
    X = rng.normal(size=(32, 4)).astype(np.float32)
    Y = rng.normal(size=(32, 2)).astype(np.float32)
    tpu.init_gradient(NetSets(X, Y))
    tpu.launch_gradient(10, 1e-9, 0.05)
    after = tpu.forward_batch(x)
    assert not np.allclose(before, after), "training must update weights"


def test_training_parity_with_oracle():
    data = random_net(6, [12, 3], seed=7,
                      activations=[ACT_RELU2, ACT_IDENTITY])
    rng = np.random.default_rng(1)
    X = rng.normal(size=(64, 6)).astype(np.float32)
    Y = rng.normal(size=(64, 3)).astype(np.float32)
    sets = NetSets(X, Y)
    cpu, tpu = NetCPU(data), NetTPU(data)
    cpu.init_gradient(sets)
    tpu.init_gradient(sets)
    e_cpu = cpu.launch_gradient(25, 1e-9, 0.02)
    e_tpu = tpu.launch_gradient(25, 1e-9, 0.02)
    np.testing.assert_allclose(e_tpu, e_cpu, rtol=2e-3, atol=1e-5)
    x = rng.normal(size=(4, 6)).astype(np.float32)
    np.testing.assert_allclose(tpu.forward_batch(x), cpu.forward_batch(x),
                               rtol=2e-3, atol=1e-4)
    assert tpu.get_gradient_performance() > 0


def test_training_early_stop_pads_zeros():
    data = random_net(3, [4, 1], seed=5,
                      activations=[ACT_RELU2, ACT_IDENTITY])
    rng = np.random.default_rng(2)
    X = rng.normal(size=(16, 3)).astype(np.float32)
    net = NetCPU(data)
    Y = net.forward_batch(X)  # zero-loss target => immediate early stop
    tpu = NetTPU(data)
    tpu.init_gradient(NetSets(X, Y))
    errs = tpu.launch_gradient(10, error_threshold=1e-3, multiplier=0.01)
    assert errs.shape == (10,)
    assert errs[0] < 1e-3 and np.all(errs[1:] == 0.0)


def test_get_net_data_roundtrip_after_training():
    data = random_net(5, [8, 2], seed=9,
                      activations=[ACT_RELU2, ACT_IDENTITY])
    tpu = NetTPU(data)
    rng = np.random.default_rng(3)
    X = rng.normal(size=(32, 5)).astype(np.float32)
    Y = rng.normal(size=(32, 2)).astype(np.float32)
    tpu.init_gradient(NetSets(X, Y))
    tpu.launch_gradient(5, 1e-9, 0.05)
    clone = NetTPU(tpu.get_net_data())
    x = rng.normal(size=(2, 5)).astype(np.float32)
    np.testing.assert_allclose(clone.forward_batch(x), tpu.forward_batch(x),
                               rtol=1e-6, atol=1e-7)


def test_bfloat16_compute_mode():
    data = random_net(32, [64, 8], seed=4)
    f32, bf16 = NetTPU(data), NetTPU(data, compute_dtype="bfloat16")
    x = np.random.default_rng(5).normal(size=(4, 32)).astype(np.float32)
    a, b = f32.forward_batch(x), bf16.forward_batch(x)
    assert b.dtype == np.float32  # outputs are upcast at the boundary
    np.testing.assert_allclose(a, b, rtol=0.1, atol=0.5)
