"""NetTPU int8 compute mode (the fixed-point datapath on the backend API)."""

import numpy as np

from vit_fpga_tpu.backends.tpu import NetTPU
from vit_fpga_tpu.defines import ACT_IDENTITY, ACT_RELU2, random_net
from vit_fpga_tpu.models import quantized


def test_int8_mode_matches_int8_oracle_bitwise():
    data = random_net(24, [48, 16, 4], seed=0,
                      activations=[ACT_RELU2, ACT_RELU2, ACT_IDENTITY])
    net = NetTPU(data, compute_dtype="int8")
    x = np.random.default_rng(1).normal(size=(8, 24)).astype(np.float32)
    out = net.forward_batch(x)
    qp = quantized.quantize_mlp(data)
    ref = quantized.mlp_forward_int8_numpy(qp, x)
    np.testing.assert_array_equal(out, ref)


def test_int8_mode_close_to_f32_and_perf_counter():
    data = random_net(16, [32, 4], seed=2,
                      activations=[ACT_RELU2, ACT_IDENTITY])
    f32 = NetTPU(data)
    q = NetTPU(data, compute_dtype="int8")
    x = np.random.default_rng(3).normal(size=(16,)).astype(np.float32)
    a = f32.launch_forward(x)
    b = q.launch_forward(x)
    assert q.get_forward_performance() > 0
    scale = np.abs(a).max() + 1e-9
    assert np.abs(a - b).max() / scale < 0.1


def test_rejects_unknown_dtype():
    import pytest
    data = random_net(4, [2], seed=0)
    with pytest.raises(ValueError):
        NetTPU(data, compute_dtype="fp8")


def test_int8_mode_requantizes_after_training():
    data = random_net(8, [16, 2], seed=4,
                      activations=[ACT_RELU2, ACT_IDENTITY])
    net = NetTPU(data, compute_dtype="int8")
    x = np.ones((4, 8), np.float32)
    before = net.forward_batch(x)
    from vit_fpga_tpu.defines import NetSets
    rng = np.random.default_rng(5)
    net.init_gradient(NetSets(rng.normal(size=(32, 8)).astype(np.float32),
                              rng.normal(size=(32, 2)).astype(np.float32)))
    net.launch_gradient(10, 1e-9, 0.05)
    after = net.forward_batch(x)
    assert not np.allclose(before, after), \
        "int8 forward must reflect trained weights"
    # and it must still match a fresh quantization of the trained net
    qp = quantized.quantize_mlp(net.get_net_data())
    ref = quantized.mlp_forward_int8_numpy(qp, x)
    np.testing.assert_array_equal(after, ref)
