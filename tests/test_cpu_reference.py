"""CPU oracle tests: forward math, export round-trip, training, ring."""

import numpy as np

from vit_fpga_tpu.backends.cpu import NetCPU
from vit_fpga_tpu.defines import (ACT_IDENTITY, ACT_RELU2, ImageSet, NetData,
                                  NetSets, random_net)
from vit_fpga_tpu.ops.image_filter import FILTERS, filter_image_numpy


def _tiny_net():
    w0 = np.array([[1.0, -1.0], [0.5, 0.5]], np.float32)
    w1 = np.array([[2.0, -1.0]], np.float32)
    return NetData(n_ins=2, n_layers=2, n_p_l=[2, 1], params=[w0, w1],
                   bias=[np.array([0.0, 1.0], np.float32),
                         np.array([-0.5], np.float32)],
                   activations=[ACT_RELU2, ACT_IDENTITY])


def test_forward_hand_computed():
    net = NetCPU(_tiny_net())
    x = np.array([2.0, 1.0], np.float32)
    # layer0: [2*1+1*-1, 2*.5+1*.5+1] = [1, 2.5] -> relu same
    # layer1: 2*1 - 2.5 - 0.5 = -1.0 (identity)
    out = net.launch_forward(x)
    np.testing.assert_allclose(out, [-1.0], rtol=1e-6)
    assert net.get_forward_performance() >= 0


def test_forward_batch_matches_single():
    net = NetCPU(random_net(16, [32, 8], seed=7))
    xb = np.random.default_rng(0).normal(size=(5, 16)).astype(np.float32)
    batch = net.forward_batch(xb)
    for i in range(5):
        # batch GEMM vs single GEMV accumulate in different orders
        np.testing.assert_allclose(net.launch_forward(xb[i]), batch[i],
                                   rtol=1e-4, atol=1e-5)


def test_get_net_data_roundtrip():
    # The reference's exporter is broken (src/netFPGA.cpp:206-237); ours
    # must round-trip exactly.
    net = NetCPU(random_net(8, [16, 4], seed=2))
    clone = NetCPU(net.get_net_data())
    x = np.random.default_rng(1).normal(size=(8,)).astype(np.float32)
    np.testing.assert_array_equal(net.launch_forward(x),
                                  clone.launch_forward(x))


def test_training_reduces_loss():
    # Learn y = relu(x) mapping through a small net: loss must decrease.
    rng = np.random.default_rng(0)
    X = rng.normal(size=(64, 4)).astype(np.float32)
    Y = (X @ rng.normal(size=(4, 2)).astype(np.float32))
    net = NetCPU(random_net(4, [16, 2], seed=5,
                            activations=[ACT_RELU2, ACT_IDENTITY]))
    net.init_gradient(NetSets(X, Y))
    errs = net.launch_gradient(200, error_threshold=1e-6, multiplier=0.05)
    nz = errs[errs > 0]
    assert nz[-1] < nz[0] * 0.5, f"loss did not halve: {nz[0]} -> {nz[-1]}"
    assert net.get_gradient_performance() > 0


def test_gradients_match_finite_differences():
    net = NetCPU(random_net(3, [4, 2], seed=9,
                            activations=[ACT_RELU2, ACT_IDENTITY]))
    rng = np.random.default_rng(3)
    X = rng.normal(size=(8, 3)).astype(np.float32)
    Y = rng.normal(size=(8, 2)).astype(np.float32)
    loss0, gw, gb = net._loss_and_grads(X, Y)
    eps = 1e-3
    for l in [0, 1]:
        i, j = 1, 0
        net._data.params[l][i, j] += eps
        lp, _, _ = net._loss_and_grads(X, Y)
        net._data.params[l][i, j] -= 2 * eps
        lm, _, _ = net._loss_and_grads(X, Y)
        net._data.params[l][i, j] += eps
        fd = (lp - lm) / (2 * eps)
        np.testing.assert_allclose(gw[l][i, j], fd, rtol=5e-2, atol=1e-4)


def test_ring_semantics_fifo_drop_empty(capsys):
    net = NetCPU(_tiny_net(), ring_depth=2, image_filter="identity")
    # empty -> sentinel
    assert net.get_filtered_image().empty
    imgs = [ImageSet(np.full((4, 4), i, np.uint8), original_h=4,
                     original_w=4, original_x_pos=i) for i in range(3)]
    for im in imgs:
        net.filter_image(im)   # third submit drops (ring_depth=2)
    out = capsys.readouterr().out
    assert "ring full" in out
    a = net.get_filtered_image()
    b = net.get_filtered_image()
    assert a.original_x_pos == 0 and b.original_x_pos == 1  # FIFO
    assert net.get_filtered_image().empty  # frame 2 was dropped


def test_identity_filter_preserves_interior():
    img = np.random.default_rng(0).integers(0, 256, (16, 16), np.uint8)
    out = filter_image_numpy(img, "identity")
    np.testing.assert_array_equal(out, img)


def test_blur_filter_bounds():
    img = np.random.default_rng(0).integers(0, 256, (32, 32), np.uint8)
    for name in FILTERS:
        out = filter_image_numpy(img, name)
        assert out.dtype == np.uint8 and out.shape == img.shape
