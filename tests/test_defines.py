"""Data-model tests: NetData shape rules, flatten/unflatten round-trip."""

import numpy as np
import pytest

from vit_fpga_tpu.defines import (ACT_RELU2, ImageSet, NetData, NetSets,
                                  flatten_net, random_net, unflatten_net)


def test_random_net_shapes():
    net = random_net(5, [7, 3, 2], seed=0)
    assert net.n_ins == 5 and net.n_layers == 3
    assert net.params[0].shape == (7, 5)
    assert net.params[1].shape == (3, 7)
    assert net.params[2].shape == (2, 3)
    assert net.n_neurons == 12
    assert net.n_params == 35 + 21 + 6
    assert all(b.shape == (n,) for b, n in zip(net.bias, net.n_p_l))
    assert net.params[0].min() >= -1.0 and net.params[0].max() < 1.0


def test_flatten_unflatten_roundtrip():
    net = random_net(4, [6, 5, 2], seed=3)
    pf, bf, npl = flatten_net(net)
    assert pf.shape == (net.n_params,)
    assert bf.shape == (net.n_neurons,)
    back = unflatten_net(4, npl, pf, bf, activations=net.activations)
    for a, b in zip(net.params, back.params):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(net.bias, back.bias):
        np.testing.assert_array_equal(a, b)


def test_flat_layout_is_layer_neuron_input():
    # Row-major [layer][neuron][input] like the reference's flatten
    # (src/netFPGA.cpp:94-106).
    w0 = np.arange(6, dtype=np.float32).reshape(3, 2)   # 3 neurons, 2 ins
    w1 = np.arange(6, 9, dtype=np.float32).reshape(1, 3)
    net = NetData(n_ins=2, n_layers=2, n_p_l=[3, 1], params=[w0, w1],
                  bias=[np.zeros(3, np.float32), np.zeros(1, np.float32)],
                  activations=[ACT_RELU2, ACT_RELU2])
    pf, _, _ = flatten_net(net)
    np.testing.assert_array_equal(pf, np.arange(9, dtype=np.float32))


def test_validate_rejects_bad_shapes():
    net = random_net(4, [3, 2])
    net.params[1] = np.zeros((2, 5), np.float32)  # fan_in should be 3
    with pytest.raises(ValueError):
        net.validate()


def test_net_sets_checks():
    s = NetSets(np.zeros((4, 3)), np.zeros((4, 2)))
    assert s.n_sets == 4
    with pytest.raises(ValueError):
        NetSets(np.zeros((4, 3)), np.zeros((5, 2)))


def test_image_set_empty_sentinel():
    e = ImageSet.empty_image()
    assert e.empty
    img = ImageSet(np.zeros((8, 8), np.uint8), original_h=8, original_w=8)
    assert not img.empty
    assert img.resized_image_data.shape == (64,)
