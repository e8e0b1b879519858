"""Streaming ring semantics on the NetTPU backend + the raw ring."""

import numpy as np

from vit_fpga_tpu.backends.tpu import NetTPU
from vit_fpga_tpu.defines import ImageSet, random_net
from vit_fpga_tpu.ops.image_filter import filter_image_numpy
from vit_fpga_tpu.runtime.pipeline import StreamingRing


def _mk_backend(depth=4, name="identity"):
    return NetTPU(random_net(4, [2]), ring_depth=depth, image_filter=name,
                  use_pallas_filter=False)


def test_ring_overflow_drops(capsys):
    net = _mk_backend(depth=2)
    img = np.zeros((8, 8), np.uint8)
    for i in range(3):
        net.filter_image(ImageSet(img, original_h=8, original_w=8,
                                  original_x_pos=i))
    assert "ring full" in capsys.readouterr().out
    assert net._ring.dropped == 1


def test_ring_underflow_returns_empty(capsys):
    net = _mk_backend()
    out = net.get_filtered_image()
    assert out.empty
    assert "ring empty" in capsys.readouterr().out


def test_fifo_order_and_metadata_passthrough():
    net = _mk_backend(depth=8)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (16, 16), np.uint8) for _ in range(5)]
    for i, f in enumerate(frames):
        net.filter_image(ImageSet(f, original_h=16, original_w=16,
                                  original_x_pos=i, original_y_pos=10 * i))
    for i, f in enumerate(frames):
        got = net.get_filtered_image()
        assert got.original_x_pos == i and got.original_y_pos == 10 * i
        np.testing.assert_array_equal(
            got.resized_image_data.reshape(16, 16),
            filter_image_numpy(f, "identity"))


def test_device_filter_matches_oracle():
    net = _mk_backend(depth=2, name="sharpen")
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 45), np.uint8)  # odd sizes on purpose
    net.filter_image(ImageSet(img, original_h=33, original_w=45))
    got = net.get_filtered_image()
    np.testing.assert_array_equal(got.resized_image_data.reshape(33, 45),
                                  filter_image_numpy(img, "sharpen"))


def test_raw_ring_counters():
    ring = StreamingRing(2)
    assert ring.free == 2
    assert ring.try_submit(lambda: 1, "a")
    assert ring.try_submit(lambda: 2, "b")
    assert not ring.try_submit(lambda: 3, "c")
    assert ring.dropped == 1 and ring.submitted == 2
    assert ring.try_retrieve() == (1, "a")
    assert ring.try_retrieve() == (2, "b")
    assert ring.try_retrieve() is None
    assert ring.free == 2
