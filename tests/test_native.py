"""Conformance tests: the native C++ runtime vs the Python oracle,
through the ctypes C FFI."""

import os
import subprocess

import numpy as np
import pytest

from vit_fpga_tpu.backends.cpu import NetCPU
from vit_fpga_tpu.defines import (ACT_IDENTITY, ACT_RELU2, ImageSet,
                                  NetSets, random_net)
from vit_fpga_tpu.ops.image_filter import filter_image_numpy

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "native", "build", "libnet_tpu.so")


def _ensure_lib():
    if os.path.exists(LIB):
        return True
    try:
        subprocess.run(["cmake", "-S", os.path.join(REPO, "native"), "-B",
                        os.path.join(REPO, "native", "build"), "-G",
                        "Ninja"], check=True, capture_output=True)
        subprocess.run(["ninja", "-C", os.path.join(REPO, "native",
                                                    "build")],
                       check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        return False
    return os.path.exists(LIB)


pytestmark = pytest.mark.skipif(not _ensure_lib(),
                                reason="native library unavailable")


def _ffi(data, **kw):
    from vit_fpga_tpu.native import NetNativeFFI
    return NetNativeFFI(data, **kw)


def test_forward_matches_oracle():
    data = random_net(32, [64, 16, 4], seed=0)
    native = _ffi(data)
    oracle = NetCPU(data)
    x = np.random.default_rng(1).normal(size=(32,)).astype(np.float32)
    np.testing.assert_allclose(native.launch_forward(x),
                               oracle.launch_forward(x),
                               rtol=1e-5, atol=1e-6)
    assert native.get_forward_performance() >= 0


def test_export_roundtrip_exact():
    data = random_net(8, [12, 3], seed=2)
    native = _ffi(data)
    back = native.get_net_data()
    for a, b in zip(back.params, data.params):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(back.bias, data.bias):
        np.testing.assert_array_equal(a, b)


def test_training_matches_oracle_trajectory():
    data = random_net(6, [12, 3], seed=3,
                      activations=[ACT_RELU2, ACT_IDENTITY])
    rng = np.random.default_rng(4)
    X = rng.normal(size=(32, 6)).astype(np.float32)
    Y = rng.normal(size=(32, 3)).astype(np.float32)
    sets = NetSets(X, Y)
    native, oracle = _ffi(data), NetCPU(data)
    native.init_gradient(sets)
    oracle.init_gradient(sets)
    e_native = native.launch_gradient(20, 1e-9, 0.02)
    e_oracle = oracle.launch_gradient(20, 1e-9, 0.02)
    np.testing.assert_allclose(e_native, e_oracle, rtol=2e-3, atol=1e-6)
    assert native.get_gradient_performance() > 0


def test_ring_fifo_drop_empty_and_filter_parity():
    data = random_net(4, [2], seed=5)
    native = _ffi(data, ring_depth=2, image_filter="sharpen")
    # empty
    assert native.get_filtered_image(8, 8).empty
    rng = np.random.default_rng(6)
    frames = [rng.integers(0, 256, (8, 8), np.uint8) for _ in range(3)]
    for i, f in enumerate(frames):
        native.filter_image(ImageSet(f, original_h=8, original_w=8,
                                     original_x_pos=i))
    a = native.get_filtered_image(8, 8)
    b = native.get_filtered_image(8, 8)
    assert a.original_x_pos == 0 and b.original_x_pos == 1
    np.testing.assert_array_equal(
        a.resized_image_data.reshape(8, 8),
        filter_image_numpy(frames[0], "sharpen"))
    # third frame was dropped (depth 2)
    assert native.get_filtered_image(8, 8).empty


def test_error_paths():
    data = random_net(4, [2], seed=7)
    native = _ffi(data)
    with pytest.raises(RuntimeError):
        native.launch_gradient(5, 1e-6, 0.1)  # init_gradient not called
    with pytest.raises(RuntimeError):
        # wrong input size reaches the C++ check
        native.launch_forward(np.zeros(3, np.float32))


def test_random_init_reproducible():
    data = random_net(4, [8, 2], seed=0)
    a = _ffi(data, random=True, seed=9)
    b = _ffi(data, random=True, seed=9)
    x = np.ones(4, np.float32)
    np.testing.assert_array_equal(a.launch_forward(x),
                                  b.launch_forward(x))


def test_vit_through_c_api():
    """ViT-Tiny through the native C API (BASELINE config 1 shape):
    raw uint8 image in -> logits out, via ctypes -> C++ -> bridge."""
    import ctypes
    from vit_fpga_tpu.native import load_library
    lib = load_library()
    lib.vft_vit_create.restype = ctypes.c_void_p
    lib.vft_vit_create.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_uint,
        ctypes.c_char_p, ctypes.c_char_p]
    lib.vft_vit_forward.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ctypes.c_size_t, ctypes.c_size_t, ctypes.POINTER(ctypes.c_float),
        ctypes.c_size_t]
    lib.vft_vit_destroy.argtypes = [ctypes.c_void_p]

    h = lib.vft_vit_create(b"vit_ti16", 224, 10, 0, b"float32", None)
    assert h, lib.vft_last_error().decode()
    img = np.random.default_rng(0).integers(
        0, 256, (1, 224, 224, 3), np.uint8)
    logits = np.zeros(10, np.float32)
    rc = lib.vft_vit_forward(
        h, img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 1, 224,
        224, logits.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 10)
    assert rc == 0, lib.vft_last_error().decode()
    assert np.all(np.isfinite(logits)) and np.any(logits != 0)

    # parity vs the Python model with the same seed
    import jax
    from vit_fpga_tpu.models import vit
    cfg = vit.config("vit_ti16", image_size=224, num_classes=10,
                     dtype="float32")
    params = vit.init_params(jax.random.key(0), cfg)
    import jax.numpy as jnp
    want = np.asarray(vit.forward_raw(params, jnp.asarray(img), cfg))[0]
    np.testing.assert_allclose(logits, want, rtol=1e-4, atol=1e-4)
    lib.vft_vit_destroy(h)
