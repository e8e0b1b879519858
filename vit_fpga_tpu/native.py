"""ctypes binding over the native C FFI (libnet_tpu.so).

Gives Python callers the same ``NetAbstract`` surface backed by the C++
runtime (``NetNative`` compute, native async ring) — and is the conformance
harness proving the C API matches the Python backends.  Build the library
with::

    cmake -S native -B native/build -G Ninja && ninja -C native/build
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from .abstract import NetAbstract
from .defines import (RING_DEPTH, ImageSet, NetData, NetSets, flatten_net,
                      unflatten_net)

BACKEND_NATIVE = 0
BACKEND_TPU = 1

_FILTER_CODES = {"sharpen": 0, "blur": 1, "edge": 2, "identity": 3}

_lib: Optional[ctypes.CDLL] = None


def _default_lib_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(here, "native", "build", "libnet_tpu.so")


def load_library(path: Optional[str] = None) -> ctypes.CDLL:
    """Load (and memoize) the native library, declaring prototypes."""
    global _lib
    if _lib is not None and path is None:
        return _lib
    lib = ctypes.CDLL(path or _default_lib_path())

    c = ctypes
    lib.vft_create.restype = c.c_void_p
    lib.vft_create.argtypes = [
        c.c_size_t, c.c_size_t, c.POINTER(c.c_int32), c.POINTER(c.c_float),
        c.POINTER(c.c_float), c.POINTER(c.c_int32), c.c_int, c.c_int,
        c.c_uint, c.c_size_t, c.c_int]
    lib.vft_destroy.argtypes = [c.c_void_p]
    for name in ("vft_n_ins", "vft_n_outs", "vft_n_params",
                 "vft_n_neurons"):
        fn = getattr(lib, name)
        fn.restype = c.c_size_t
        fn.argtypes = [c.c_void_p]
    lib.vft_launch_forward.argtypes = [
        c.c_void_p, c.POINTER(c.c_float), c.c_size_t, c.POINTER(c.c_float),
        c.c_size_t]
    lib.vft_get_net_data.argtypes = [c.c_void_p, c.POINTER(c.c_float),
                                     c.POINTER(c.c_float)]
    lib.vft_init_gradient.argtypes = [
        c.c_void_p, c.POINTER(c.c_float), c.POINTER(c.c_float), c.c_size_t,
        c.c_size_t]
    lib.vft_launch_gradient.argtypes = [
        c.c_void_p, c.c_size_t, c.c_float, c.c_float, c.POINTER(c.c_float)]
    lib.vft_get_forward_performance.restype = c.c_int64
    lib.vft_get_forward_performance.argtypes = [c.c_void_p]
    lib.vft_get_gradient_performance.restype = c.c_int64
    lib.vft_get_gradient_performance.argtypes = [c.c_void_p]
    lib.vft_print_inner_vals.argtypes = [c.c_void_p]
    lib.vft_filter_image.argtypes = [
        c.c_void_p, c.POINTER(c.c_uint8), c.c_size_t, c.c_size_t,
        c.c_int64, c.c_int64]
    lib.vft_get_filtered_image.argtypes = [
        c.c_void_p, c.POINTER(c.c_uint8), c.c_size_t, c.c_size_t,
        c.POINTER(c.c_int64), c.POINTER(c.c_int64)]
    lib.vft_last_error.restype = c.c_char_p
    lib.vft_version.restype = c.c_char_p
    if path is None:
        _lib = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NetNativeFFI(NetAbstract):
    """NetAbstract over the native C API."""

    def __init__(self, data: NetData, backend: int = BACKEND_NATIVE,
                 random: bool = False, seed: int = 0,
                 ring_depth: int = RING_DEPTH,
                 image_filter: str = "sharpen",
                 lib_path: Optional[str] = None):
        self._lib = load_library(lib_path)
        data.validate()
        params, bias, n_p_l = flatten_net(data)
        self._n_ins = data.n_ins
        self._n_p_l = [int(x) for x in n_p_l]
        self._acts = np.asarray(data.activations, dtype=np.int32)
        params = np.ascontiguousarray(params, np.float32)
        bias = np.ascontiguousarray(bias, np.float32)
        npl = np.ascontiguousarray(n_p_l, np.int32)
        handle = self._lib.vft_create(
            data.n_ins, len(self._n_p_l),
            npl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            _fptr(params), _fptr(bias),
            self._acts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            backend, 1 if random else 0, seed, ring_depth,
            _FILTER_CODES[image_filter])
        if not handle:
            raise RuntimeError(
                f"vft_create failed: {self._last_error()}")
        self._h = handle
        self._n_out = self._n_p_l[-1]

    def _last_error(self) -> str:
        return self._lib.vft_last_error().decode()

    def _check(self, rc: int, what: str):
        if rc < 0:
            raise RuntimeError(f"{what} failed: {self._last_error()}")
        return rc

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.vft_destroy(self._h)
                self._h = None
        except Exception:
            pass

    # -- NetAbstract ----------------------------------------------------------

    def get_net_data(self) -> NetData:
        n_params = self._lib.vft_n_params(self._h)
        n_neurons = self._lib.vft_n_neurons(self._h)
        params = np.zeros(n_params, np.float32)
        bias = np.zeros(n_neurons, np.float32)
        self._check(self._lib.vft_get_net_data(self._h, _fptr(params),
                                               _fptr(bias)),
                    "vft_get_net_data")
        return unflatten_net(self._n_ins, self._n_p_l, params, bias,
                             activations=self._acts.tolist())

    def launch_forward(self, inputs: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(inputs, np.float32).reshape(-1)
        out = np.zeros(self._n_out, np.float32)
        self._check(self._lib.vft_launch_forward(
            self._h, _fptr(x), x.size, _fptr(out), out.size),
            "vft_launch_forward")
        return out

    def init_gradient(self, sets: NetSets) -> None:
        X = np.ascontiguousarray(sets.set_ins, np.float32)
        Y = np.ascontiguousarray(sets.set_outs, np.float32)
        self._check(self._lib.vft_init_gradient(
            self._h, _fptr(X), _fptr(Y), X.shape[0], Y.shape[1]),
            "vft_init_gradient")

    def launch_gradient(self, iterations: int, error_threshold: float,
                        multiplier: float) -> np.ndarray:
        errs = np.zeros(iterations, np.float32)
        self._check(self._lib.vft_launch_gradient(
            self._h, iterations, error_threshold, multiplier, _fptr(errs)),
            "vft_launch_gradient")
        return errs

    def print_inner_vals(self) -> None:
        self._check(self._lib.vft_print_inner_vals(self._h),
                    "vft_print_inner_vals")

    def get_gradient_performance(self) -> int:
        return int(self._lib.vft_get_gradient_performance(self._h))

    def get_forward_performance(self) -> int:
        return int(self._lib.vft_get_forward_performance(self._h))

    def filter_image(self, image: ImageSet) -> None:
        pix = np.ascontiguousarray(image.resized_image_data, np.uint8)
        self._check(self._lib.vft_filter_image(
            self._h, pix.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            image.original_h, image.original_w, image.original_x_pos,
            image.original_y_pos), "vft_filter_image")

    def get_filtered_image(self, h: int | None = None,
                           w: int | None = None) -> ImageSet:
        # The C API is caller-allocates; default to the reference frame
        # geometry unless told otherwise.
        from .defines import IMAGE_HEIGHT, IMAGE_WIDTH
        h = h or IMAGE_HEIGHT
        w = w or IMAGE_WIDTH
        out = np.zeros(h * w, np.uint8)
        x = ctypes.c_int64(0)
        y = ctypes.c_int64(0)
        rc = self._check(self._lib.vft_get_filtered_image(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, ctypes.byref(x), ctypes.byref(y)),
            "vft_get_filtered_image")
        if rc == 1:
            return ImageSet.empty_image()
        return ImageSet(out, original_h=h, original_w=w,
                        original_x_pos=int(x.value),
                        original_y_pos=int(y.value))
