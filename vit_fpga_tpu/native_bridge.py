"""Python side of the embedded-interpreter bridge for the native runtime.

The C++ ``NetTpu`` backend (native/src/net_tpu_embed.cc) embeds CPython and
drives the JAX runtime through THIS module only — a deliberately narrow,
bytes-in/bytes-out surface so the C++ side needs nothing beyond the stable
CPython ABI (no numpy C API, no pybind11).  Handles are integers into a
process-global registry of :class:`NetTPU` instances.

This is the TPU-native analogue of the reference's host->device dispatch
boundary: where ``net_fpga`` marshalled flat arrays into OpenCL buffers
(src/netFPGA.cpp:484-515), the native shim marshals them across the
embedded interpreter into device arrays.
"""

from __future__ import annotations

import threading
from typing import Dict, Tuple

import numpy as np

from .backends.tpu import NetTPU
from .defines import ImageSet, NetSets, unflatten_net

_registry: Dict[int, NetTPU] = {}
_next_id = 0
_lock = threading.Lock()


def create(n_ins: int, npl_bytes: bytes, params_bytes: bytes,
           bias_bytes: bytes, acts_bytes: bytes, random_init: int,
           seed: int, ring_depth: int, filter_name: str) -> int:
    global _next_id
    n_p_l = np.frombuffer(npl_bytes, dtype=np.int32)
    acts = np.frombuffer(acts_bytes, dtype=np.int32)
    if random_init:
        from .defines import random_net
        data = random_net(n_ins, n_p_l.tolist(), seed=seed,
                          activations=acts.tolist())
    else:
        params = np.frombuffer(params_bytes, dtype=np.float32)
        bias = np.frombuffer(bias_bytes, dtype=np.float32)
        data = unflatten_net(n_ins, n_p_l.tolist(), params, bias,
                             activations=acts.tolist())
    net = NetTPU(data, ring_depth=ring_depth, image_filter=filter_name)
    with _lock:
        _next_id += 1
        handle = _next_id
        _registry[handle] = net
    return handle


def destroy(handle: int) -> None:
    with _lock:
        _registry.pop(handle, None)


def _net(handle: int) -> NetTPU:
    net = _registry.get(handle)
    if net is None:
        raise KeyError(f"invalid native handle {handle}")
    return net


def n_outs(handle: int) -> int:
    return int(_net(handle)._n_p_l[-1])


def forward(handle: int, in_bytes: bytes) -> bytes:
    net = _net(handle)
    x = np.frombuffer(in_bytes, dtype=np.float32)
    out = net.launch_forward(x)
    return np.ascontiguousarray(out, dtype=np.float32).tobytes()


def get_net_data(handle: int) -> Tuple[bytes, bytes]:
    from .defines import flatten_net
    data = _net(handle).get_net_data()
    params, bias, _ = flatten_net(data)
    return params.tobytes(), bias.tobytes()


def init_gradient(handle: int, ins_bytes: bytes, outs_bytes: bytes,
                  n_sets: int, n_out: int) -> None:
    net = _net(handle)
    X = np.frombuffer(ins_bytes, dtype=np.float32).reshape(n_sets, -1)
    Y = np.frombuffer(outs_bytes, dtype=np.float32).reshape(n_sets, n_out)
    net.init_gradient(NetSets(X, Y))


def launch_gradient(handle: int, iterations: int, threshold: float,
                    multiplier: float) -> bytes:
    errs = _net(handle).launch_gradient(iterations, threshold, multiplier)
    return np.ascontiguousarray(errs, dtype=np.float32).tobytes()


def forward_perf(handle: int) -> int:
    return int(_net(handle).get_forward_performance())


def gradient_perf(handle: int) -> int:
    return int(_net(handle).get_gradient_performance())


def print_inner_vals(handle: int) -> None:
    _net(handle).print_inner_vals()


def filter_image(handle: int, pix_bytes: bytes, h: int, w: int,
                 x_pos: int, y_pos: int) -> int:
    net = _net(handle)
    before = net._ring.dropped
    img = np.frombuffer(pix_bytes, dtype=np.uint8)
    net.filter_image(ImageSet(img, original_x_pos=x_pos,
                              original_y_pos=y_pos, original_h=h,
                              original_w=w))
    return 1 if net._ring.dropped > before else 0


# ---------------------------------------------------------------------------
# ViT model family over the FFI (BASELINE config 1: ViT through the
# preserved native API).
# ---------------------------------------------------------------------------

_vit_registry: Dict[int, tuple] = {}


def vit_create(variant: str, image_size: int, num_classes: int,
               seed: int, dtype: str, weights_npz: str) -> int:
    global _next_id
    import jax
    from .models import vit
    cfg = vit.config(variant, image_size=image_size,
                     num_classes=num_classes, dtype=dtype)
    if weights_npz:
        from .utils.checkpoint import load_params
        params = load_params(weights_npz)
    else:
        params = vit.init_params(jax.random.key(seed), cfg)
    params = jax.device_put(params)
    fwd = vit.jit_forward(cfg, raw=True)
    with _lock:
        _next_id += 1
        handle = _next_id
        _vit_registry[handle] = (cfg, params, fwd)
    return handle


def vit_forward(handle: int, pixels: bytes, batch: int, h: int,
                w: int) -> bytes:
    import jax.numpy as jnp
    cfg, params, fwd = _vit_registry[handle]
    imgs = np.frombuffer(pixels, dtype=np.uint8).reshape(batch, h, w, 3)
    logits = fwd(params, jnp.asarray(imgs))
    return np.ascontiguousarray(logits, dtype=np.float32).tobytes()


def vit_num_classes(handle: int) -> int:
    return int(_vit_registry[handle][0].num_classes)


def vit_destroy(handle: int) -> None:
    with _lock:
        _vit_registry.pop(handle, None)


def get_filtered_image(handle: int) -> Tuple[int, bytes, int, int, int, int]:
    out = _net(handle).get_filtered_image()
    if out.empty:
        return 1, b"", 0, 0, 0, 0
    return (0, out.resized_image_data.tobytes(),
            int(out.original_h), int(out.original_w),
            int(out.original_x_pos), int(out.original_y_pos))
