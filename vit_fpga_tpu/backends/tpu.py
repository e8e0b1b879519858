"""NetTPU — the JAX/XLA/Pallas execution backend (``fpga::net_fpga`` reborn).

Maps the reference's host runtime (src/netFPGA.cpp) onto the TPU-native
stack:

  * lazy ``_init_program``/``_init_kernel``  -> jit-compile on first call,
    cached process-wide in :class:`~vit_fpga_tpu.runtime.engine.Engine`
  * ``_load_params`` residency check        -> version-keyed
    :class:`ParamStore` (device_put once; restage only on mutation)
  * event-chained write->task->read          -> JAX async dispatch
  * µs ``PERFORMANCE`` counters              -> :class:`PerfTimer` around
    ``block_until_ready``
  * 24-slot image ring                       -> :class:`StreamingRing` over
    async-dispatched Pallas/XLA filter kernels
  * stubbed training (src/netFPGA.cpp:518-580) -> real jitted SGD with
    early stop, semantics matched to the NumPy oracle

Weights live as ``(fan_in, fan_out)`` matrices (transposed from the
reference's [neuron][input] rows) so the forward is ``x @ W + b`` — the
MXU-friendly orientation.
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import activations as act
from ..abstract import NetAbstract
from ..defines import DATA_TYPE, RING_DEPTH, ImageSet, NetData, NetSets
from ..ops.image_filter import filter_image_device
from ..runtime.engine import Engine
from ..runtime.perf import PerfTimer
from ..runtime.pipeline import StreamingRing

_uid = itertools.count()


def _forward_fn(params, x, *, acts: Tuple[int, ...], compute_dtype):
    """Dense forward over layer list [(W, b), ...]; unrolled at trace time
    (static layer count, like the reference's single fused device task,
    src/netFPGA.cpp:275).

    In float32 mode the MXU is forced to full precision (TPU f32 matmuls
    otherwise default to bf16 passes) so the device path is parity-exact
    with the CPU oracle; bf16 mode takes the fast single-pass MXU route.
    """
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32 else None)
    h = x.astype(compute_dtype)
    for (w, b), code in zip(params, acts):
        h = jnp.matmul(h, w.astype(compute_dtype), precision=precision)
        h = h + b.astype(compute_dtype)
        h = act.apply_jnp(code, h)
    return h.astype(jnp.float32)


def _loss_fn(params, X, Y, *, acts, compute_dtype):
    out = _forward_fn(params, X, acts=acts, compute_dtype=compute_dtype)
    d = out - Y
    return jnp.mean(d * d)


def _sgd_scan(params, X, Y, *, acts, compute_dtype, iterations: int,
              error_threshold: float, multiplier: float):
    """``iterations`` SGD steps with early stop; returns (params, errors).

    Matches NetCPU semantics: the triggering loss is recorded, later slots
    stay 0, parameters freeze once the threshold is crossed.
    """
    grad_fn = jax.value_and_grad(
        partial(_loss_fn, acts=acts, compute_dtype=compute_dtype))

    def step(carry, _):
        params, done = carry
        loss, grads = grad_fn(params, X, Y)
        new_params = jax.tree_util.tree_map(
            lambda p, g: p - multiplier * g, params, grads)
        params = jax.tree_util.tree_map(
            lambda old, new: jnp.where(done, old, new), params, new_params)
        err = jnp.where(done, 0.0, loss)
        done = jnp.logical_or(done, loss < error_threshold)
        return (params, done), err

    (params, _), errs = jax.lax.scan(
        step, (params, jnp.asarray(False)), None, length=iterations)
    return params, errs


class NetTPU(NetAbstract):
    """Dense-network backend running on the default JAX device."""

    def __init__(self, data: NetData, derivate: bool = False,
                 random: bool = False, seed: int = 0,
                 compute_dtype: str = "float32",
                 ring_depth: int = RING_DEPTH,
                 image_filter: str = "sharpen",
                 use_pallas_filter: bool = True):
        data.validate()
        if random:
            from ..defines import random_net
            data = random_net(data.n_ins, data.n_p_l, seed=seed,
                              activations=data.activations)
        self._n_ins = data.n_ins
        self._n_p_l = list(data.n_p_l)
        self._acts = tuple(int(a) for a in data.activations)
        # Host master copy, (fan_in, fan_out)-transposed for x @ W.
        self._host_params: List[Tuple[np.ndarray, np.ndarray]] = [
            (np.ascontiguousarray(w.T, dtype=DATA_TYPE),
             np.asarray(b, dtype=DATA_TYPE))
            for w, b in zip(data.params, data.bias)]
        if compute_dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"unknown compute_dtype {compute_dtype!r}")
        self._compute_mode = compute_dtype
        self._dtype = jnp.bfloat16 if compute_dtype == "bfloat16" \
            else jnp.float32
        self._qparams_dev = None  # int8 mode: device quantized params
        self._key = ("net_tpu", next(_uid))
        self._version = 0
        self._device_params = None   # set after training (device master)
        self._sets: Optional[NetSets] = None
        self.forward_performance = 0
        self.gradient_performance = 0
        self._ring: StreamingRing[jax.Array, ImageSet] = StreamingRing(
            ring_depth)
        self._filter = image_filter
        self._use_pallas_filter = use_pallas_filter
        self._engine = Engine.get()

    # -- parameter residency (≙ _load_params, src/netFPGA.cpp:484-515) ------

    def _params_on_device(self):
        if self._device_params is not None:
            return self._device_params
        return self._engine.params.get(
            self._key, self._version,
            lambda: jax.device_put(
                [(jnp.asarray(w), jnp.asarray(b))
                 for w, b in self._host_params]))

    def _compiled_forward(self):
        key = ("dense_fwd", self._acts, self._dtype.__name__)
        return self._engine.compiled(
            key, lambda: jax.jit(partial(
                _forward_fn, acts=self._acts, compute_dtype=self._dtype)))

    # -- inference ------------------------------------------------------------

    def forward_batch(self, inputs: np.ndarray) -> np.ndarray:
        x = jnp.asarray(inputs, dtype=jnp.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]
        if x.shape[1] != self._n_ins:
            raise ValueError(f"input dim {x.shape[1]} != n_ins {self._n_ins}")
        if self._compute_mode == "int8":
            out = self._forward_int8(x)
        else:
            out = self._compiled_forward()(self._params_on_device(), x)
        out = np.asarray(out)
        return out[0] if squeeze else out

    def _forward_int8(self, x: jax.Array) -> jax.Array:
        """Quantized datapath (≙ the reference's fixed-point mode):
        weights quantized once per version, dynamic per-tensor activation
        quantization, int32 MXU accumulation."""
        from ..models import quantized
        if self._qparams_dev is None:
            self._sync_host_params()
            qp = quantized.quantize_mlp(self.get_net_data())
            self._qparams_dev = (jax.device_put(
                quantized.device_qparams(qp)), qp["acts"])
        dev, acts = self._qparams_dev
        key = ("dense_int8_fwd", acts)
        fn = self._engine.compiled(
            key, lambda: jax.jit(partial(quantized.mlp_forward_int8,
                                         acts=acts)))
        return fn(dev, x)

    def launch_forward(self, inputs: np.ndarray) -> np.ndarray:
        with PerfTimer() as t:
            out = self.forward_batch(np.asarray(inputs))
        self.forward_performance = t.us
        return out

    # -- training -------------------------------------------------------------

    def init_gradient(self, sets: NetSets) -> None:
        self._sets = sets

    def launch_gradient(self, iterations: int, error_threshold: float,
                        multiplier: float) -> np.ndarray:
        if self._sets is None:
            raise RuntimeError("init_gradient must be called first")
        key = ("dense_sgd", self._acts, self._dtype.__name__, int(iterations))
        step = self._engine.compiled(
            key, lambda: jax.jit(
                partial(_sgd_scan, acts=self._acts,
                        compute_dtype=self._dtype,
                        iterations=int(iterations)),
                static_argnames=()))
        with PerfTimer() as t:
            params, errs = step(
                self._params_on_device(),
                jnp.asarray(self._sets.set_ins),
                jnp.asarray(self._sets.set_outs),
                error_threshold=jnp.float32(error_threshold),
                multiplier=jnp.float32(multiplier))
            errs = np.asarray(errs, dtype=DATA_TYPE)
        self.gradient_performance = t.us
        # Device copy becomes the master; host copy refreshed lazily; any
        # quantized snapshot is stale now (re-quantized on next int8 use).
        self._device_params = params
        self._version += 1
        self._qparams_dev = None
        self._engine.params.evict(self._key)
        return errs

    def _sync_host_params(self) -> None:
        if self._device_params is not None:
            self._host_params = [
                (np.asarray(w), np.asarray(b))
                for w, b in self._device_params]

    # -- export / debug / perf -------------------------------------------------

    def get_net_data(self) -> NetData:
        self._sync_host_params()
        return NetData(
            n_ins=self._n_ins, n_layers=len(self._n_p_l),
            n_p_l=list(self._n_p_l),
            params=[np.ascontiguousarray(w.T) for w, _ in self._host_params],
            bias=[np.array(b) for _, b in self._host_params],
            activations=list(self._acts)).validate()

    def print_inner_vals(self) -> None:
        self._sync_host_params()
        for l, (w, b) in enumerate(self._host_params):
            print(f"layer {l}: W{tuple(w.shape)} mean={w.mean():.6f} "
                  f"b{tuple(b.shape)} mean={b.mean():.6f} "
                  f"act={self._acts[l]}")

    def get_gradient_performance(self) -> int:
        return self.gradient_performance

    def get_forward_performance(self) -> int:
        return self.forward_performance

    # -- streaming image path ---------------------------------------------------

    def filter_image(self, image: ImageSet) -> None:
        h, w = image.original_h, image.original_w
        img = image.resized_image_data.reshape(h, w)
        meta = ImageSet(np.zeros((0,), np.uint8),
                        original_x_pos=image.original_x_pos,
                        original_y_pos=image.original_y_pos,
                        original_h=h, original_w=w)
        self._ring.try_submit(
            lambda: filter_image_device(jnp.asarray(img), self._filter,
                                        use_pallas=self._use_pallas_filter),
            meta)

    def get_filtered_image(self) -> ImageSet:
        got = self._ring.try_retrieve()
        if got is None:
            return ImageSet.empty_image()
        result, meta = got
        meta.resized_image_data = np.asarray(result).reshape(-1)
        return meta
