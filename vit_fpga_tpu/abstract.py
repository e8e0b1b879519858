"""Backend-agnostic network interface.

TPU-native equivalent of the reference's pure-virtual ``net::net_abstract``
(include/netAbstract.h:8-21): the same nine-method contract — inference,
training, debug introspection, perf counters, and the streaming image path —
expressed as a Python ABC.  Backends: :class:`~vit_fpga_tpu.backends.cpu.NetCPU`
(the NumPy parity oracle, the role the CPU path plays in BASELINE config 1)
and :class:`~vit_fpga_tpu.backends.tpu.NetTPU` (the JAX/XLA/Pallas engine,
the rebirth of ``fpga::net_fpga``).  A C++ mirror of this interface with a C
FFI lives in ``native/`` so existing native callers of the reference keep a
drop-in surface.
"""

from __future__ import annotations

import abc
from typing import List

import numpy as np

from .defines import ImageSet, NetData, NetSets


class NetAbstract(abc.ABC):
    """Mirror of ``net::net_abstract`` (include/netAbstract.h:8-21)."""

    @abc.abstractmethod
    def get_net_data(self) -> NetData:
        """Export the current weights as a :class:`NetData`.

        Unlike the reference's broken exporter (src/netFPGA.cpp:206-237),
        this must round-trip: ``Backend(get_net_data()).launch_forward(x)``
        is bit-identical to ``self.launch_forward(x)``.
        """

    @abc.abstractmethod
    def launch_forward(self, inputs: np.ndarray) -> np.ndarray:
        """Run one forward pass over ``inputs`` (shape ``(n_ins,)``) and
        return the output activations (reference src/netFPGA.cpp:239-290)."""

    @abc.abstractmethod
    def init_gradient(self, sets: NetSets) -> None:
        """Stage a training set.  The reference stubs this out
        (src/netFPGA.cpp:518-542); here it is real."""

    @abc.abstractmethod
    def launch_gradient(self, iterations: int, error_threshold: float,
                        multiplier: float) -> np.ndarray:
        """Run up to ``iterations`` gradient steps with learning rate
        ``multiplier``, early-stopping when the epoch loss drops below
        ``error_threshold``.  Returns the per-iteration errors (the reference
        returns a zero vector, src/netFPGA.cpp:545-580; here they are real
        losses, padded with zeros after early stop so the length contract is
        preserved)."""

    @abc.abstractmethod
    def print_inner_vals(self) -> None:
        """Debug introspection (reference stub, src/netFPGA.cpp:582-591)."""

    @abc.abstractmethod
    def get_gradient_performance(self) -> int:
        """Wall-clock µs of the last gradient launch (reference
        src/netFPGA.cpp:593-601; 0 when perf counters are disabled)."""

    @abc.abstractmethod
    def get_forward_performance(self) -> int:
        """Wall-clock µs of the last forward launch (reference
        src/netFPGA.cpp:603-611; 0 when perf counters are disabled)."""

    @abc.abstractmethod
    def filter_image(self, image: ImageSet) -> None:
        """Submit one frame into the bounded streaming pipeline.  On a full
        ring the frame is DROPPED with a warning — the reference's
        'PILA LLENA' behavior (src/netFPGA.cpp:330-333)."""

    @abc.abstractmethod
    def get_filtered_image(self) -> ImageSet:
        """Retrieve the oldest completed frame (FIFO).  On an empty ring an
        empty :class:`ImageSet` is returned with a warning — the reference's
        'PILA VACIA' behavior (src/netFPGA.cpp:358-361)."""
