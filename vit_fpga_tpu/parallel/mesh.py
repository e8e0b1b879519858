"""Device mesh construction for multi-chip execution.

The reference is strictly single-device (SURVEY.md §2.3: one in-order
OpenCL queue, no NCCL/MPI/distribution of any kind).  The TPU rebuild
scales the same workloads across chips the idiomatic way: a named
``jax.sharding.Mesh`` whose axes carry semantic roles —

  * ``dp`` — data parallel (batch sharding; pure-ICI all-reduce of grads)
  * ``tp`` — tensor parallel (Megatron-style column/row sharding of the
    attention and MLP matmuls; XLA inserts the psum/all-gathers)

Axes are sized by factoring the device count; either can be 1.  All
collectives ride ICI when the mesh maps onto a pod slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: Optional[int] = None, tp: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("dp", "tp") mesh over ``devices`` (default: all).

    Unspecified axis sizes are inferred: given one axis the other is
    ``n // axis``; given neither, tp defaults to 1 (pure data parallel).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and tp is None:
        dp, tp = n, 1
    elif dp is None:
        assert tp is not None
        dp = n // tp
    elif tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def single_device_mesh() -> Mesh:
    return make_mesh(dp=1, tp=1, devices=[jax.devices()[0]])
