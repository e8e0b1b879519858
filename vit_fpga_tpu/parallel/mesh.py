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


# ---------------------------------------------------------------------------
# Multi-host scaffolding: jax.distributed init + DCN-aware hybrid meshes.
# Tested here only at process_count=1 (one tunneled chip / CPU mesh); the
# API shape is the standard multi-slice recipe so a real pod/multislice
# deployment is a config change, not a code change.
# ---------------------------------------------------------------------------


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize ``jax.distributed`` for multi-host execution.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID; TPU pods auto-discover all three).
    Returns True if a multi-process runtime was initialized, False for
    the single-process no-op (so callers can call this unconditionally).
    """
    import os
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return False
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_hybrid_mesh(dcn: Optional[int] = None, dp: Optional[int] = None,
                     tp: int = 1,
                     devices: Optional[Sequence] = None) -> Mesh:
    """("dcn", "dp", "tp") mesh: data parallelism split into a slow
    inter-slice axis (DCN; gradient all-reduce only) and a fast
    intra-slice axis (ICI), with tp innermost so the per-step Megatron
    collectives never cross DCN — the scaling-book layout for
    multi-slice training.

    ``dcn`` defaults to the number of slices (1 in single-slice or
    single-process runs, where this degenerates to make_mesh semantics
    with a leading unit axis).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dcn is None:
        # slice count when the runtime exposes it; 1 otherwise
        slice_ids = {getattr(d, "slice_index", 0) or 0 for d in devices}
        dcn = max(len(slice_ids), 1)
    if dp is None:
        dp = n // (dcn * tp)
    if dcn * dp * tp != n:
        raise ValueError(
            f"dcn*dp*tp = {dcn}*{dp}*{tp} != device count {n}")
    if dcn > 1:
        try:
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_hybrid_device_mesh(
                (dp, tp), (dcn, 1), devices=devices,
                process_is_granule=False)
            arr = arr.reshape(dcn, dp, tp)
            return Mesh(arr, axis_names=("dcn", "dp", "tp"))
        except Exception:
            pass  # fall through to the naive reshape
    arr = np.asarray(devices).reshape(dcn, dp, tp)
    return Mesh(arr, axis_names=("dcn", "dp", "tp"))
