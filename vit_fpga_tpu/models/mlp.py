"""Dense feed-forward model family — the reference-parity network.

This is the model the reference's ``network_v1`` device kernel actually ran:
an arbitrary-depth dense net described by ``net_data`` (n_ins, n_p_l layer
widths, per-neuron weights/biases, activation codes; src/netFPGA.cpp:64-107).
Here it is a functional JAX model sharing the backends' weight conventions,
so the same pytree flows through NetTPU, the trainer, and the parallel
layer.

Params layout: ``{"layers": [{"w": (fan_in, fan_out), "b": (fan_out,)}]}``
(transposed from the reference's [neuron][input] rows for ``x @ W``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import activations as act
from ..defines import ACT_RELU2, NetData, random_net

Params = Dict[str, Any]


def from_net_data(data: NetData) -> Tuple[Params, Tuple[int, ...]]:
    """NetData -> (params pytree, static activation codes)."""
    data.validate()
    layers = [{"w": jnp.asarray(np.ascontiguousarray(w.T)),
               "b": jnp.asarray(b)}
              for w, b in zip(data.params, data.bias)]
    return {"layers": layers}, tuple(int(a) for a in data.activations)


def to_net_data(params: Params, n_ins: int,
                acts: Sequence[int]) -> NetData:
    layers = params["layers"]
    n_p_l = [int(l["b"].shape[0]) for l in layers]
    return NetData(
        n_ins=n_ins, n_layers=len(layers), n_p_l=n_p_l,
        params=[np.ascontiguousarray(np.asarray(l["w"]).T) for l in layers],
        bias=[np.asarray(l["b"]) for l in layers],
        activations=list(acts)).validate()


def init_params(key: jax.Array, n_ins: int, n_p_l: Sequence[int],
                scale: float = 1.0) -> Params:
    """Uniform init in [-scale, scale) (reference-style, defines.h:11-12)."""
    layers: List[Dict[str, jax.Array]] = []
    fan_in = n_ins
    for width in n_p_l:
        key, kw, kb = jax.random.split(key, 3)
        layers.append({
            "w": jax.random.uniform(kw, (fan_in, width), jnp.float32,
                                    -scale, scale),
            "b": jax.random.uniform(kb, (width,), jnp.float32,
                                    -scale, scale)})
        fan_in = width
    return {"layers": layers}


def forward(params: Params, x: jax.Array, *, acts: Tuple[int, ...],
            compute_dtype=jnp.float32) -> jax.Array:
    """Batched forward (B, n_ins) -> (B, n_out)."""
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32 else None)
    h = x.astype(compute_dtype)
    for layer, code in zip(params["layers"], acts):
        h = jnp.matmul(h, layer["w"].astype(compute_dtype),
                       precision=precision) + layer["b"].astype(compute_dtype)
        h = act.apply_jnp(code, h)
    return h.astype(jnp.float32)


def jit_forward(acts: Tuple[int, ...], compute_dtype=jnp.float32):
    return jax.jit(partial(forward, acts=acts, compute_dtype=compute_dtype))


def random_model(n_ins: int, n_p_l: Sequence[int], seed: int = 0,
                 activations: Sequence[int] | None = None):
    """Convenience: reference-style random net as (params, acts)."""
    return from_net_data(random_net(n_ins, n_p_l, seed=seed,
                                    activations=activations))
