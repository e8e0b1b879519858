"""Activation registry shared by the CPU oracle and the JAX/Pallas paths.

The reference carries a single numeric activation code per network
(``activations = 1 // RELU2``, src/netFPGA.cpp:79; the ``net_data`` struct
reserves a per-layer nested vector, def/defines.h:21-22, marked
``TODO: IMPLEMENTAR ACTIVATIONS``).  We implement the per-layer codes the
struct promises.  Both a NumPy and a jnp implementation are provided so the
oracle and the device path share one source of truth for semantics.
"""

from __future__ import annotations

import numpy as np

from .defines import (ACT_GELU, ACT_IDENTITY, ACT_RELU2, ACT_SIGMOID,
                      ACT_TANH)


def apply_numpy(code: int, x: np.ndarray) -> np.ndarray:
    if code == ACT_IDENTITY:
        return x
    if code == ACT_RELU2:
        return np.maximum(x, 0.0)
    if code == ACT_GELU:
        # tanh approximation, matching jax.nn.gelu(approximate=True)
        c = np.sqrt(2.0 / np.pi).astype(x.dtype)
        return 0.5 * x * (1.0 + np.tanh(c * (x + 0.044715 * x ** 3)))
    if code == ACT_TANH:
        return np.tanh(x)
    if code == ACT_SIGMOID:
        return 1.0 / (1.0 + np.exp(-x))
    raise ValueError(f"unknown activation code {code}")


def apply_jnp(code: int, x):
    import jax.numpy as jnp
    import jax
    if code == ACT_IDENTITY:
        return x
    if code == ACT_RELU2:
        return jnp.maximum(x, 0.0)
    if code == ACT_GELU:
        return jax.nn.gelu(x, approximate=True)
    if code == ACT_TANH:
        return jnp.tanh(x)
    if code == ACT_SIGMOID:
        return jax.nn.sigmoid(x)
    raise ValueError(f"unknown activation code {code}")


def derivative_numpy(code: int, x: np.ndarray) -> np.ndarray:
    """d(act)/dx evaluated at pre-activation x — used by the CPU trainer."""
    if code == ACT_IDENTITY:
        return np.ones_like(x)
    if code == ACT_RELU2:
        return (x > 0.0).astype(x.dtype)
    if code == ACT_TANH:
        t = np.tanh(x)
        return 1.0 - t * t
    if code == ACT_SIGMOID:
        s = 1.0 / (1.0 + np.exp(-x))
        return s * (1.0 - s)
    if code == ACT_GELU:
        c = np.sqrt(2.0 / np.pi).astype(x.dtype)
        inner = c * (x + 0.044715 * x ** 3)
        t = np.tanh(inner)
        dinner = c * (1.0 + 3 * 0.044715 * x ** 2)
        return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * dinner
    raise ValueError(f"unknown activation code {code}")
