"""GELU formulation microbench (follow-up to perf_vpu_transcend.py).

perf_vpu_transcend measured jax.nn.gelu(approximate=True) at 2.94 us/tile
vs bare tanh at 1.15 — ~14 extra VPU passes for what should be ~5 mul/fma.
Candidates to close that: explicit fma forms, bf16 VPU math, sigmoid form
with hardware exp (exp measured at 0.27 us/tile — effectively free).

Tile (1024, 512) f32 (or bf16 variant), slope R=8..40, n=64.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.utils.timing import time_device_loop_single

ROWS, COLS = 1024, 512
_A = 0.7978845608028654          # sqrt(2/pi)
_B = _A * 0.044715


def gelu_jaxnn(x):
    return jax.nn.gelu(x, approximate=True)


def gelu_hand(x):
    # u = x*(A + B*x^2); out = 0.5*x + 0.5*x*tanh(u)
    x2 = x * x
    u = x * (_A + _B * x2)
    hx = 0.5 * x
    return hx + hx * jnp.tanh(u)


def gelu_exp(x):
    # sigmoid form with hardware exp: x * sigma(2u) = x * e / (1 + e)
    x2 = x * x
    u2 = x * (2.0 * _A + 2.0 * _B * x2)
    e = jnp.exp(u2)
    return x * (e / (1.0 + e))


def gelu_expm(x):
    # x / (1 + exp(-2u)) — one fewer mul than gelu_exp
    x2 = x * x
    u2 = x * (-2.0 * _A - 2.0 * _B * x2)
    return x / (1.0 + jnp.exp(u2))


def tanh_only(x):
    return jnp.tanh(x)


def exp_only(x):
    return jnp.exp(x)


VARIANTS = {
    "gelu_jaxnn": (gelu_jaxnn, jnp.float32),
    "gelu_hand": (gelu_hand, jnp.float32),
    "gelu_exp": (gelu_exp, jnp.float32),
    "gelu_expm": (gelu_expm, jnp.float32),
    "gelu_jaxnn_bf16": (gelu_jaxnn, jnp.bfloat16),
    "gelu_hand_bf16": (gelu_hand, jnp.bfloat16),
    "gelu_expm_bf16": (gelu_expm, jnp.bfloat16),
    "tanh_only": (tanh_only, jnp.float32),
    "exp_only": (exp_only, jnp.float32),
}


def make_fn(op, dt, r):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        for _ in range(r):
            x = (op(x) * 1e-3 + x * 0.9).astype(dt)
        o_ref[:] = x

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, COLS), dt),
        )(x.astype(dt))

    return fn


def main():
    xs = np.linspace(-8, 8, 100001)
    ref = 0.5 * xs * (1 + np.tanh(_A * xs + _B * xs ** 3))
    for nm, f in (("gelu_hand", gelu_hand), ("gelu_exp", gelu_exp),
                  ("gelu_expm", gelu_expm)):
        got = np.asarray(f(jnp.asarray(xs, jnp.float32)))
        print(f"{nm:10s} max abs err vs tanh-GELU: "
              f"{np.abs(got - ref).max():.2e}")

    x = jnp.asarray(np.random.RandomState(0).uniform(-3, 3, (ROWS, COLS)),
                    jnp.float32)
    print(f"\ntile {ROWS}x{COLS}; per-op cost = slope R=8..40")
    for name, (op, dt) in VARIANTS.items():
        t8 = time_device_loop_single(make_fn(op, dt, 8), (x,), n=64)
        t40 = time_device_loop_single(make_fn(op, dt, 40), (x,), n=64)
        per = (t40 - t8) / 32.0
        print(f"{name:16s}  {per * 1e6:8.2f} us/apply")


if __name__ == "__main__":
    main()
