"""VPU transcendental microbenchmark (round 3, MFU push).

The remaining ViT-B gap decomposition (docs/perf.md "Where the remaining")
charges ~1.6 ms to softmax VPU + dh-64 scores and ~1.5 ms to LN+GELU VPU.
The softmax/GELU cost is dominated by jnp.exp / jnp.tanh.  Question: what
do those actually COST on the v5e VPU relative to a fused multiply-add,
and can a bit-trick exp (exponent-field injection + short poly) or a
rational tanh beat Mosaic's lowering?

Method: a Pallas kernel applies `x = op(x) * eps + x` R times over a
(1024, 512) f32 VMEM tile (serial chain — no ILP escape), grid=1.  Slope
between R=4 and R=20 isolates the per-application cost of `op` over the
tile; the mul-add chain around it is identical across ops.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.utils.timing import time_device_loop_single

ROWS, COLS = 1024, 512
N_ELEM = ROWS * COLS

_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def fast_exp(x):
    """exp(x) via exponent-field injection + degree-3 poly for 2^f.

    exp(x) = 2^(x*log2e) = 2^i * 2^f, i = round(t), f = t - i in
    [-0.5, 0.5].  2^i is built by writing (i+127) into a float32 exponent
    field (one shift + bitcast); 2^f by a short Taylor poly (rel err
    ~6e-4 at degree 3 — below a bf16 ulp).  Valid for x in ~[-120, 120].
    """
    t = x * _LOG2E
    ti = jnp.round(t)
    f = t - ti
    # 2^f = e^(f ln2): Taylor in (f ln2), degree 3
    g = f * _LN2
    p = 1.0 + g * (1.0 + g * (0.5 + g * (1.0 / 6.0)))
    ei = (ti.astype(jnp.int32) + 127) << 23
    return p * jax.lax.bitcast_convert_type(ei, jnp.float32)


def fast_exp4(x):
    t = x * _LOG2E
    ti = jnp.round(t)
    g = (t - ti) * _LN2
    p = 1.0 + g * (1.0 + g * (0.5 + g * (1.0 / 6.0 + g * (1.0 / 24.0))))
    ei = (ti.astype(jnp.int32) + 127) << 23
    return p * jax.lax.bitcast_convert_type(ei, jnp.float32)


def fast_tanh(x):
    """Pade(5,4)-ish rational tanh with clamp; rel err <2e-4 on [-4.97,4.97]."""
    x = jnp.clip(x, -4.97, 4.97)
    x2 = x * x
    num = x * (135135.0 + x2 * (17325.0 + x2 * (378.0 + x2)))
    den = 135135.0 + x2 * (62370.0 + x2 * (3150.0 + x2 * 28.0))
    return num / den


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def fast_gelu(x):
    """tanh-GELU with the rational tanh."""
    u = 0.7978845608028654 * (x + 0.044715 * x * x * x)
    return 0.5 * x * (1.0 + fast_tanh(u))


def sig_gelu(x):
    """tanh-GELU via sigmoid identity + fast_exp: x * sigma(2u)."""
    u = 0.7978845608028654 * (x + 0.044715 * x * x * x)
    e = fast_exp(2.0 * u)
    return x * (e / (1.0 + e))


OPS = {
    "muladd": lambda x: x * 1.0001 + 0.0001,
    "exp": jnp.exp,
    "exp2": jnp.exp2,
    "fast_exp": fast_exp,
    "fast_exp4": fast_exp4,
    "tanh": jnp.tanh,
    "fast_tanh": fast_tanh,
    "sigmoid": jax.nn.sigmoid,
    "gelu_tanh": gelu_tanh,
    "fast_gelu": fast_gelu,
    "sig_gelu": sig_gelu,
    "rsqrt": jax.lax.rsqrt,
}


def make_fn(op_name, r):
    op = OPS[op_name]

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        for _ in range(r):
            x = op(x) * 1e-3 + x * 0.9
        o_ref[:] = x

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.float32),
        )(x)

    return fn


def main():
    x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (ROWS, COLS)),
                    jnp.float32)
    # accuracy check first (vs f64 numpy)
    xs = np.linspace(-80, 80, 100001)
    fe = np.asarray(fast_exp(jnp.asarray(xs, jnp.float32)))
    rel = np.abs(fe / np.exp(xs) - 1.0)
    print(f"fast_exp  max rel err on [-80,80]: {rel.max():.2e}")
    xs2 = np.linspace(-8, 8, 100001)
    ft = np.asarray(fast_tanh(jnp.asarray(xs2, jnp.float32)))
    err = np.abs(ft - np.tanh(xs2))
    print(f"fast_tanh max abs err on [-8,8]:  {err.max():.2e}")
    fg = np.asarray(fast_gelu(jnp.asarray(xs2, jnp.float32)))
    g64 = 0.5 * xs2 * (1 + np.tanh(0.7978845608028654
                                   * (xs2 + 0.044715 * xs2 ** 3)))
    print(f"fast_gelu max abs err on [-8,8]:  {np.abs(fg - g64).max():.2e}")
    sg = np.asarray(sig_gelu(jnp.asarray(xs2, jnp.float32)))
    print(f"sig_gelu  max abs err on [-8,8]:  {np.abs(sg - g64).max():.2e}")

    print(f"\ntile {ROWS}x{COLS} f32; per-op cost = slope R=4..20 / tile")
    for name in OPS:
        t4 = time_device_loop_single(make_fn(name, 4), (x,), n=64)
        t20 = time_device_loop_single(make_fn(name, 20), (x,), n=64)
        per = (t20 - t4) / 16.0
        print(f"{name:10s}  {per * 1e6:8.2f} us/apply   "
              f"{N_ELEM / per / 1e9:8.1f} Gelem/s")


if __name__ == "__main__":
    main()
