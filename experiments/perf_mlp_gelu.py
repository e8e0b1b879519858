"""Production-kernel A/B: jax.nn.gelu vs fma-reassociated GELU.

perf_gelu_variants.py measured jax.nn.gelu(approximate=True) ~0.6 us/tile
slower than an fma-reassociated identical form — over the MLP's 26
(512, 3072) tiles x 12 layers that's potentially ~0.2-0.5 ms/step IF the
GELU VPU time is serial-exposed.  Microbench noise is high; this times the
PRODUCTION stats-chain MLP stack (fused_mlp_stats_pallas, block_t 512,
48 MB plan, ViT-B b64 geometry: 13312 rows x 768, mlp 3072).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops.fused_mlp import fused_mlp_stats_pallas
from vit_fpga_tpu.utils.timing import time_device_loop_single

T, D, M, L = 64 * 208, 768, 3072, 12
VMEM48 = 48 * 1024 * 1024


def make_stack(act):
    def fn(x, stats, s, b, w1, b1, w2, b2):
        st = stats
        for _ in range(L):
            x, st = fused_mlp_stats_pallas(
                x, st, s, b, w1, b1, w2, b2, act=act, block_t=512,
                vmem_limit=VMEM48, emit_stats=True)
        return x

    return jax.jit(fn)


def main():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.normal(size=(T, D)) * 0.3, jnp.bfloat16)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(jnp.var(xf, axis=-1, keepdims=True) + 1e-6)
    stats = jnp.concatenate(
        [mu, rstd, jnp.zeros((T, 126), jnp.float32)], axis=-1)
    s = jnp.asarray(r.normal(size=(D,)) * 0.1 + 1, jnp.float32)
    b = jnp.asarray(r.normal(size=(D,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(r.normal(size=(D, M)) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(r.normal(size=(M,)) * 0.02, jnp.float32)
    w2 = jnp.asarray(r.normal(size=(M, D)) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(r.normal(size=(D,)) * 0.02, jnp.float32)
    args = (x, stats, s, b, w1, b1, w2, b2)

    fa = make_stack("gelu_tanh")
    fb = make_stack("gelu_fma")
    # parity
    ya = np.asarray(fa(*args), np.float32)
    yb = np.asarray(fb(*args), np.float32)
    print(f"max abs diff gelu_tanh vs gelu_fma (bf16 out): "
          f"{np.abs(ya - yb).max():.2e}")

    for rnd in range(4):
        ta = time_device_loop_single(fa, args, n=8)
        tb = time_device_loop_single(fb, args, n=8)
        print(f"round {rnd}: gelu_tanh {ta * 1e3:7.3f} ms   "
              f"gelu_fma {tb * 1e3:7.3f} ms   "
              f"delta {(ta - tb) * 1e3:+6.3f} ms /12L")


if __name__ == "__main__":
    main()
