"""block_t x vmem-plan sweep for the stats-chain MLP at ViT-B b64 rows.

Round-2 tuned block_t 256 -> 512 on the PLAIN fused MLP; the stats
variant (no in-kernel reductions) shifts the VPU/MXU balance, and the
pair-packed attention changed what the MLP overlaps with.  Re-sweep.
Rows = 64*208 = 13312 (grid: 26 steps at 512, 16 at 832, 13 at 1024).
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


def make_stack(block_t, vmem):
    def fn(x, stats, s, b, w1, b1, w2, b2):
        st = stats
        for _ in range(L):
            x, st = fused_mlp_stats_pallas(
                x, st, s, b, w1, b1, w2, b2, act="gelu_tanh",
                block_t=block_t, vmem_limit=vmem, emit_stats=True)
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

    cases = [(512, 0), (512, VMEM48), (832, 0), (832, VMEM48),
             (1024, 0), (1024, VMEM48), (256, 0), (1664, VMEM48)]
    fns = {}
    for bt, vm in cases:
        try:
            f = make_stack(bt, vm)
            f(*args)[0].block_until_ready()
            fns[(bt, vm)] = f
        except Exception as e:  # noqa: BLE001
            print(f"bt={bt} vmem={vm >> 20}M: COMPILE FAIL "
                  f"({str(e)[:80]})")
    for rnd in range(3):
        line = f"round {rnd}:"
        for (bt, vm), f in fns.items():
            t = time_device_loop_single(f, args, n=8)
            line += f"  bt{bt}/v{vm >> 20}M {t * 1e3:6.3f}"
        print(line + "  ms/12L")


if __name__ == "__main__":
    main()
