"""Round 5b diagnosis: are int8 MXU GEMMs actually faster at the
pair-packed attention shapes?  Times a Pallas kernel that runs ONLY the
score GEMM (M=200, K=128, N=1024 block-diag) and ONLY the PV GEMM
(M=200, K=1024, N=128) back-to-back x (6 pairs x 12 layers), in int8
vs bf16, with operands resident in VMEM — no softmax, no quant chains,
no panel emission.  Splits the perf_int8_scores_r5 loss between "the
int8 GEMM is not faster here" and "the surrounding VPU work eats it".

Run: python experiments/perf_int8s_micro.py
"""
import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_fpga_tpu.utils.timing import time_device_loop

M, K, N = 200, 128, 1024     # score GEMM per head-pair (kv_pad=512 x2)
PAIRS = 6 * 12               # ViT-B: 6 head pairs x 12 layers


def _kern(q_ref, k_ref, v_ref, o_ref, *, dtype, reps):
    acc = None
    for r in range(reps):
        if dtype == "int8":
            s = jax.lax.dot_general(
                q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            p = s.astype(jnp.int8)
            pv = jax.lax.dot_general(
                p, v_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            s = jax.lax.dot_general(
                q_ref[:].astype(jnp.bfloat16), k_ref[:].astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = s.astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                p, v_ref[:].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = pv if acc is None else acc + pv
    o_ref[:] = acc


def bench(dtype):
    dt = jnp.int8 if dtype == "int8" else jnp.bfloat16
    q = jnp.ones((M, K), dt)
    k = jnp.ones((N, K), dt)
    v = jnp.ones((N, K), dt)
    fn = pl.pallas_call(
        functools.partial(_kern, dtype=dtype, reps=PAIRS),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.float32),
    )
    jfn = jax.jit(fn)
    jfn(q, k, v)
    t = time_device_loop(jfn, (q, k, v), n_lo=4, n_hi=20)
    gops = 2 * (M * K * N + M * N * K) * PAIRS / t / 1e9
    print(f"{dtype:6s}: {t*1e6:9.1f} us for {PAIRS} score+PV pairs "
          f"({gops:8.0f} GOP/s)", flush=True)
    return t


print("device:", jax.devices())
tb = bench("bf16")
ti = bench("int8")
print(f"int8/bf16 ratio: {ti/tb:.3f}  (0.5 = full 2x int8 rate)")
