"""Round 4: int8 batch-1 latency levers (VERDICT r3 item 7).

Target: int8 single-launch p50 181 us -> <=160 us, or measured negative
results.  Pair-packed stack scores already measured a LOSS (190 us,
ops/vit_stack.py:350).  Remaining named levers, isolated here on the
production `vit_forward_int8_latency` path (dotg embed + single-launch
int8 stack):

  A  production row-quant (divide + clip)
  B  clip-free (|x|/sx <= 127 by construction; rint can't reach 127.5,
     so the clip is dead code -- 4 fewer VPU passes/layer at batch 1)
  C  reciprocal (mul by 127/absmax instead of divide; keeps clip)
  D  clip-free + reciprocal
  E  the one-kernel full-model launch (embed+layers+head in one
     pallas_call) for comparison with the two-launch production path

B changes nothing numerically (clip is provably dead); C/D change the
int8 code LSB (divide vs multiply rounding) -- parity is checked at
cosine tolerance, and they only land if bit-cheapness is preserved or
the win is large.

Run: python experiments/perf_int8_lat_r4.py
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

from vit_fpga_tpu.models import quantized, vit
from vit_fpga_tpu.ops import quant_block
from vit_fpga_tpu.utils.timing import time_device_loop
from vit_fpga_tpu.ops.quant_fused import QMAX

cfg = vit.config("vit_b16", image_size=224, dtype="bfloat16")
params = vit.init_params(jax.random.key(0), cfg)
qparams = quantized.quantize_vit_fast(params)
prep = jax.device_put(quantized.prep_int8_latency(qparams, cfg))
im = jax.device_put(jax.random.normal(jax.random.key(1), (1, 224, 224, 3),
                                      jnp.float32).astype(jnp.bfloat16))

orig_rq = quant_block._row_quant


def rq_noclip(xf):
    absmax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
    sx = absmax / QMAX
    return jnp.rint(xf / sx).astype(jnp.int8), sx


def rq_recip(xf):
    absmax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
    r = QMAX / absmax
    xq = jnp.clip(jnp.rint(xf * r), -QMAX, QMAX).astype(jnp.int8)
    return xq, 1.0 / r


def rq_recip_noclip(xf):
    absmax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
    r = QMAX / absmax
    return jnp.rint(xf * r).astype(jnp.int8), 1.0 / r


from vit_fpga_tpu.ops import vit_stack

orig_stack = vit_stack.vit_layers_int8_pallas


def build(rq):
    # Fresh inner jit wrapper per variant: the decorated
    # vit_layers_int8_pallas caches its trace across outer jits, which
    # would silently reuse variant A's kernel for B/C/D.
    quant_block._row_quant = rq
    vit_stack.vit_layers_int8_pallas = functools.partial(
        jax.jit(orig_stack.__wrapped__,
                static_argnames=("num_heads", "eps", "act", "n_valid",
                                 "interpret")))
    fwd = jax.jit(lambda p, x: quantized.vit_forward_int8_latency(p, x, cfg))
    out = fwd(prep, im)
    out.block_until_ready()
    quant_block._row_quant = orig_rq
    vit_stack.vit_layers_int8_pallas = orig_stack
    return fwd, out


print("device:", jax.devices(), flush=True)
fa, oa = build(orig_rq)
fb, ob = build(rq_noclip)
fc, oc = build(rq_recip)
fd, od = build(rq_recip_noclip)
db = float(jnp.max(jnp.abs(oa - ob)))
assert db == 0.0, f"clip-free changed output: {db:.3e}"
for name, o in (("C recip", oc), ("D recip+noclip", od)):
    cos = float(jnp.sum(oa * o)
                / (jnp.linalg.norm(oa) * jnp.linalg.norm(o) + 1e-30))
    print(f"{name}: cosine vs A = {cos:.6f}")

# one-kernel full path
prep_full = jax.device_put(quantized.prep_full_int8_latency(qparams, cfg))
fe = jax.jit(lambda p, x: quantized.vit_forward_int8_latency_logits(
    p, x, cfg))
fe(prep_full, im).block_until_ready()

for r in range(4):
    row = []
    for label, fn, a in (("A", fa, prep), ("B", fb, prep), ("C", fc, prep),
                         ("D", fd, prep), ("E-full", fe, prep_full)):
        t = time_device_loop(fn, (a, im), n_lo=64, n_hi=256)
        row.append(f"{label} {t*1e6:6.1f}us")
    print(f"round {r}: " + "  ".join(row), flush=True)
