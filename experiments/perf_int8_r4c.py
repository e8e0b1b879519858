"""Round 4: confirm int8 MLP block_t=640 with 4 alternating A/B rounds.

perf_int8_r4b.py single-round sweep: 256 -> 6965 img/s, 384 -> 6723,
512 -> 7087, 640 -> 7125 (best), 768 -> 6826, all bit-exact.  This
alternates A(256)/B(640) four times so drift can't masquerade as a win
(the repo's 4/4 evidence bar, docs/perf.md methodology).

Run: python experiments/perf_int8_r4c.py
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

B, IMG = 64, 224
cfg = vit.config("vit_b16", image_size=IMG, dtype="bfloat16")
params = vit.init_params(jax.random.key(0), cfg)
qparams = jax.device_put(quantized.quantize_vit_fast(params))
images = jax.device_put(
    jax.random.normal(jax.random.key(1), (B, IMG, IMG, 3),
                      jnp.float32).astype(jnp.bfloat16))

orig_mlp = quant_block.mlp_block_int8


def build(bt):
    # No clear_caches: each jit object is traced once, while its block_t
    # is patched in; later calls reuse that compiled executable.
    quant_block.mlp_block_int8 = functools.partial(orig_mlp, block_t=bt)
    fwd = jax.jit(lambda p, im, _bt=bt: quantized.vit_forward_int8_fast(
        p, im, cfg))
    fwd(qparams, images).block_until_ready()
    quant_block.mlp_block_int8 = orig_mlp
    return fwd


print("device:", jax.devices())
fa, fb = build(256), build(640)
wins = 0
for r in range(4):
    ta = time_device_loop(fa, (qparams, images), n_lo=4, n_hi=16)
    tb = time_device_loop(fb, (qparams, images), n_lo=4, n_hi=16)
    win = tb < ta
    wins += win
    print(f"round {r}: A(256) {ta*1e3:7.3f} ms  B(640) {tb*1e3:7.3f} ms  "
          f"{'B wins' if win else 'A wins'} ({(ta/tb-1)*100:+.1f}%)",
          flush=True)
quant_block.mlp_block_int8 = orig_mlp
print(f"B(640) wins {wins}/4")
