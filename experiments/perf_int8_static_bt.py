"""Round 5: does the static-scale int8 MLP prefer a different row tile?

The dynamic kernel's block_t=640 default (perf_int8_r4b/r4c) was tuned
with per-row quant chains in the half; the static kernel deleted them,
changing the VPU/MXU balance per row.  Re-sweep on the production
static path (monkeypatching the PICKER, per the ADVICE r4 fix).

Run: python experiments/perf_int8_static_bt.py
"""
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
qparams = jax.device_put(quantized.quantize_vit_static(params, cfg))
images = jax.device_put(
    jax.random.normal(jax.random.key(1), (B, IMG, IMG, 3),
                      jnp.float32).astype(jnp.bfloat16))
print("device:", jax.devices(), flush=True)


def run(label, fwd):
    t = time_device_loop(lambda p, im: fwd(p, im), (qparams, images),
                         n_lo=4, n_hi=20)
    print(f"{label:40s} {t * 1e3:8.3f} ms  {B / t:8.1f} img/s", flush=True)
    return t


fwd_a = jax.jit(lambda p, im: quantized.vit_forward_int8_fast(p, im, cfg))
out_a = fwd_a(qparams, images)
run("A static production (adaptive block_t)", fwd_a)

orig_pick = quant_block.mlp_block_t
for bt in (512, 640, 768, 896, 1024):
    quant_block.mlp_block_t = lambda *a, _bt=bt, **k: _bt
    jax.clear_caches()
    fwd_v = jax.jit(lambda p, im: quantized.vit_forward_int8_fast(p, im,
                                                                  cfg))
    try:
        out_v = fwd_v(qparams, images)
        d = float(jnp.max(jnp.abs(out_a - out_v)))
        assert d == 0.0, f"block_t={bt} broke exactness: {d:.3e}"
        run(f"B static block_t={bt} (bit-exact)", fwd_v)
    except AssertionError:
        raise
    except Exception as e:  # noqa: BLE001
        print(f"block_t={bt}: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
quant_block.mlp_block_t = orig_pick
