"""Round 4: attack the int8 VPU-bound halves (VERDICT r3 item 2).

int8 ViT-B b64 sits at 6753 img/s = 60.2% of its 11216 img/s roofline.
The int8 MXU work is half the bf16 kernel's, so the quant/dequant/LN
VPU passes are exposed.  Levers measured here, same-session A/B:

  A  production int8 forward (vit_forward_int8_fast), as-is
  B  A + reciprocal row-quant: _row_quant's (t, k)-wide broadcast
     DIVIDE xf / sx becomes a per-row reciprocal (QMAX / absmax on the
     (t, 1) vector) and a wide MULTIPLY — Mosaic lowers per-lane divf
     much slower than mulf, and the pass runs over (t, 3072) in the MLP
  C  B + int8 MLP block_t 512 (production default 256)
  D  B + int8 MLP block_t 1024

B is applied by monkey-patching quant_block._row_quant (the one shared
row-quant site of the mega-kernels); C/D by patching the block_t kwarg
through models/quantized._qblock_fast's mlp call.

Run: python experiments/perf_int8_r4.py
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
import numpy as np

from vit_fpga_tpu.models import quantized, vit
from vit_fpga_tpu.ops import quant_block
from vit_fpga_tpu.ops.quant_fused import QMAX
from vit_fpga_tpu.utils.timing import time_device_loop

B, IMG = 64, 224
cfg = vit.config("vit_b16", image_size=IMG, dtype="bfloat16")
params = vit.init_params(jax.random.key(0), cfg)
qparams = jax.device_put(quantized.quantize_vit_fast(params))
images = jax.device_put(
    jax.random.normal(jax.random.key(1), (B, IMG, IMG, 3),
                      jnp.float32).astype(jnp.bfloat16))

_row_quant_div = quant_block._row_quant


def _row_quant_rcp(xf):
    """Reciprocal-multiply row quant: the wide pass is a mul, not a div."""
    absmax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                         1e-12)
    sx = absmax * (1.0 / QMAX)
    rq = QMAX / absmax          # (t, 1): the only divide, per-row
    xq = jnp.clip(jnp.rint(xf * rq), -QMAX, QMAX).astype(jnp.int8)
    return xq, sx


def run(label, fwd):
    t = time_device_loop(lambda p, im: fwd(p, im), (qparams, images),
                         n_lo=4, n_hi=20)
    print(f"{label:44s} {t * 1e3:8.3f} ms  {B / t:8.1f} img/s")
    return t


fwd = jax.jit(functools.partial(quantized.vit_forward_int8_fast, cfg=cfg))

print("device:", jax.devices())
out_a = fwd(qparams, images)
t_a = run("A production int8 (divide row-quant)", fwd)

quant_block._row_quant = _row_quant_rcp
jax.clear_caches()   # the inner jitted kernels must retrace to see the patch
fwd_b = jax.jit(lambda p, im: quantized.vit_forward_int8_fast(p, im, cfg))
out_b = fwd_b(qparams, images)
cos = float(jnp.sum(out_a * out_b) /
            (jnp.linalg.norm(out_a) * jnp.linalg.norm(out_b)))
print(f"   B vs A logits cosine: {cos:.6f}  max|diff|: "
      f"{float(jnp.max(jnp.abs(out_a - out_b))):.3e}")
t_b = run("B reciprocal row-quant", fwd_b)

# C/D: block_t via the mlp_block_int8 default — patch the function's
# signature default (the dispatch calls it without block_t)
orig_mlp = quant_block.mlp_block_int8
for bt, label in ((512, "C"), (1024, "D")):
    quant_block.mlp_block_int8 = functools.partial(orig_mlp, block_t=bt)
    # quantized.py imports the symbol inside the function body, so the
    # patch on the module attribute is what the dispatch resolves
    jax.clear_caches()
    fwd_v = jax.jit(lambda p, im: quantized.vit_forward_int8_fast(p, im,
                                                                  cfg))
    try:
        run(f"{label} reciprocal + int8 MLP block_t={bt}", fwd_v)
    except Exception as e:  # noqa: BLE001
        print(f"{label} block_t={bt}: FAILED {type(e).__name__}: {e}")
quant_block.mlp_block_int8 = orig_mlp
quant_block._row_quant = _row_quant_div
