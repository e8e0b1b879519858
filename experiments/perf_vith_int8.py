"""Round 5: ViT-H int8 under the raised scoped-VMEM plan.

ViT-H's 12.5 MB int8 MLP weights exceeded the 11 MB default-plan gate,
so int8 ViT-H always ran the per-linear fused fallback — never
measured.  mlp_plan_int8 now engages the mega-kernels under a raised
vmem_limit (the same compiler-default-not-hardware fact the bf16 path
uses at 48 MB).  A/B at b32 (the bf16 sweep's peak batch):

  A  per-linear fused fallback (the old dispatch, gate forced False)
  B  mega-kernels, raised-plan MLP (production dispatch after round 5)
  C  B with the calibrated static tree

Run: python experiments/perf_vith_int8.py
"""
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
from vit_fpga_tpu.ops.common import V5E_BF16_FLOPS
from vit_fpga_tpu.utils.timing import time_device_loop

from bench import vit_flops_per_image  # noqa: E402

B, IMG = 32, 224
cfg = vit.config("vit_h14", image_size=IMG, dtype="bfloat16")
params = vit.init_params(jax.random.key(0), cfg)
qdyn = jax.device_put(quantized.quantize_vit_fast(params))
qsta = jax.device_put(quantized.quantize_vit_static(params, cfg))
images = jax.device_put(
    jax.random.normal(jax.random.key(1), (B, IMG, IMG, 3),
                      jnp.float32).astype(jnp.bfloat16))
roof8 = 2 * V5E_BF16_FLOPS / vit_flops_per_image(cfg)
print(f"device: {jax.devices()}  int8 roofline {roof8:.0f} img/s",
      flush=True)


def run(label, qp):
    fwd = jax.jit(lambda p, im: quantized.vit_forward_int8_fast(p, im,
                                                                cfg))
    out = fwd(qp, images)
    t = time_device_loop(fwd, (qp, images), n_lo=2, n_hi=8)
    print(f"{label:44s} {t * 1e3:8.3f} ms  {B / t:7.1f} img/s "
          f"({B / t / roof8 * 100:4.1f}% of int8 roof)", flush=True)
    return out, t


orig_fits = quantized._int8_block_fits
quantized._int8_block_fits = lambda _cfg: False
out_a = None
try:
    out_a, _ = run("A per-linear fallback (old dispatch)", qdyn)
except Exception as e:  # noqa: BLE001
    # First run found the OLD dispatch itself compile-OOMs here:
    # int8_linear_fused at (8704, 5120)@(5120, 1280) asks 18.11 MB of
    # scoped VMEM vs the 16 MB default — ViT-H b32 int8 simply DID NOT
    # RUN before the raised plan.  The mega-kernel path is a capability
    # fix, not only a perf lever.
    print(f"A per-linear fallback: FAILS TO COMPILE "
          f"({type(e).__name__}: scoped-VMEM OOM)", flush=True)
quantized._int8_block_fits = orig_fits
jax.clear_caches()
assert quantized._int8_block_fits(cfg), "raised plan should now engage"
out_b, _ = run("B mega-kernels, raised-plan MLP", qdyn)
run("B2 mega-kernels second round", qdyn)
if out_a is not None:
    cos = float(np.dot(np.asarray(out_a, np.float64).ravel(),
                       np.asarray(out_b, np.float64).ravel())
                / (np.linalg.norm(np.asarray(out_a, np.float64))
                   * np.linalg.norm(np.asarray(out_b, np.float64))
                   + 1e-30))
    print(f"A-vs-B logits cosine: {cos:.6f}", flush=True)
run("C mega-kernels, static tree", qsta)
