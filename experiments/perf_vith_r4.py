"""Round 4: ViT-H/14 @224 dedicated sweep (the last config without one).

ViT-H at b8 sits at 448 img/s / 76.2% MFU with the MLP on XLA: its
26.2 MB bf16 MLP weights need n_chunks=4 (ops/fused_mlp.mlp_weight_chunks)
and the chunked kernel loses in-model, so `auto` keeps XLA at EVERY
batch — 26.2 MB exceeds MLP_BIG_WEIGHT_LIMIT (20 MB), so the raised-VMEM
unchunked plan never engages either (mlp_fits_raised is False; the
ViT-L@384 b64 win came from its 16.8 MB weights fitting that plan).
The sweep therefore measures pure batch scaling of the XLA-MLP + fused-
attention dispatch.  RESULT: b32 peaks at ~490 img/s (83.2%), b64 483,
b128 466 — the dip past b32 is NOT an MLP-gate artifact (confirmed by
the b128 auto-vs-mlp=xla tie, perf_vith_r4b.py).

Variants (device-loop timer, MFU vs the 588 img/s ViT-H roofline):

  b8 / b16 / b32 / b64 / b128   production `auto` dispatch
  b8-chunked                    mlp_impl="pallas" (chunked-4 fused MLP)
                                — confirms the ViT-L-derived "oversize
                                models default to XLA" decision on the
                                geometry it actually gates

Run: python experiments/perf_vith_r4.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vit_fpga_tpu.models import vit
from vit_fpga_tpu.utils.timing import time_device_loop

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import vit_flops_per_image  # noqa: E402

IMG = 224
cfg = vit.config("vit_h14", image_size=IMG, dtype="bfloat16")
params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
flops = vit_flops_per_image(cfg)
from vit_fpga_tpu.ops.common import V5E_BF16_FLOPS  # noqa: E402
roof = V5E_BF16_FLOPS / flops
print(f"device: {jax.devices()}  flops/img {flops/1e9:.1f}G  "
      f"roofline {roof:.0f} img/s", flush=True)

cfg_chunked = vit.config("vit_h14", image_size=IMG, dtype="bfloat16",
                         mlp_impl="pallas")

variants = [(f"b{b} auto", cfg, b) for b in (8, 16, 32, 64, 128)]
variants.append(("b8 chunked4", cfg_chunked, 8))

imgs = {}
for _, _, b in variants:
    if b not in imgs:
        imgs[b] = jax.device_put(
            jax.random.normal(jax.random.key(1), (b, IMG, IMG, 3),
                              jnp.float32).astype(jnp.bfloat16))

for r in range(3):
    row = []
    for name, c, b in variants:
        def fwd(p, x, _c=c):
            return vit.forward(p, x, _c)
        t = time_device_loop(fwd, (params, imgs[b]), n_lo=2, n_hi=8)
        row.append(f"{name} {b / t:6.1f} img/s ({b / t / roof * 100:4.1f}%)")
    print(f"round {r}: " + "  |  ".join(row), flush=True)
