"""Round 4 follow-up: attribute the ViT-H b128 dip to the MLP dispatch.

perf_vith_r4.py: b32 peaks at ~490 img/s (83.2%), b64 483, b128 466.
b128 is the only row that crosses the 32768-row raised-VMEM gate
(models/vit.py:294) with ViT-H's 26.2 MB n_chunks=4 MLP weights — the
gate was tuned on ViT-L@384 (16.8 MB weights) where it WON.  Same-
geometry A/B decides whether the gate needs a weight-size cap:

  b128 auto     production dispatch (raised unchunked fused stats MLP)
  b128 mlp=xla  identical but the MLP on XLA
  b32  auto     same-session control (the sweep's peak)

Run: python experiments/perf_vith_r4b.py
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

from bench import vit_flops_per_image  # noqa: E402
from vit_fpga_tpu.ops.common import V5E_BF16_FLOPS  # noqa: E402

IMG = 224
cfg = vit.config("vit_h14", image_size=IMG, dtype="bfloat16")
cfg_xla = vit.config("vit_h14", image_size=IMG, dtype="bfloat16",
                     mlp_impl="xla")
params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
flops = vit_flops_per_image(cfg)
roof = V5E_BF16_FLOPS / flops
print(f"device: {jax.devices()}  roofline {roof:.0f} img/s", flush=True)

variants = [("b128 auto   ", cfg, 128), ("b128 mlp=xla", cfg_xla, 128),
            ("b32 auto    ", cfg, 32)]
imgs = {}
for _, _, b in variants:
    if b not in imgs:
        imgs[b] = jax.device_put(
            jax.random.normal(jax.random.key(1), (b, IMG, IMG, 3),
                              jnp.float32).astype(jnp.bfloat16))

for r in range(4):
    row = []
    for name, c, b in variants:
        def fwd(p, x, _c=c):
            return vit.forward(p, x, _c)
        t = time_device_loop(fwd, (params, imgs[b]), n_lo=2, n_hi=8)
        row.append(f"{name} {b / t:6.1f} img/s ({b / t / roof * 100:4.1f}%)")
    print(f"round {r}: " + "  |  ".join(row), flush=True)
