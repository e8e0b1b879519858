"""Round 4: ViT-B bf16 batch-scaling curve (roadmap #1 / VERDICT r3 1b).

Does larger batch amortize the M=200 fill/drain losses the ceiling
microbench localized?  Measured (same session, production dispatch):

    b64   13.43 ms   4764 img/s   84.9% MFU
    b128  26.70 ms   4793 img/s   85.5% MFU
    b256  53.31 ms   4802 img/s   85.6% MFU

Only +0.7 MFU points for 4x the batch: the per-image GEMM shapes are
unchanged (the attention grid is per-image cells; the MLP row count
scales but was already past its efficiency knee at 12.8k rows), so the
curve flattens at ~85.6% — consistent with the ~84-85% shape-adjusted
ceiling (docs/perf.md, experiments/perf_gemm_ceiling.py).  The b64
headline geometry is not leaving meaningful batch-amortizable time on
the table; no imgs=8 attention-tier retune is warranted (the 48 MB
multi tier already ties at imgs=4, and the 2-img variant loses at
ViT-L@384 — perf_l384_r4.py).

Run: python experiments/perf_batch_scaling.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import vit_flops_per_image
from vit_fpga_tpu.models import vit
from vit_fpga_tpu.utils.timing import time_device_loop_single

cfg = vit.config("vit_b16", image_size=224, dtype="bfloat16")
params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
PEAK = 197e12
fpi = vit_flops_per_image(cfg)
print("device:", jax.devices(), flush=True)
for b in (64, 128, 256):
    images = jax.device_put(jax.random.normal(
        jax.random.key(1), (b, 224, 224, 3),
        jnp.float32).astype(jnp.bfloat16))
    fwd = lambda p, x: vit.forward(p, x, cfg)  # noqa: E731
    t = time_device_loop_single(fwd, (params, images), n=8, reps=3)
    ips = b / t
    print(f"ViT-B bf16 b{b}: {t*1e3:8.2f} ms  {ips:7.1f} img/s "
          f"({100 * ips * fpi / PEAK:5.1f}% MFU)", flush=True)
    jax.clear_caches()
