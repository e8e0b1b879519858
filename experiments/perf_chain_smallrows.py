"""Does the chunked-stats chain default help or hurt at the OTHER
big-weight, few-row geometries it now captures (perf_l384_chain.py only
measured ViT-L/16@384 b16)?

- ViT-H/14 @224 b8: d=1280, mlp 5120 (26 MB weights), dh=80 — per-layer
  dispatch previously used the XLA MLP here (chunked gate).
- CLIP-L/14 @224 b16: small-batch serving rows (16*272=4352), below the
  32k-row threshold of the raised-VMEM unchunked stats plan.

A: chain forced OFF (per-layer kernels, XLA MLP where gated)
B: chain ON with the production plan (chunked-stats at these rows)

RESULT (4 rounds each, v5e): vit_h14 b8 (n_chunks=4) chain LOSES 4/4
(18.5 -> 19.1 ms); vit_l14 clip-geom b16 (n_chunks=2) chain WINS 4/4
(17.18 -> 17.04 ms).  The dispatch gates the chunked-stats chain to
n_chunks == 2 accordingly (models/vit.py _stats_chain_mlp_vmem).
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vit_fpga_tpu.models import vit
from vit_fpga_tpu.utils.timing import time_device_loop_single


def bench(name, cfg, batch):
    params = vit.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(batch, cfg.image_size, cfg.image_size, 3)),
        jnp.float32)
    plan = vit._stats_chain_mlp_vmem(
        cfg, batch * ((cfg.seq_len + 15) // 16 * 16))
    print(f"{name}: production chain plan = {plan}", flush=True)

    real = vit._stats_chain_supported

    def build(chain_on):
        vit._stats_chain_supported = real if chain_on else (
            lambda *a: False)
        try:
            f = jax.jit(lambda p, im: vit.forward(p, im, cfg))
            out = jax.block_until_ready(f(params, images))
            return f, out
        finally:
            vit._stats_chain_supported = real

    fA, oA = build(False)
    fB, oB = build(True)
    a = np.asarray(oA, np.float32)
    err = np.abs(a - np.asarray(oB, np.float32)).max() / (
        np.abs(a).max() + 1e-6)
    print(f"{name}: parity B vs A rel err {err:.2e}", flush=True)
    args = (params, images)
    for rnd in range(4):
        tA = time_device_loop_single(fA, args, n=8)
        tB = time_device_loop_single(fB, args, n=8)
        print(f"{name} round {rnd}: A(off) {tA*1e3:7.2f} ms  "
              f"B(chain) {tB*1e3:7.2f}  "
              f"[{batch/tA:.0f} / {batch/tB:.0f} img/s]", flush=True)


def main():
    bench("vit_h14@224 b8", vit.config("vit_h14", image_size=224,
                                       dtype="bfloat16"), 8)
    # CLIP-L vision-tower geometry (d=1024, mlp=4096, quick_gelu, seq 257)
    bench("vit_l14(clip-geom)@224 b16",
          vit.config("vit_l14", image_size=224, dtype="bfloat16",
                     hidden_act="quick_gelu", ln_eps=1e-5), 16)


if __name__ == "__main__":
    main()
