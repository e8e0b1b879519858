"""ViT-L/16 @384 b16 (BASELINE config 4): can the stats-epilogue chain
carry a big-weight MLP kernel past the XLA-MLP baseline?

The per-layer dispatch keeps XLA for the MLP at this geometry (chunked
measured 43.45 vs 41.26 ms full-model; raised-unchunked 411 -> 396
img/s — docs/perf.md).  The chain changes both sides of the ledger:
the attention kernel loses its LN reductions, and the chunked variant
saves its PER-CHUNK LN reductions (n_chunks x the unchunked saving).

A: production forward, chain forced OFF (per-layer kernels, XLA MLP)
B: chain ON with chunked-stats MLP (-2)
C: chain ON with raised-VMEM unchunked stats MLP (48 MB plan)
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vit_fpga_tpu.models import vit
from vit_fpga_tpu.ops.fused_mlp import MLP_BIG_VMEM
from vit_fpga_tpu.utils.timing import time_device_loop_single

B = 16


def main():
    cfg = vit.config("vit_l16", image_size=384, dtype="bfloat16")
    params = vit.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, 384, 384, 3)), jnp.float32)

    real_supported = vit._stats_chain_supported
    real_vmem = vit._stats_chain_mlp_vmem

    def forced(plan):
        if plan is None:
            vit._stats_chain_supported = lambda *a: False
        else:
            vit._stats_chain_supported = lambda *a: True
            vit._stats_chain_mlp_vmem = lambda *a: plan
        try:
            f = jax.jit(lambda p, im: vit.forward(p, im, cfg))
            out = f(params, images)
            jax.block_until_ready(out)
            return f, out
        finally:
            vit._stats_chain_supported = real_supported
            vit._stats_chain_mlp_vmem = real_vmem

    fA, oA = forced(None)
    fB, oB = forced(-2)
    fC, oC = forced(MLP_BIG_VMEM)
    a = np.asarray(oA, np.float32)
    for name, o in (("B", oB), ("C", oC)):
        err = np.abs(a - np.asarray(o, np.float32)).max() / (
            np.abs(a).max() + 1e-6)
        print(f"parity {name} vs A: rel err {err:.2e}", flush=True)

    args = (params, images)
    for rnd in range(4):
        tA = time_device_loop_single(fA, args, n=8)
        tB = time_device_loop_single(fB, args, n=8)
        tC = time_device_loop_single(fC, args, n=8)
        print(f"round {rnd}: A(xla-mlp) {tA*1e3:7.2f} ms  "
              f"B(chain+chunked) {tB*1e3:7.2f}  "
              f"C(chain+raised) {tC*1e3:7.2f}  "
              f"[{B/tA:.0f} / {B/tB:.0f} / {B/tC:.0f} img/s]", flush=True)


if __name__ == "__main__":
    main()
