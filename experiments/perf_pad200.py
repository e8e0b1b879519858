"""A/B: token-row pad granularity 16 (n_pad=208, production) vs 8
(n_pad=200) for the bf16 ViT-B/16 @224 b64 throughput path.

Motivation: the padded-residency layout rounds 197 tokens up to the bf16
sublane tile (16 -> 208 rows), so every qkv / MLP / PV GEMM runs 5.6% pad
rows.  Mosaic's hard constraint is only divisibility by 8 (the compact-
layout experiment's NI=4 rejection named it) — padding to 200 instead
would cut the pad waste to 1.5%, ~4% of all non-score MACs (~0.45 ms of
a 13.9 ms step) IF bf16 blocks with a ragged half-tile (200 = 12.5
native 16-row tiles) compile and don't pay masked-op penalties.

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python experiments/perf_pad200.py
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

from vit_fpga_tpu.models import vit
from vit_fpga_tpu.ops import common
from vit_fpga_tpu.utils.timing import time_device_loop

BATCH = 64


def main():
    cfg = vit.config("vit_b16", image_size=224, dtype="bfloat16")
    params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
    images = jax.device_put(
        jax.random.normal(jax.random.key(1), (BATCH, 224, 224, 3),
                          jnp.float32).astype(cfg.compute_dtype))

    def measure(tag):
        # fresh closure each round -> fresh jit cache entry, so the
        # monkeypatched pad granularity is re-traced
        def fwd(p, x):
            return vit.forward(p, x, cfg)

        out = np.asarray(jax.jit(fwd)(params, images), np.float32)
        sec = time_device_loop(fwd, (params, images), n_lo=8, n_hi=18,
                               reps=3)
        print(f"{tag}: {sec * 1e3:8.3f} ms/step  "
              f"{BATCH / sec:8.1f} img/s", flush=True)
        return out, sec

    results = {}
    ref_out = None
    for rnd in range(4):
        for sub, tag in ((16, "A pad16(208)"), (8, "B pad8 (200)")):
            common._PAD_SUBLANE_BF16 = sub
            try:
                out, sec = measure(f"r{rnd} {tag}")
            except Exception as e:  # noqa: BLE001 — report Mosaic rejects
                print(f"r{rnd} {tag}: FAILED: {type(e).__name__}: "
                      f"{str(e)[:300]}")
                common._PAD_SUBLANE_BF16 = 16
                return
            results.setdefault(tag, []).append(sec)
            if ref_out is None:
                ref_out = out
            else:
                d = np.max(np.abs(out - ref_out))
                # the bit-exact claim in docs/perf.md rests on this:
                # fail loudly so a numerics regression can't be logged
                # as a perf win
                assert d == 0.0, f"pad8 parity broke: max|diff| = {d:.3e}"
    common._PAD_SUBLANE_BF16 = 16

    for tag, secs in results.items():
        ms = np.array(secs) * 1e3
        print(f"{tag}: min {ms.min():.3f}  mean {ms.mean():.3f} ms")


if __name__ == "__main__":
    main()
