"""Int8 stats-epilogue chain A/B (ViT-B/16 @224 b64, BASELINE config 3).

The int8 mega-kernels are VPU-bound (int8 MXU runs 2x, quant/LN/softmax
VPU stays — 53.5% of the int8 roofline), so deleting each half's LN
reduction preamble attacks the binding resource directly, unlike the
bf16 chain where it merely shaved near-roofline fat.

A: plain int8 mega-kernels (round-2 path, chain forced off)
B: int8 stats chain

RESULT (4 rounds, v5e, b64): B LOSES 4/4 (10.8 -> 11.0 ms; 5910 vs
5820 img/s).  The chain only MOVES each LN reduction into the
producer's epilogue, where it must hide behind tail MXU work; the int8
halves have half the MXU time of bf16, so the epilogue is exposed, and
the (rows, 128) f32 stats tile adds ~13.6 MB of HBM traffic per layer
boundary.  The production gate is off (_INT8_STATS_CHAIN=False in
models/quantized.py); the kernels remain tested capability.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vit_fpga_tpu.models import quantized, vit
from vit_fpga_tpu.utils.timing import time_device_loop_single

B = 64


def main():
    cfg = vit.config("vit_b16", image_size=224, dtype="bfloat16")
    params = vit.init_params(jax.random.key(0), cfg)
    qparams = quantized.quantize_vit_fast(params)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, 224, 224, 3)), jnp.float32)

    quantized._INT8_STATS_CHAIN = True   # force-enable for the A/B
    real = quantized._int8_stats_chain_supported
    assert real(cfg, B), "chain must be supported at this geometry"

    def build(chain_on):
        quantized._int8_stats_chain_supported = real if chain_on else (
            lambda *a: False)
        try:
            f = jax.jit(lambda q, im: quantized.vit_forward_int8_fast(
                q, im, cfg))
            out = jax.block_until_ready(f(qparams, images))
            return f, out
        finally:
            quantized._int8_stats_chain_supported = real

    fA, oA = build(False)
    fB, oB = build(True)
    a = np.asarray(oA, np.float32)
    bb = np.asarray(oB, np.float32)
    err = np.abs(a - bb).max() / (np.abs(a).max() + 1e-6)
    num = (a * bb).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(bb, axis=-1) + 1e-9
    print(f"parity B vs A: rel err {err:.2e}, cosine min "
          f"{(num / den).min():.5f}", flush=True)

    args = (qparams, images)
    for rnd in range(4):
        tA = time_device_loop_single(fA, args, n=8)
        tB = time_device_loop_single(fB, args, n=8)
        print(f"round {rnd}: A(plain) {tA*1e3:7.2f} ms  "
              f"B(chain) {tB*1e3:7.2f}  "
              f"[{B/tA:.0f} / {B/tB:.0f} img/s]", flush=True)


if __name__ == "__main__":
    main()
