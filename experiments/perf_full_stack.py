"""A/B: separate embed/encoder/head launches vs the ONE-kernel forward.

A  bf16 forward_latency          (fused embed + stack kernel + XLA head)
B  bf16 forward_latency_logits   (one pallas_call, prep folded outside)
C  int8 vit_forward_int8_latency (fused embed + int8 stack + int8 head)
D  int8 vit_forward_int8_latency_logits (one pallas_call)

n=256 device loops (tunnel-jitter-proof), 4 rounds, serialized.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.models import quantized, vit
from vit_fpga_tpu.utils.timing import time_device_loop_single


def main():
    cfg = vit.config("vit_b16", image_size=224, dtype="bfloat16")
    params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
    qp = jax.device_put(quantized.quantize_vit_fast(params))
    prep = jax.device_put(vit.prep_full_latency(params, cfg))
    qprep = jax.device_put(quantized.prep_full_int8_latency(qp, cfg))
    imgs = jax.device_put(jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 224, 224, 3)),
        jnp.float32))

    fns = {
        "A_bf16_stack": (jax.jit(lambda p, x: vit.forward_latency(
            p, x, cfg)), (params, imgs)),
        "B_bf16_full": (jax.jit(lambda p, x: vit.forward_latency_logits(
            p, x, cfg)), (prep, imgs)),
        "C_int8_stack": (jax.jit(
            lambda p, x: quantized.vit_forward_int8_latency(p, x, cfg)),
            (qp, imgs)),
        "D_int8_full": (jax.jit(
            lambda p, x: quantized.vit_forward_int8_latency_logits(
                p, x, cfg)), (qprep, imgs)),
    }
    # parity check before timing
    outs = {}
    for k, (f, a) in fns.items():
        o = np.asarray(f(*a), np.float32)
        outs[k] = o if o.ndim == 2 else o.reshape(1, -1)
    ra = outs["A_bf16_stack"]
    rb = outs["B_bf16_full"]
    err = np.abs(ra - rb).max() / (np.abs(ra).max() + 1e-6)
    print(f"bf16 full-vs-stack rel err: {err:.2e}", flush=True)
    rc, rd = outs["C_int8_stack"], outs["D_int8_full"]
    cos = float((rc * rd).sum()
                / (np.linalg.norm(rc) * np.linalg.norm(rd) + 1e-9))
    print(f"int8 full-vs-stack cosine: {cos:.5f}", flush=True)

    for rnd in range(4):
        line = []
        for k, (f, a) in fns.items():
            t = time_device_loop_single(f, a, n=256)
            line.append(f"{k} {t * 1e6:6.1f}")
        print(f"round {rnd}: " + "  ".join(line) + "  (us)", flush=True)


if __name__ == "__main__":
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    main()
