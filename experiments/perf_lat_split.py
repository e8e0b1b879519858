"""Batch-1 model-level overhead split: full int8 model (195 us) vs the
bare encoder (167 us) — where do the ~28 us go?

  noop    jitted scalar mul (per-dispatch floor through the runtime)
  patch   astype + patchify + pad (the XLA prep before any kernel)
  embed   patch + fused embed kernel (embed_tokens_pallas)
  head    final-LN slice + int8 head GEMM on a (1, D) row
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.models import quantized, vit
from vit_fpga_tpu.utils.timing import time_device_loop_single

cfg = vit.config("vit_b16", image_size=224, dtype="bfloat16")


def main():
    params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
    qp = jax.device_put(quantized.quantize_vit_fast(params))
    imgs = jax.device_put(jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 224, 224, 3)),
        jnp.float32))
    toks = jax.device_put(jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 197, 768)) * 0.1,
        jnp.bfloat16))

    @jax.jit
    def noop(p, x):
        return x[:, :8, :8, 0] * 1.0001

    @jax.jit
    def patch(p, x):
        dt = jnp.bfloat16
        pch = vit.patchify(x.astype(dt), cfg.patch_size)
        return jnp.pad(pch, [(0, 0), (1, 208 - 197), (0, 0)])

    @jax.jit
    def embed(p, x):
        return vit._fused_embed(p, x, cfg, 208)

    @jax.jit
    def head(p, t):
        cls_t = vit._layernorm(t[:, :1], p["ln_f_scale"],
                               p["ln_f_bias"], cfg.ln_eps)
        hd = p["head"]
        return quantized._fused_lin(cls_t, hd["wq"], hd["ws"],
                                    hd["b"])[:, 0]

    fns = [("noop", noop, (params, imgs)),
           ("patch", patch, (params, imgs)),
           ("embed", embed, (params, imgs)),
           ("head", head, (qp, toks))]
    for f in fns:
        jax.block_until_ready(f[1](*f[2]))
    for rnd in range(4):
        line = []
        for name, f, a in fns:
            t = time_device_loop_single(f, a, n=512)
            line.append(f"{name} {t * 1e6:6.1f}")
        print(f"round {rnd}: " + "  ".join(line) + "  (us)", flush=True)


if __name__ == "__main__":
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    main()
