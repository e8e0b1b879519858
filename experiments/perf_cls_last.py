"""A/B: int8 batch-1 latency path — old XLA chain (embed _fused_lin ->
concat cls -> +pos -> pad -> stack -> slice) vs cls-last (patchify ->
one embed kernel -> stack, no copies).  Also stage-level: embed old vs
embed new."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import vit_fpga_tpu.ops.patch_embed as pe
from vit_fpga_tpu.models import quantized, vit
from vit_fpga_tpu.utils.timing import time_device_loop_single

cfg = vit.config("vit_b16", image_size=224, dtype="bfloat16")


def main():
    params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
    qp = jax.device_put(quantized.quantize_vit_fast(params))
    fold = jax.device_put(quantized.prep_int8_latency(qp, cfg))
    imgs = jax.device_put(jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 224, 224, 3)),
        jnp.float32))

    @jax.jit
    def new_full(p, x):
        return quantized.vit_forward_int8_latency(p, x, cfg)

    @jax.jit
    def old_full(p, x):
        # pre-cls-last chain, reconstructed
        from vit_fpga_tpu.ops.vit_stack import vit_layers_int8_pallas
        dt = jnp.bfloat16
        t = vit.patchify(x.astype(dt), cfg.patch_size)
        pet = p["patch_embed"]
        t = quantized._fused_lin(t, pet["wq"], pet["ws"], pet["b"])
        b = t.shape[0]
        cls = jnp.broadcast_to(p["cls_token"].astype(dt),
                               (b, 1, cfg.hidden_dim))
        t = jnp.concatenate([cls, t], axis=1)
        t = t + p["pos_embed"].astype(dt)
        toks = vit_layers_int8_pallas(t, p["blocks"], cfg.num_heads,
                                      eps=cfg.ln_eps, act="gelu_tanh")
        cls_t = vit._layernorm(toks[:, :1], p["ln_f_scale"],
                               p["ln_f_bias"], cfg.ln_eps)
        hd = p["head"]
        return quantized._fused_lin(cls_t, hd["wq"], hd["ws"],
                                    hd["b"])[:, 0].astype(jnp.float32)

    @jax.jit
    def embed_new(p, x):
        pch = vit.patchify(x.astype(jnp.bfloat16), cfg.patch_size)
        return pe.embed_tokens_int8_cls_last(pch, p["wpq_cl"],
                                             p["wps_cl"], p["posb_cl"])

    @jax.jit
    def embed_old(p, x):
        dt = jnp.bfloat16
        t = vit.patchify(x.astype(dt), cfg.patch_size)
        pet = p["patch_embed"]
        t = quantized._fused_lin(t, pet["wq"], pet["ws"], pet["b"])
        b = t.shape[0]
        cls = jnp.broadcast_to(p["cls_token"].astype(dt),
                               (b, 1, cfg.hidden_dim))
        t = jnp.concatenate([cls, t], axis=1)
        t = t + p["pos_embed"].astype(dt)
        return jnp.pad(t, [(0, 0), (0, 208 - 197), (0, 0)])

    fns = [("new_full", new_full, (fold, imgs)),
           ("old_full", old_full, (qp, imgs)),
           ("embed_new", embed_new, (fold, imgs)),
           ("embed_old", embed_old, (qp, imgs))]
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
