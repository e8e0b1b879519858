"""Differential cost of embed and head inside the full ViT-B forward.

The standalone breakdown numbers for tiny stages are inflated by the
device-loop timer's serial-feedback pass over the big input tensor, so
measure full-forward minus forward-without-stage instead.
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.models import vit
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, IMG = 64, 224
cfg = vit.config("vit_b16", image_size=IMG, dtype="bfloat16")
params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
images = jax.device_put(jax.random.normal(
    jax.random.key(1), (B, IMG, IMG, 3), jnp.float32).astype(jnp.bfloat16))
tokens = jax.device_put(jax.random.normal(
    jax.random.key(2), (B, cfg.seq_len, cfg.hidden_dim),
    jnp.float32).astype(jnp.bfloat16))


def full(p, x):
    return vit.forward(p, x, cfg)


def no_head(p, x):
    # encoder + CLS slice, but no final LN / head GEMM
    with vit._precision_ctx(cfg):
        toks = vit._forward_features(p, x, cfg)
        return toks[:, 0]


def blocks_from_tokens(p, t):
    # blocks + head, skipping patchify/embed/cls/pos (tokens given)
    with vit._precision_ctx(cfg):
        from functools import partial
        from vit_fpga_tpu.ops.common import round_up
        n = cfg.seq_len
        n_pad = round_up(n, 16)
        h = jnp.pad(t, [(0, 0), (0, n_pad - n), (0, 0)])
        for i in range(cfg.depth):
            blk = jax.tree_util.tree_map(lambda a: a[i], p["blocks"])
            h = vit._block(h, blk, cfg, n_valid=n)
        pooled = vit._layernorm(h[:, :1], p["ln_f_scale"],
                                p["ln_f_bias"], cfg.ln_eps)[:, 0]
        return (pooled.astype(jnp.float32) @ p["head"]["kernel"]
                + p["head"]["bias"])


for rnd in range(3):
    tf = time_device_loop_single(full, (params, images), n=10, reps=3)
    tnh = time_device_loop_single(no_head, (params, images), n=10, reps=3)
    tbt = time_device_loop_single(blocks_from_tokens, (params, tokens),
                                  n=10, reps=3)
    print(f"full {tf * 1e3:7.3f}  no_head {tnh * 1e3:7.3f} "
          f"(head={((tf - tnh) * 1e3):+6.3f})  "
          f"blocks+head {tbt * 1e3:7.3f} "
          f"(embed={((tf - tbt) * 1e3):+6.3f})", flush=True)
