"""Round 4: int8 stats chain with bf16 stats tiles (VERDICT r3 item 2).

The round-3 chain measured a 4/4 LOSS with f32 stats tiles (10.8 ->
11.0 ms at ViT-B b64); the diagnosis named the (rows, 128) f32 tile's
~13.6 MB/boundary HBM cost as one of the two causes.  bf16 tiles halve
it.  mu in bf16 keeps ~3 significant digits; the quant path's own error
floor is 1/127, so logits parity is checked at cosine tolerance.

  A  production int8 (_qblock_fast, no chain)
  B  stats chain, f32 tiles (the round-3 measured loss, re-measured)
  C  stats chain, bf16 tiles

Run: python experiments/perf_int8_chain_bf16.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vit_fpga_tpu.models import quantized, vit
from vit_fpga_tpu.ops.common import pad_sublane, round_up
from vit_fpga_tpu.ops.patch_embed import embed_tokens_dotg
from vit_fpga_tpu.utils.timing import time_device_loop

B, IMG = 64, 224
cfg = vit.config("vit_b16", image_size=IMG, dtype="bfloat16")
params = vit.init_params(jax.random.key(0), cfg)
qparams = jax.device_put(quantized.quantize_vit_fast(params))
images = jax.device_put(
    jax.random.normal(jax.random.key(1), (B, IMG, IMG, 3),
                      jnp.float32).astype(jnp.bfloat16))


def embed(qp, im):
    dt = jnp.bfloat16
    n, npre = cfg.seq_len, cfg.num_prefix_tokens
    n_pad = round_up(n, pad_sublane(dt))
    pe = qp["patch_embed"]
    pos = qp["pos_embed"][0].astype(jnp.float32)
    pre = qp["cls_token"][0].astype(jnp.float32)
    posb = jnp.concatenate([
        pre + pos[:npre],
        pos[npre:] + pe["b"].astype(jnp.float32),
        jnp.zeros((n_pad - n, cfg.hidden_dim), jnp.float32)], axis=0)
    wp = (pe["wq"].astype(jnp.float32)
          * pe["ws"].astype(jnp.float32)).astype(dt)
    return embed_tokens_dotg(im.astype(dt), wp, posb, cfg.patch_size, npre)


def head(qp, x):
    pooled = vit._layernorm(x[:, :1], qp["ln_f_scale"], qp["ln_f_bias"],
                            cfg.ln_eps)[:, 0]
    hd = qp["head"]
    w = hd["wq"].astype(jnp.float32) * hd["ws"].astype(jnp.float32)
    return pooled.astype(jnp.float32) @ w + hd["b"].astype(jnp.float32)


def fwd_prod(qp, im):
    return quantized.vit_forward_int8_fast(qp, im, cfg)


def make_chain(stats_dtype):
    def fwd(qp, im):
        x = embed(qp, im)
        x = quantized._encoder_int8_stats_chain(
            x, qp["blocks"], cfg, cfg.seq_len, stats_dtype=stats_dtype)
        return head(qp, x)
    return fwd


print("device:", jax.devices(), flush=True)
fa = jax.jit(fwd_prod)
fb = jax.jit(make_chain(jnp.float32))
fc = jax.jit(make_chain(jnp.bfloat16))
oa = fa(qparams, images)
ob = fb(qparams, images)
oc = fc(qparams, images)
for name, o in (("B chain-f32", ob), ("C chain-bf16", oc)):
    cos = float(jnp.mean(jnp.sum(oa * o, -1)
                         / (jnp.linalg.norm(oa, axis=-1)
                            * jnp.linalg.norm(o, axis=-1) + 1e-30)))
    print(f"{name}: mean cosine vs A = {cos:.6f}", flush=True)

for r in range(4):
    row = []
    for label, fn in (("A prod", fa), ("B f32", fb), ("C bf16", fc)):
        t = time_device_loop(fn, (qparams, images), n_lo=4, n_hi=16)
        row.append(f"{label} {t*1e3:7.3f}ms")
    print(f"round {r}: " + "  ".join(row), flush=True)
