"""Round 4: decompose the embed+head 0.32 ms (vs 0.15 ideal) at ViT-B b64.

docs/perf.md's accounting table attributes a 0.17 ms/step gap to
"embed + head".  bench.py feeds pre-normalized bf16 images, so the embed
chain is: dotg GEMM -> posb epilogue add -> CONCATENATE of prefix/tail
rows into the padded (B, 200, D) residency layout.  The concat is a
candidate full-copy (19.6 MB bf16 read+write ~48 us if unfused).  The
head chain is: CLS-row LayerNorm -> (64, 768) x (768, 1000) GEMM.

Variants timed with the tunnel-proof device loop:
  A  embed full      — embed_tokens_dotg as production runs it
  B  dot only        — the multi-contracting dot_general alone (f32 out)
  C  dot+posb        — B plus the rank-matched posb add + cast (no concat)
  D  dus assemble    — dot+posb written into a zeros（B,200,D) buffer via
                       dynamic_update_slice instead of concatenate
  E  head only       — CLS LN + head GEMM on a (B, 200, D) token tensor
  F  full forward    — production forward (for the sum check)
  G  features only   — forward minus final LN/head

Run: python experiments/perf_embed_r4.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vit_fpga_tpu.models import vit
from vit_fpga_tpu.models.vit import _fused_embed, _layernorm
from vit_fpga_tpu.ops.patch_embed import embed_tokens_dotg
from vit_fpga_tpu.utils.timing import time_device_loop

B, IMG = 64, 224
cfg = vit.config("vit_b16", image_size=IMG, dtype="bfloat16")
params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
images = jax.device_put(
    jax.random.normal(jax.random.key(1), (B, IMG, IMG, 3),
                      jnp.float32).astype(jnp.bfloat16))

n, d = cfg.seq_len, cfg.hidden_dim
n_pad = 200
patch = cfg.patch_size
gh = gw = IMG // patch
npch = gh * gw

kernel = params["patch_embed"]["kernel"].astype(jnp.bfloat16)
pos = params["pos_embed"][0].astype(jnp.float32)
bias = params["patch_embed"]["bias"].astype(jnp.float32)
pre = params["cls_token"][0].astype(jnp.float32)
posb = jnp.concatenate([
    pre + pos[:1], pos[1:] + bias,
    jnp.zeros((n_pad - n, d), jnp.float32)], axis=0)


def emb_full(kernel, posb, images):
    return embed_tokens_dotg(images, kernel, posb, patch, 1)


def dot_only(kernel, posb, images):
    x5 = images.reshape(B, gh, patch, gw, patch * 3)
    k3 = kernel.reshape(patch, patch * 3, d)
    y = jax.lax.dot_general(x5, k3, (((2, 4), (0, 1)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y.astype(jnp.bfloat16)


def dot_posb(kernel, posb, images):
    x5 = images.reshape(B, gh, patch, gw, patch * 3)
    k3 = kernel.reshape(patch, patch * 3, d)
    y = jax.lax.dot_general(x5, k3, (((2, 4), (0, 1)), ((), ())),
                            preferred_element_type=jnp.float32)
    pb4 = posb[1:1 + npch].reshape(1, gh, gw, d)
    return (y + pb4).astype(jnp.bfloat16).reshape(B, npch, d)


def dus_assemble(kernel, posb, images):
    body = dot_posb(kernel, posb, images)
    out = jnp.broadcast_to(
        posb.astype(jnp.bfloat16)[None], (B, n_pad, d))
    return jax.lax.dynamic_update_slice(out, body, (0, 1, 0))


def head_only(params, toks):
    pooled = _layernorm(toks[:, :1], params["ln_f_scale"],
                        params["ln_f_bias"], cfg.ln_eps)[:, 0]
    return (pooled.astype(jnp.float32) @ params["head"]["kernel"]
            + params["head"]["bias"])


def features_only(params, images):
    return vit._forward_features(params, images, cfg)


toks = jax.device_put(jax.random.normal(
    jax.random.key(2), (B, n_pad, d), jnp.float32).astype(jnp.bfloat16))

cases = [
    ("A embed full", emb_full, (kernel, posb, images)),
    ("B dot only", jax.jit(dot_only), (kernel, posb, images)),
    ("C dot+posb", jax.jit(dot_posb), (kernel, posb, images)),
    ("D dus assemble", jax.jit(dus_assemble), (kernel, posb, images)),
    ("E head only", jax.jit(head_only), (params, toks)),
    ("F full forward", jax.jit(lambda p, im: vit.forward(p, im, cfg)),
     (params, images)),
    ("G features only", jax.jit(features_only), (params, images)),
]

for name, fn, args in cases:
    # fori-loop timer needs last arg to be the perturbed one; reorder so
    # images/toks (same dtype in/out not required — sum cast handles it)
    t = time_device_loop(lambda *a, _f=fn: _f(*a), args, n_lo=8, n_hi=40)
    print(f"{name:18s} {t * 1e6:9.1f} us")
