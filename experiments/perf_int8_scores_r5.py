"""Round 5b: int8 SCORE/PV GEMMs on the static-scale datapath — A/B.

The static tree's calibrated q/k/v scales remove every per-row/per-col
quant reduce that made DYNAMIC int8 scores a measured loss
(perf_attn_int8scores.py): the qkv panel is emitted straight in the
quant domain, QK^T and PV run on the int8 MXU at 2x the bf16 rate, and
all dequants are scalars.  This A/Bs the full model and the isolated
attention half, static bf16-scores vs static int8-scores.

Run: python experiments/perf_int8_scores_r5.py
"""
import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vit_fpga_tpu.models import quantized, vit
from vit_fpga_tpu.ops import quant_block as qb
from vit_fpga_tpu.utils.timing import time_device_loop

B, IMG = 64, 224
cfg = vit.config("vit_b16", image_size=IMG, dtype="bfloat16")
params = vit.init_params(jax.random.key(0), cfg)
qparams = jax.device_put(quantized.quantize_vit_static(params, cfg))
images = jax.device_put(
    jax.random.normal(jax.random.key(1), (B, IMG, IMG, 3),
                      jnp.float32).astype(jnp.bfloat16))


def run(label, fn, args):
    t = time_device_loop(fn, args, n_lo=4, n_hi=20)
    print(f"{label:48s} {t * 1e3:8.3f} ms", flush=True)
    return t


print("device:", jax.devices())

# --- full model ---
for scores, label in ((False, "A full model, static bf16 scores"),
                      (True, "B full model, static INT8 scores")):
    quantized._INT8_SCORES = scores
    jax.clear_caches()
    fwd = jax.jit(lambda p, im: quantized.vit_forward_int8_fast(p, im, cfg))
    out = fwd(qparams, images)
    t = run(label, fwd, (qparams, images))
    print(f"    -> {B / t:8.1f} img/s")
quantized._INT8_SCORES = True

# --- isolated attention half, 12 layers ---
blk = jax.tree_util.tree_map(lambda a: a[0], qparams["blocks"])
n, d = cfg.seq_len, cfg.hidden_dim
x = jax.device_put(jax.random.normal(
    jax.random.key(2), (B, 200, d), jnp.float32).astype(jnp.bfloat16))

att_a = jax.jit(lambda xx: functools.reduce(
    lambda acc, _: qb.attn_block_int8_static(
        acc, blk["inv_ao"], blk["ln1_scale"], blk["ln1_bias"],
        blk["wqkv_q"], blk["wqkv_s"], blk["bqkv"], blk["wo_q"],
        blk["wo_s"], blk["bo"], cfg.num_heads, eps=cfg.ln_eps,
        n_valid=n), range(12), xx))
att_b = jax.jit(lambda xx: functools.reduce(
    lambda acc, _: qb.attn_block_int8_static_scores(
        acc, blk["sc_qk"], blk["pv_fold"], blk["ln1_scale"],
        blk["ln1_bias"], blk["wqkv_q"], blk["wqkv_qs"], blk["bqkv_qs"],
        blk["wo_q"], blk["wo_s"], blk["bo"], cfg.num_heads,
        eps=cfg.ln_eps, n_valid=n), range(12), xx))
att_a(x)
att_b(x)
run("C attn half x12, static bf16 scores", att_a, (x,))
run("D attn half x12, static INT8 scores", att_b, (x,))
