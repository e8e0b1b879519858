"""Int8 mega-kernel timing at ViT-B/16 b64 geometry vs bf16 kernels."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from vit_fpga_tpu.ops import attn_block as ab
from vit_fpga_tpu.ops import quant_block as qb
from vit_fpga_tpu.ops.fused_mlp import fused_mlp_pallas
from vit_fpga_tpu.ops.quant_fused import quantize_weight_colwise
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H, M = 64, 197, 768, 12, 3072
ks = jax.random.split(jax.random.key(0), 12)
x3 = jax.device_put(jax.random.normal(ks[0], (B, N, D), jnp.bfloat16))
x2 = jax.device_put(x3.reshape(B * N, D))
ls = jnp.ones((D,), jnp.float32); lb = jnp.zeros((D,), jnp.float32)
wqkv = np.asarray(jax.random.normal(ks[1], (D, 3 * D)) * 0.02, np.float32)
wo = np.asarray(jax.random.normal(ks[2], (D, D)) * 0.02, np.float32)
w1 = np.asarray(jax.random.normal(ks[3], (D, M)) * 0.02, np.float32)
w2 = np.asarray(jax.random.normal(ks[4], (M, D)) * 0.02, np.float32)
bqkv = jnp.zeros((3 * D,), jnp.float32); bo = jnp.zeros((D,), jnp.float32)
b1 = jnp.zeros((M,), jnp.float32); b2 = jnp.zeros((D,), jnp.float32)

wqkv_q, wqkv_s = (jnp.asarray(a) for a in quantize_weight_colwise(wqkv))
wo_q, wo_s = (jnp.asarray(a) for a in quantize_weight_colwise(wo))
w1_q, w1_s = (jnp.asarray(a) for a in quantize_weight_colwise(w1))
w2_q, w2_s = (jnp.asarray(a) for a in quantize_weight_colwise(w2))
wqkv_b = jax.device_put(jnp.asarray(wqkv, jnp.bfloat16))
wo_b = jax.device_put(jnp.asarray(wo, jnp.bfloat16))
w1_b = jax.device_put(jnp.asarray(w1, jnp.bfloat16))
w2_b = jax.device_put(jnp.asarray(w2, jnp.bfloat16))


def rep(name, fn, args):
    t = time_device_loop_single(fn, args, n=16, reps=3)
    print(f"{name:34s} {t*1e3:7.3f} ms", flush=True)


rep("attn bf16 (current)",
    lambda ls, lb, wq, bq, wo, bo, x: ab.attn_block_pallas(
        x, ls, lb, wq, bq, wo, bo, H),
    (ls, lb, wqkv_b, bqkv, wo_b, bo, x3))
rep("attn int8 mega",
    lambda ls, lb, wq, ws, bq, wo, wos, bo, x: qb.attn_block_int8(
        x, ls, lb, wq, ws, bq, wo, wos, bo, H),
    (ls, lb, wqkv_q, wqkv_s, bqkv, wo_q, wo_s, bo, x3))
rep("mlp bf16 bt512 (current)",
    lambda ls, lb, w1, b1, w2, b2, x: fused_mlp_pallas(
        x, ls, lb, w1, b1, w2, b2, act="gelu_tanh"),
    (ls, lb, w1_b, b1, w2_b, b2, x2))
for bt in (256, 512):
    rep(f"mlp int8 mega bt={bt}",
        lambda ls, lb, w1q, w1s, b1, w2q, w2s, b2, x, _bt=bt:
        qb.mlp_block_int8(x, ls, lb, w1q, w1s, b1, w2q, w2s, b2,
                          act="gelu_tanh", block_t=_bt),
        (ls, lb, w1_q, w1_s, b1, w2_q, w2_s, b2, x2))
