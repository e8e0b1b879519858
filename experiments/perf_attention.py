"""Standalone attention-path cost on ViT-B shapes (real TPU)."""
import sys
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops.attention import mha_qkv_pallas, mha_qkv_xla
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D = 64, 197, 768
qkv = jax.device_put(
    jax.random.normal(jax.random.key(0), (B, N, 3 * D), jnp.bfloat16))

flops = 2 * 2 * B * 12 * 256 * 256 * 64  # padded

def report(name, fn):
    t = time_device_loop_single(fn, (qkv,), n=24, reps=3)
    print(f"{name:28s} {t*1e3:7.3f} ms  ({flops/t/1e12:5.1f} TF/s)",
          flush=True)

report("mha_qkv pallas", lambda q: mha_qkv_pallas(q, 12))
report("mha_qkv xla", lambda q: mha_qkv_xla(q, 12))
