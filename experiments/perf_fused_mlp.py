"""fused_mlp_pallas vs XLA on ViT-B shapes (real TPU)."""
import sys
import jax
import jax.numpy as jnp
from functools import partial

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops.fused_mlp import fused_mlp_pallas, fused_mlp_xla
from vit_fpga_tpu.utils.timing import time_device_loop_single

T, D, M = 64 * 256, 768, 3072  # batch 64, padded seq 256
key = jax.random.key(0)
ks = jax.random.split(key, 6)
x = jax.device_put(jax.random.normal(ks[0], (T, D), jnp.bfloat16))
s = jax.device_put(jnp.ones((D,), jnp.float32))
b = jax.device_put(jnp.zeros((D,), jnp.float32))
w1 = jax.device_put(jax.random.normal(ks[1], (D, M), jnp.bfloat16) * 0.03)
b1 = jax.device_put(jnp.zeros((M,), jnp.float32))
w2 = jax.device_put(jax.random.normal(ks[2], (M, D), jnp.bfloat16) * 0.03)
b2 = jax.device_put(jnp.zeros((D,), jnp.float32))

flops = 4 * T * D * M

def report(name, fn):
    t = time_device_loop_single(fn, (s, b, w1, b1, w2, b2, x), n=16,
                                reps=3)
    print(f"{name:28s} {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)

def xla(s, b, w1, b1, w2, b2, x):
    return fused_mlp_xla(x, s, b, w1, b1, w2, b2)

# erf variant measured: 1.435ms / 107.7 TF/s

def xla_tanh(s, b, w1, b1, w2, b2, x):
    return fused_mlp_xla(x, s, b, w1, b1, w2, b2, act="gelu_tanh")
report("xla mlp (tanh gelu)", xla_tanh)
for bt in (512,):
    report(f"pallas fused tanh bt={bt}",
           partial(lambda s, b, w1, b1, w2, b2, x, bt: fused_mlp_pallas(
               x, s, b, w1, b1, w2, b2, act="gelu_tanh", block_t=bt),
               bt=bt))
