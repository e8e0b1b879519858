import sys
import jax, jax.numpy as jnp
from functools import partial
sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops.fused_mlp import fused_mlp_pallas
from vit_fpga_tpu.utils.timing import time_device_loop_single

T, D, M = 64 * 256, 768, 3072
ks = jax.random.split(jax.random.key(0), 3)
x = jax.device_put(jax.random.normal(ks[0], (T, D), jnp.bfloat16))
s = jnp.ones((D,), jnp.float32); b = jnp.zeros((D,), jnp.float32)
w1 = jax.device_put(jax.random.normal(ks[1], (D, M), jnp.bfloat16) * 0.03)
b1 = jnp.zeros((M,), jnp.float32)
w2 = jax.device_put(jax.random.normal(ks[2], (M, D), jnp.bfloat16) * 0.03)
b2 = jnp.zeros((D,), jnp.float32)
flops = 4 * T * D * M
for bt in (256, 1024, 2048):
    fn = partial(lambda s,b,w1,b1,w2,b2,x,bt: fused_mlp_pallas(
        x, s, b, w1, b1, w2, b2, act="gelu_tanh", block_t=bt), bt=bt)
    t = time_device_loop_single(fn, (s,b,w1,b1,w2,b2,x), n=16, reps=3)
    print(f"bt={bt}: {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)
