"""CLIP-L / ViT-L MLP: chunked (prod) vs unchunked with raised VMEM."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops import fused_mlp as fm
from vit_fpga_tpu.utils.timing import time_device_loop_single

MB = 1024 * 1024
for name, (T, D, M) in {
    "CLIP-L b32 (32x272 rows)": (32 * 272, 1024, 4096),
    "ViT-H b8 (8x272 rows)": (8 * 272, 1280, 5120),
}.items():
    ks = jax.random.split(jax.random.key(0), 4)
    x = jax.device_put(jax.random.normal(ks[0], (T, D), jnp.bfloat16))
    s = jnp.ones((D,), jnp.float32)
    b = jnp.zeros((D,), jnp.float32)
    w1 = jax.device_put(jax.random.normal(ks[1], (D, M), jnp.bfloat16) * .02)
    b1 = jnp.zeros((M,), jnp.float32)
    w2 = jax.device_put(jax.random.normal(ks[2], (M, D), jnp.bfloat16) * .02)
    b2 = jnp.zeros((D,), jnp.float32)
    args = (s, b, w1, b1, w2, b2)
    nc = fm.mlp_weight_chunks(D, M, 2)
    fns = {
        f"chunked x{nc} (prod)": jax.jit(
            lambda s, b, w1, b1, w2, b2, _nc=nc: fm.fused_mlp_chunked_pallas(
                x, s, b, w1, b1, w2, b2, act="gelu_tanh", n_chunks=_nc)),
        "unchunked 48M": jax.jit(
            lambda s, b, w1, b1, w2, b2: fm.fused_mlp_pallas(
                x, s, b, w1, b1, w2, b2, act="gelu_tanh",
                vmem_limit=48 * MB)),
        "unchunked 80M": jax.jit(
            lambda s, b, w1, b1, w2, b2: fm.fused_mlp_pallas(
                x, s, b, w1, b1, w2, b2, act="gelu_tanh",
                vmem_limit=80 * MB)),
    }
    ref = None
    for n, f in list(fns.items()):
        try:
            got = np.asarray(f(*args), np.float32)
            if ref is None:
                ref = got
            print(f"{name} {n:18s} maxdiff={np.abs(ref-got).max():.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name} {n:18s} FAILED {str(e)[:80]}", flush=True)
            del fns[n]
    for rnd in range(3):
        for n, f in fns.items():
            t = time_device_loop_single(f, args, n=16, reps=3)
            print(f"r{rnd} {name} {n:18s} {t * 1e3:7.3f} ms", flush=True)
