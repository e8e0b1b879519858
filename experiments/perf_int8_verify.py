"""Validate the suspicious int8 e2e number (14k img/s > int8 roofline?!)
with independent methods: serial-fetch timing, depth linearity, and
logit sanity vs the per-tensor path."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from vit_fpga_tpu.models import vit, quantized
from vit_fpga_tpu.utils.timing import time_device_loop, _roundtrip_s

B = 64
images = jax.device_put(jax.random.normal(
    jax.random.key(1), (B, 224, 224, 3), jnp.float32).astype(jnp.bfloat16))


def build(depth):
    cfg = vit.config("vit_b16", image_size=224, dtype="bfloat16")
    import dataclasses
    cfg = dataclasses.replace(cfg, depth=depth)
    params = vit.init_params(jax.random.key(0), cfg)
    qp = jax.device_put(quantized.quantize_vit_fast(params))
    fwd = jax.jit(lambda p, x: quantized.vit_forward_int8_fast(p, x, cfg))
    return cfg, params, qp, fwd


for depth in (3, 6, 12):
    cfg, params, qp, fwd = build(depth)
    t = time_device_loop(fwd, (qp, images), n_lo=8, n_hi=18, reps=3)
    print(f"depth={depth:2d}: loop-timer {t*1e3:7.3f} ms "
          f"({B/t:,.0f} img/s)", flush=True)

# independent serial-fetch timing at depth 12 (upper bound incl. tunnel
# roundtrip, subtracted via the cached scalar-fetch estimate)
cfg, params, qp, fwd = build(12)
out = fwd(qp, images); float(jnp.sum(out))   # warm
rt = _roundtrip_s()
n = 12
t0 = time.perf_counter()
for _ in range(n):
    out = fwd(qp, images)
    float(jnp.sum(out))       # forces completion through the tunnel
dt = (time.perf_counter() - t0) / n - rt
print(f"serial-fetch: {dt*1e3:.3f} ms/call ({B/dt:,.0f} img/s), "
      f"roundtrip {rt*1e3:.2f} ms", flush=True)

# logits sanity: int8 fast vs f32 reference (cosine per row)
ref = np.asarray(vit.forward(jax.device_put(params), images, cfg),
                 np.float32)
got = np.asarray(fwd(qp, images), np.float32)
cos = np.sum(ref * got, -1) / (np.linalg.norm(ref, axis=-1)
                               * np.linalg.norm(got, axis=-1) + 1e-9)
print(f"logits cosine vs f32: min {cos.min():.4f} mean {cos.mean():.4f}",
      flush=True)
print("argmax agreement:", float((ref.argmax(-1) == got.argmax(-1)).mean()),
      flush=True)
