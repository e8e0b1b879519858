"""Where does ViT-B/16 step time go? Component microbenches on real TPU."""
import sys
import jax
import jax.numpy as jnp
from functools import partial

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.models import vit
from vit_fpga_tpu.utils.timing import time_device_loop

B, IMG = 64, 224
cfg = vit.config("vit_b16", image_size=IMG, dtype="bfloat16", attn_impl="xla")
params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
params_bf16 = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16), params)
images = jax.device_put(
    jax.random.normal(jax.random.key(1), (B, IMG, IMG, 3),
                      jnp.float32).astype(jnp.bfloat16))
tokens = jax.device_put(
    jax.random.normal(jax.random.key(2), (B, 197, 768),
                      jnp.float32).astype(jnp.bfloat16))

def report(name, fn, args, flops):
    t = time_device_loop(fn, args, n_lo=4, n_hi=16, reps=3)
    print(f"{name:34s} {t*1e3:8.2f} ms  {flops/t/1e12:6.1f} TFLOP/s "
          f"({flops/t/197e12*100:5.1f}% MFU)", flush=True)
    return t

full_flops = B * 35.1e9

# 1. full model (scan, f32 params cast per use)
report("full vit (scan, f32 params)", lambda p, x: vit.forward(p, x, cfg),
       (params, images), full_flops)

# 2. full model with pre-cast bf16 params
report("full vit (scan, bf16 params)", lambda p, x: vit.forward(p, x, cfg),
       (params_bf16, images), full_flops)

# 3. unrolled blocks instead of scan (bf16 params)
def unrolled(p, x):
    dt = cfg.compute_dtype
    x = vit.patchify(x.astype(dt), cfg.patch_size)
    x = x @ p["patch_embed"]["kernel"].astype(dt) + p["patch_embed"]["bias"].astype(dt)
    b = x.shape[0]
    cls = jnp.broadcast_to(p["cls_token"].astype(dt), (b, 1, cfg.hidden_dim))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_embed"].astype(dt)
    for i in range(cfg.depth):
        blk = jax.tree_util.tree_map(lambda a: a[i], p["blocks"])
        x = vit._block(x, blk, cfg)
    x = vit._layernorm(x, p["ln_f_scale"], p["ln_f_bias"], cfg.ln_eps)
    return (x[:, 0].astype(jnp.float32) @ p["head"]["kernel"].astype(jnp.float32))
report("full vit (unrolled, bf16 params)", unrolled, (params_bf16, images),
       full_flops)

# 4. GEMM-only skeleton: the 4 big matmuls per block, no LN/attn/residual
wq = jax.device_put(jax.random.normal(jax.random.key(3), (768, 2304), jnp.bfloat16))
wo = jax.device_put(jax.random.normal(jax.random.key(4), (768, 768), jnp.bfloat16))
w1 = jax.device_put(jax.random.normal(jax.random.key(5), (768, 3072), jnp.bfloat16))
w2 = jax.device_put(jax.random.normal(jax.random.key(6), (3072, 768), jnp.bfloat16))
def gemms(x, wq, wo, w1, w2):
    for _ in range(12):
        q = x @ wq
        x = q[..., :768] @ wo
        h = x @ w1
        x = h @ w2
    return x
gemm_flops = B * 12 * 2 * 197 * 768 * (2304 + 768 + 3072 + 3072)
report("gemm skeleton x12", gemms, (tokens, wq, wo, w1, w2), gemm_flops)

# 5. single big GEMM sanity: (12608, 768) @ (768, 3072)
x2d = tokens.reshape(-1, 768)
report("one gemm 12608x768x3072", lambda a, w: a @ w, (x2d, w1),
       2 * 12608 * 768 * 3072)

# 6. attention-only (xla) on tokens
def attn_only(p, x):
    blk = jax.tree_util.tree_map(lambda a: a[0], p["blocks"])
    from vit_fpga_tpu.ops.attention import mha_xla
    b, n, d = x.shape
    qkv = x @ blk["wqkv"].astype(x.dtype)
    qkv = qkv.reshape(b, n, 3, 12, 64).transpose(2, 0, 3, 1, 4)
    o = mha_xla(qkv[0], qkv[1], qkv[2])
    return o.transpose(0, 2, 1, 3).reshape(b, n, d)
report("attn block (qkv+mha) x1", attn_only, (params_bf16, tokens),
       B * (2 * 197 * 768 * 2304 + 4 * 197 * 197 * 768))

# 7. layernorm-only x25
def lns(p, x):
    for _ in range(25):
        x = vit._layernorm(x, p["ln_f_scale"], p["ln_f_bias"], 1e-6)
    return x
report("layernorm x25", lns, (params_bf16, tokens), 1)
