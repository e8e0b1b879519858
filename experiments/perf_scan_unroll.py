"""ViT-B full-forward: scan-vs-unrolled x f32-vs-bf16-resident params."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from vit_fpga_tpu.models import vit
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, IMG = 64, 224
cfg = vit.config("vit_b16", image_size=IMG, dtype="bfloat16")
params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
params_bf16 = jax.device_put(jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16) if a.ndim >= 2 else a, params))
images = jax.device_put(jax.random.normal(
    jax.random.key(1), (B, IMG, IMG, 3), jnp.float32).astype(jnp.bfloat16))


def unrolled(p, x):
    dt = cfg.compute_dtype
    h = vit.patchify(x.astype(dt), cfg.patch_size)
    h = h @ p["patch_embed"]["kernel"].astype(dt) + \
        p["patch_embed"]["bias"].astype(dt)
    cls = jnp.broadcast_to(p["cls_token"].astype(dt),
                           (h.shape[0], 1, cfg.hidden_dim))
    h = jnp.concatenate([cls, h], axis=1) + p["pos_embed"].astype(dt)
    for i in range(cfg.depth):
        blk = jax.tree_util.tree_map(lambda a: a[i], p["blocks"])
        h = vit._block(h, blk, cfg)
    h = vit._layernorm(h, p["ln_f_scale"], p["ln_f_bias"], cfg.ln_eps)
    return (h[:, 0].astype(jnp.float32) @ p["head"]["kernel"].astype(
        jnp.float32) + p["head"]["bias"].astype(jnp.float32))


def rep(name, fn, args):
    t = time_device_loop_single(fn, args, n=10, reps=3)
    print(f"{name:34s} {t*1e3:8.3f} ms  ({B/t:,.0f} img/s)", flush=True)


rep("scan, f32 params (current)",
    lambda p, x: vit.forward(p, x, cfg), (params, images))
rep("scan, bf16 params",
    lambda p, x: vit.forward(p, x, cfg), (params_bf16, images))
rep("unrolled, f32 params", unrolled, (params, images))
rep("unrolled, bf16 params", unrolled, (params_bf16, images))
