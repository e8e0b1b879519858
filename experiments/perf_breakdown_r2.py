"""Round-2 ViT-B/16 b64 step breakdown with the v2 kernels."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from vit_fpga_tpu.models import vit
from vit_fpga_tpu.ops.attn_block import attn_block_pallas
from vit_fpga_tpu.ops.fused_mlp import fused_mlp_pallas
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, IMG, N, D, HN, M = 64, 224, 197, 768, 12, 3072
cfg = vit.config("vit_b16", image_size=IMG, dtype="bfloat16")
params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
images = jax.device_put(jax.random.normal(
    jax.random.key(1), (B, IMG, IMG, 3), jnp.float32).astype(jnp.bfloat16))
tokens = jax.device_put(jax.random.normal(
    jax.random.key(2), (B, N, D), jnp.float32).astype(jnp.bfloat16))
blk0 = jax.tree_util.tree_map(lambda a: jax.device_put(a[0]),
                              params["blocks"])


def rep(name, fn, args, n=12):
    t = time_device_loop_single(fn, args, n=n, reps=3)
    print(f"{name:36s} {t*1e3:8.3f} ms", flush=True)
    return t


t_full = rep("full forward", lambda p, x: vit.forward(p, x, cfg),
             (params, images), n=10)


def embed(p, x):
    dt = cfg.compute_dtype
    h = vit.patchify(x.astype(dt), cfg.patch_size)
    h = h @ p["patch_embed"]["kernel"].astype(dt) + \
        p["patch_embed"]["bias"].astype(dt)
    b = h.shape[0]
    cls = jnp.broadcast_to(p["cls_token"].astype(dt), (b, 1, D))
    h = jnp.concatenate([cls, h], axis=1)
    return h + p["pos_embed"].astype(dt)


t_embed = rep("embed (patchify+gemm+cls+pos)", embed, (params, images))


def head(p, x):
    f = vit._layernorm(x, p["ln_f_scale"], p["ln_f_bias"], cfg.ln_eps)
    return (f[:, 0].astype(jnp.float32) @ p["head"]["kernel"]
            + p["head"]["bias"])


t_head = rep("final LN + head", head, (params, tokens))

t_attn = rep("attention half x1",
             lambda b, x: attn_block_pallas(
                 x, b["ln1_scale"], b["ln1_bias"], b["wqkv"], b["bqkv"],
                 b["wo"], b["bo"], HN),
             (blk0, tokens))
t_mlp = rep("mlp half x1",
            lambda b, x: fused_mlp_pallas(
                x.reshape(B * N, D), b["ln2_scale"], b["ln2_bias"],
                b["w1"], b["b1"], b["w2"], b["b2"],
                act="gelu_tanh").reshape(B, N, D),
            (blk0, tokens))


def block1(b, x):
    return vit._block(x, b, cfg)


t_block = rep("one full block via _block", block1, (blk0, tokens))

print(f"\naccounted: embed {t_embed*1e3:.2f} + 12*attn "
      f"{12*t_attn*1e3:.2f} + 12*mlp {12*t_mlp*1e3:.2f} + head "
      f"{t_head*1e3:.2f} = "
      f"{(t_embed + 12*t_attn + 12*t_mlp + t_head)*1e3:.2f} ms "
      f"vs full {t_full*1e3:.2f} ms")
print(f"one block {t_block*1e3:.3f} vs attn+mlp "
      f"{(t_attn+t_mlp)*1e3:.3f}")
