"""Isolate the ~11ms of non-GEMM overhead in the ViT step."""
import sys
import jax
import jax.numpy as jnp
from functools import partial

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.models import vit
from vit_fpga_tpu.utils.timing import time_device_loop

B, IMG = 64, 224
cfg = vit.config("vit_b16", image_size=IMG, dtype="bfloat16", attn_impl="xla")
params = jax.device_put(jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16),
    vit.init_params(jax.random.key(0), cfg)))
images = jax.device_put(
    jax.random.normal(jax.random.key(1), (B, IMG, IMG, 3),
                      jnp.float32).astype(jnp.bfloat16))

def report(name, fn, args):
    t = time_device_loop(fn, args, n_lo=4, n_hi=16, reps=3)
    print(f"{name:40s} {t*1e3:8.2f} ms  ({B*35.1e9/t/1e12:5.1f} TF/s)",
          flush=True)

def block_variant(x, blk, cfg, attn_mode, act_mode, ln_mode):
    b, n, d = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    dt = x.dtype

    def ln(y, s, bb):
        if ln_mode == "f32":
            return vit._layernorm(y, s, bb, cfg.ln_eps)
        yf = y
        mu = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.var(yf, axis=-1, keepdims=True)
        return ((yf - mu) * jax.lax.rsqrt(var + cfg.ln_eps) * s + bb).astype(dt)

    h = ln(x, blk["ln1_scale"], blk["ln1_bias"])
    qkv = h @ blk["wqkv"] + blk["bqkv"]
    if attn_mode == "transpose":
        qkv5 = qkv.reshape(b, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        from vit_fpga_tpu.ops.attention import mha_xla
        o = mha_xla(qkv5[0], qkv5[1], qkv5[2])
        o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
    elif attn_mode == "einsum":
        q = qkv[..., :d].reshape(b, n, nh, hd)
        k = qkv[..., d:2*d].reshape(b, n, nh, hd)
        v = qkv[..., 2*d:].reshape(b, n, nh, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (hd ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, n, d)
    else:  # none
        o = qkv[..., :d]
    x = x + (o @ blk["wo"] + blk["bo"])
    h = ln(x, blk["ln2_scale"], blk["ln2_bias"])
    h = h @ blk["w1"] + blk["b1"]
    if act_mode == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    elif act_mode == "gelu_tanh":
        h = jax.nn.gelu(h, approximate=True)
    x = x + (h @ blk["w2"] + blk["b2"])
    return x

def full(p, x, attn_mode, act_mode, ln_mode):
    dt = cfg.compute_dtype
    x = vit.patchify(x.astype(dt), cfg.patch_size)
    x = x @ p["patch_embed"]["kernel"] + p["patch_embed"]["bias"]
    b = x.shape[0]
    cls = jnp.broadcast_to(p["cls_token"], (b, 1, cfg.hidden_dim))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_embed"]

    def step(carry, blk):
        return block_variant(carry, blk, cfg, attn_mode, act_mode,
                             ln_mode), None
    x, _ = jax.lax.scan(step, x, p["blocks"])
    x = vit._layernorm(x, p["ln_f_scale"], p["ln_f_bias"], cfg.ln_eps)
    return x[:, 0].astype(jnp.float32) @ p["head"]["kernel"].astype(jnp.float32)

report("baseline (transpose,gelu,f32 ln)", partial(full, attn_mode="transpose", act_mode="gelu", ln_mode="f32"), (params, images))
report("einsum attn", partial(full, attn_mode="einsum", act_mode="gelu", ln_mode="f32"), (params, images))
report("einsum attn + tanh gelu", partial(full, attn_mode="einsum", act_mode="gelu_tanh", ln_mode="f32"), (params, images))
report("einsum attn + bf16 ln", partial(full, attn_mode="einsum", act_mode="gelu", ln_mode="bf16"), (params, images))
report("no attn (ablation)", partial(full, attn_mode="none", act_mode="gelu", ln_mode="f32"), (params, images))
report("no gelu (ablation)", partial(full, attn_mode="einsum", act_mode="none", ln_mode="f32"), (params, images))
