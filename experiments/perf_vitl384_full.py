"""ViT-L/16@384 full-forward matrix: fused-vs-r1 attention x chunked-vs-xla
MLP, to find why components got faster but the full model got slower."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from vit_fpga_tpu.models import vit
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, IMG = 16, 384
params = jax.device_put(vit.init_params(
    jax.random.key(0), vit.config("vit_l16", image_size=IMG)))
images = jax.device_put(jax.random.normal(
    jax.random.key(1), (B, IMG, IMG, 3), jnp.float32).astype(jnp.bfloat16))


def run(name, fits, mlp_impl, unroll=False):
    cfg = vit.config("vit_l16", image_size=IMG, dtype="bfloat16",
                     mlp_impl=mlp_impl)
    orig = vit._attn_block_fits
    vit._attn_block_fits = lambda c: fits
    try:
        if unroll:
            def fwd(p, x):
                dt = cfg.compute_dtype
                h = vit.patchify(x.astype(dt), cfg.patch_size)
                h = h @ p["patch_embed"]["kernel"].astype(dt) + \
                    p["patch_embed"]["bias"].astype(dt)
                cls = jnp.broadcast_to(p["cls_token"].astype(dt),
                                       (h.shape[0], 1, cfg.hidden_dim))
                h = jnp.concatenate([cls, h], axis=1) + \
                    p["pos_embed"].astype(dt)
                for i in range(cfg.depth):
                    blk = jax.tree_util.tree_map(lambda a: a[i],
                                                 p["blocks"])
                    h = vit._block(h, blk, cfg)
                h = vit._layernorm(h, p["ln_f_scale"], p["ln_f_bias"],
                                   cfg.ln_eps)
                return (h[:, 0].astype(jnp.float32) @ p["head"]["kernel"]
                        + p["head"]["bias"])
        else:
            def fwd(p, x):
                return vit.forward(p, x, cfg)
        t = time_device_loop_single(fwd, (params, images), n=8, reps=3)
        print(f"{name:44s} {t*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:44s} FAILED {str(e)[:120]}", flush=True)
    finally:
        vit._attn_block_fits = orig
        jax.clear_caches()


run("fused attn + chunked mlp (current)", True, "auto")
run("fused attn + xla mlp", True, "xla")
run("r1 attn (streamed) + chunked mlp", False, "auto")
run("r1 attn (streamed) + xla mlp (r1)", False, "xla")
run("fused attn + chunked mlp UNROLLED", True, "auto", unroll=True)
