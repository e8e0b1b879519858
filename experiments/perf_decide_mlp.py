"""Decide the auto-MLP implementation for large models (unrolled loop):
chunked-fused vs XLA, in the FULL model at ViT-L/16@384 and CLIP-L/14."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from vit_fpga_tpu.models import vit, clip
from vit_fpga_tpu.utils.timing import time_device_loop_single


def rep(name, fn, args, batch):
    t = time_device_loop_single(fn, args, n=8, reps=3)
    print(f"{name:40s} {t*1e3:8.2f} ms  ({batch/t:,.0f} img/s)", flush=True)


# ViT-L/16 @384 batch 16
params_l = jax.device_put(vit.init_params(
    jax.random.key(0), vit.config("vit_l16", image_size=384)))
img_l = jax.device_put(jax.random.normal(
    jax.random.key(1), (16, 384, 384, 3), jnp.float32).astype(jnp.bfloat16))
for mlp in ("auto", "xla"):
    cfg = vit.config("vit_l16", image_size=384, dtype="bfloat16",
                     mlp_impl=mlp)
    rep(f"vitl384 unrolled mlp={mlp}",
        lambda p, x, _c=cfg: vit.forward(p, x, _c), (params_l, img_l), 16)

# CLIP-L/14 @224 batch 256
cfg_c0 = clip.clip_vision_config("vit_l14", image_size=224,
                                 dtype="bfloat16")
params_c = jax.device_put(clip.init_params(jax.random.key(0), cfg_c0,
                                           projection_dim=768))
img_c = jax.device_put(jax.random.normal(
    jax.random.key(2), (256, 224, 224, 3), jnp.float32).astype(jnp.bfloat16))
import dataclasses
for mlp in ("auto", "xla"):
    cfg_c = dataclasses.replace(cfg_c0, mlp_impl=mlp)
    rep(f"clipL unrolled mlp={mlp}",
        lambda p, x, _c=cfg_c: clip.forward(p, x, _c), (params_c, img_c),
        256)
