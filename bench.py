#!/usr/bin/env python
"""Headline benchmark: ViT-B/16 @224 bf16 batch-64 inference throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
fraction of the TPU v5e bf16 roofline achieved (i.e. model FLOPs
utilization): roofline img/s = peak_flops / flops_per_image.  Targets from
BASELINE.json: > 0.90.

Usage: python bench.py [model=vit_b16] [batch=64] [image=224]
                       [dtype=bfloat16] [iters=10] [inner=8] [attn=auto]
                       [raw=false] [json_only=true]
"""

from __future__ import annotations

import json
import sys


def vit_flops_per_image(cfg) -> float:
    """Analytic forward FLOPs (2*MACs) per image, incl. patch embed."""
    n, d, m, l = cfg.seq_len, cfg.hidden_dim, cfg.mlp_dim, cfg.depth
    p3 = cfg.patch_size * cfg.patch_size * 3
    patch = 2 * cfg.n_patches * p3 * d
    qkv = 2 * n * d * 3 * d
    attn = 2 * 2 * n * n * d
    proj = 2 * n * d * d
    mlp = 2 * 2 * n * d * m
    head = 2 * d * cfg.num_classes
    return patch + l * (qkv + attn + proj + mlp) + head


def main(argv):
    from vit_fpga_tpu.utils.options import Options
    opts = Options(argv)
    model = opts.get("model", str, "vit_b16")
    batch = opts.get("batch", int, 64)
    image = opts.get("image", int, 224)
    dtype = opts.get("dtype", str, "bfloat16")
    iters = opts.get("iters", int, 10)
    inner = opts.get("inner", int, 8)
    attn = opts.get("attn", str, "auto")
    json_only = opts.get("json_only", bool, True)

    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
    import jax
    import jax.numpy as jnp
    from vit_fpga_tpu.models import vit
    from vit_fpga_tpu.ops.common import V5E_BF16_FLOPS
    from vit_fpga_tpu.utils.timing import time_device_loop

    is_clip = model.startswith("clip_")
    if is_clip:
        from vit_fpga_tpu.models import clip
        cfg = clip.clip_vision_config(model.removeprefix("clip_"),
                                      image_size=image, dtype=dtype,
                                      attn_impl=attn)
        params = jax.device_put(
            clip.init_params(jax.random.key(0), cfg, projection_dim=768))
    else:
        cfg = vit.config(model, image_size=image, dtype=dtype,
                         attn_impl=attn)
        params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
    images = jax.device_put(
        jax.random.normal(jax.random.key(1), (batch, image, image, 3),
                          jnp.float32).astype(cfg.compute_dtype))

    if dtype == "int8":
        # fast row-wise fused path (the per-tensor bit-exact path is the
        # parity harness, not the serving path)
        from vit_fpga_tpu.models import quantized
        qparams = jax.device_put(quantized.quantize_vit_fast(params))

        def fwd(p, x):
            return quantized.vit_forward_int8_fast(p, x, cfg)

        run_params = qparams
    else:
        if is_clip:
            from vit_fpga_tpu.models import clip as _clip

            def fwd(p, x):
                return _clip.forward(p, x, cfg)
        else:
            def fwd(p, x):
                return vit.forward(p, x, cfg)

        run_params = params

    sec_per_call = time_device_loop(fwd, (run_params, images),
                                    n_lo=inner, n_hi=inner + iters,
                                    reps=3)
    imgs_per_s = batch / sec_per_call

    flops = vit_flops_per_image(cfg)
    if dtype == "bfloat16":
        peak = V5E_BF16_FLOPS
    elif dtype == "int8":
        peak = 2 * V5E_BF16_FLOPS   # v5e int8 = 394 TOPS
    else:
        peak = V5E_BF16_FLOPS / 2   # f32 full-precision mode
    roofline = peak / flops
    mfu = imgs_per_s / roofline

    if not json_only:
        print(f"# {model}@{image} batch={batch} {dtype} attn={attn} "
              f"step={sec_per_call * 1e3:.2f}ms "
              f"flops/img={flops / 1e9:.1f}G roofline={roofline:.0f}img/s "
              f"backend={jax.default_backend()}", file=sys.stderr)
    print(json.dumps({
        "metric": f"{model}@{image}px {dtype} batch-{batch} "
                  "inference throughput",
        "value": round(imgs_per_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(mfu, 4),
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
