"""Round 4: dedicated ViT-L/16@384 push (VERDICT r3 item 3).

Config 4 ("ViT-L/16 @384px high-res inference with double-buffered HBM
weight streaming", BASELINE.json) pins no batch size; rounds 1-3 always
measured b16 (9.3k token rows), which is exactly what starves the fused
stats MLP (needs >= 32k rows) and leaves attention's big tier at
1 img/cell.  Sweep the two free axes:

  * batch 16 / 32 / 64 through the production dispatch (b64 -> 37.4k
    rows: the unchunked raised-VMEM stats MLP gate engages)
  * attention tier at n_pad=584: production big tier (1 img, 16 slots,
    100MB) vs a 2-image big tier (imgs=2, 4/8 slots — the upgrade that
    won CLIP-L its 2-image ao-scratch tier)

MFU denominators use the per-image forward FLOPs at n_pad=584 rows
(vit_l16@384: depth 24, d 1024, mlp 4096, heads 16).

Run: python experiments/perf_l384_r4.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vit_fpga_tpu.models import vit
from vit_fpga_tpu.ops import attn_block
from vit_fpga_tpu.utils.timing import time_device_loop_single

IMG = 384
cfg = vit.config("vit_l16", image_size=IMG, dtype="bfloat16")
params = jax.device_put(vit.init_params(jax.random.key(0), cfg))

# bf16 peak and per-image FLOPs (n_pad rows, pad-inclusive — the same
# accounting bench.py uses)
PEAK = 197e12
n_pad, d, m, L, H = 584, 1024, 4096, 24, 16
kv = 640
flops_img = (2 * n_pad * d * (3 * d + d) * L            # qkv + oproj
             + 4 * H * n_pad * kv * (d // H) * L        # scores + pv
             + 4 * n_pad * d * m * L                    # mlp
             + 2 * n_pad * (16 * 16 * 3) * d            # embed
             + 2 * d * 1000)


def run(label, batch):
    images = jax.device_put(jax.random.normal(
        jax.random.key(1), (batch, IMG, IMG, 3),
        jnp.float32).astype(jnp.bfloat16))
    fwd = lambda p, x: vit.forward(p, x, cfg)  # noqa: E731
    t = time_device_loop_single(fwd, (params, images), n=8, reps=3)
    ips = batch / t
    mfu = ips * flops_img / PEAK
    print(f"{label:46s} {t * 1e3:8.2f} ms  {ips:7.1f} img/s "
          f"({100 * mfu:5.1f}% MFU)", flush=True)
    jax.clear_caches()
    return ips


print("device:", jax.devices())
base = {}
for b in (16, 32, 64):
    base[b] = run(f"production dispatch, b{b}", b)

# 2-image big-tier attention variant (CLIP-L's winning upgrade, applied
# at the L@384 geometry): imgs=2, ao scratch, raised VMEM
orig_plan = attn_block.attn_plan


def plan_2img(n_heads, dm, npd, kvp, itemsize, batch=1, budget=13 << 20,
              weight_itemsize=None, d_attn=None):
    p = orig_plan(n_heads, dm, npd, kvp, itemsize, batch=batch,
                  budget=budget, weight_itemsize=weight_itemsize,
                  d_attn=d_attn)
    if dm == 1024 and npd == 584 and batch % 2 == 0:
        return attn_block.AttnPlan(2, _SLOTS, False,
                                   attn_block._BIG_VMEM_BYTES)
    return p


for slots in (4, 8):
    _SLOTS = slots
    attn_block.attn_plan = plan_2img
    jax.clear_caches()
    try:
        for b in (16, 64):
            run(f"2-img big tier ({slots} slots), b{b}", b)
    except Exception as e:  # noqa: BLE001
        print(f"2-img {slots} slots FAILED: {str(e)[:140]}")
    finally:
        attn_block.attn_plan = orig_plan
jax.clear_caches()
