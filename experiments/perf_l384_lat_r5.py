"""Round 5: ViT-L@384 + CLIP-L batch-1 latency (VERDICT r5 #3/#4).

Corrected floor arithmetic first (the r4 verdict's "~0.9 ms floor" for
L@384 quoted the weight-read bound, which is NOT the binding one):

  config          FLOP ideal b1   weight read   measured r4   b1 MFU
  vit_l16@384     1940 us         608 MB=742us  2589.6 us     74.9%
  clip_l14@224     822 us         608 MB=742us  1072.5 us     76.7%
  (vit_b16@224     178 us         172 MB=210us   261.2 us     68%  — the
   ONE weight-bound geometry; L-family batch-1 is COMPUTE-bound)

So the bf16 b1 gap at L-family is ~8-10 MFU points vs the batch
operating point (84-86%), not a 2.9x mystery.  Levers measured here:

  A  production forward_latency p50 (control)
  B  stack with EVEN n_sc so head-PAIR packing engages at L@384
     (stack_plan returns n_sc=11 -> odd -> pairs off; CLIP-L gets 16 and
     already runs paired)
  C  int8 stack (dynamic row-quant)   — halves the MXU time bound
  D  int8 stack (calibrated static)   — C minus the row-quant VPU work

Run: python experiments/perf_l384_lat_r5.py [model=vit_l16] [image=384]
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vit_fpga_tpu.models import quantized, vit
from vit_fpga_tpu.ops import vit_stack
from vit_fpga_tpu.utils.options import Options
from vit_fpga_tpu.utils.timing import time_device_loop

opts = Options(sys.argv[1:])
MODEL = opts.get("model", str, "vit_l16")
IMG = opts.get("image", int, 384)

cfg = vit.config(MODEL, image_size=IMG, dtype="bfloat16")
params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
images = jax.device_put(jax.random.normal(
    jax.random.key(1), (1, IMG, IMG, 3), jnp.float32).astype(jnp.bfloat16))
print(f"device: {jax.devices()}  model={MODEL}@{IMG} "
      f"seq={cfg.seq_len}", flush=True)

from bench import vit_flops_per_image  # noqa: E402
ideal_bf16 = vit_flops_per_image(cfg) / 197e12
print(f"FLOP ideal b1: bf16 {ideal_bf16 * 1e6:.0f} us, "
      f"int8 {ideal_bf16 / 2 * 1e6:.0f} us", flush=True)

prep = jax.device_put(vit.prep_latency(params, cfg))


def lat(label, fn, args):
    ts = sorted(time_device_loop(fn, args, n_lo=16, n_hi=48, reps=1)
                for _ in range(3))
    p50 = ts[1]
    print(f"{label:36s} p50 {p50 * 1e6:7.1f} us   "
          f"({[f'{t*1e6:.0f}' for t in ts]})", flush=True)
    return p50


def fwd_a(p, x):
    return vit.forward_latency(p, x, cfg)


lat("A production bf16 forward_latency", fwd_a, (prep, images))

# B: even n_sc -> pairs engage (only differs where plan gives odd n_sc)
orig_plan = vit_stack.stack_plan
n_sc0 = orig_plan(cfg.num_heads, cfg.hidden_dim, cfg.mlp_dim,
                  vit_stack.round_up(cfg.seq_len, 8),
                  vit_stack.round_up(cfg.seq_len, 128), 1, 2)
print(f"stack_plan n_sc = {n_sc0}", flush=True)
for n_sc in sorted({n_sc0 - n_sc0 % 2, 8, 4}, reverse=True):
    if n_sc == n_sc0 or n_sc < 2:
        continue
    vit_stack.stack_plan = (lambda *a, _v=n_sc, **k: _v)
    jax.clear_caches()
    try:
        lat(f"B bf16 stack n_sc={n_sc} (pairs on)", fwd_a, (prep, images))
    except Exception as e:  # noqa: BLE001
        print(f"B n_sc={n_sc}: FAIL {type(e).__name__}: {str(e)[:100]}")
    finally:
        vit_stack.stack_plan = orig_plan
jax.clear_caches()

# C/D: int8 stacks (dynamic vs calibrated static)
qp_dyn = jax.device_put(quantized.prep_int8_latency(
    quantized.quantize_vit_fast(params), cfg))
qp_sta = jax.device_put(quantized.prep_int8_latency(
    quantized.quantize_vit_static(params, cfg), cfg))


def fwd_int8(p, x):
    return quantized.vit_forward_int8_latency(p, x, cfg)


if quantized.int8_latency_supported(cfg, 1):
    lat("C int8 dynamic forward_latency", fwd_int8, (qp_dyn, images))
    lat("D int8 STATIC forward_latency", fwd_int8, (qp_sta, images))
    got = np.asarray(fwd_int8(qp_sta, images), np.float32)
    want = np.asarray(vit.forward(params, images, cfg), np.float32)
    cos = float((got * want).sum()
                / (np.linalg.norm(got) * np.linalg.norm(want) + 1e-30))
    print(f"static-int8 vs bf16 cosine: {cos:.5f}", flush=True)
else:
    print("int8 stack does not fit this geometry", flush=True)
