"""Round 4 follow-up: isolate the int8 MLP block_t lever (VERDICT r3 item 2).

perf_int8_r4.py measured: reciprocal row-quant alone -0.8% (loss),
reciprocal + block_t=512 +1.7%, block_t=1024 VMEM-OOM (scoped 16.75M >
16M).  This isolates block_t with the production divide row-quant and
sweeps the neighborhood.  Row-tiling the MLP is exact per row (LN and
row-quant are per-row), so every variant must be BIT-identical to A.

Run: python experiments/perf_int8_r4b.py
"""
import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vit_fpga_tpu.models import quantized, vit
from vit_fpga_tpu.ops import quant_block
from vit_fpga_tpu.utils.timing import time_device_loop

B, IMG = 64, 224
cfg = vit.config("vit_b16", image_size=IMG, dtype="bfloat16")
params = vit.init_params(jax.random.key(0), cfg)
qparams = jax.device_put(quantized.quantize_vit_fast(params))
images = jax.device_put(
    jax.random.normal(jax.random.key(1), (B, IMG, IMG, 3),
                      jnp.float32).astype(jnp.bfloat16))


def run(label, fwd):
    t = time_device_loop(lambda p, im: fwd(p, im), (qparams, images),
                         n_lo=4, n_hi=20)
    print(f"{label:44s} {t * 1e3:8.3f} ms  {B / t:8.1f} img/s",
          flush=True)
    return t


print("device:", jax.devices())
fwd_a = jax.jit(functools.partial(quantized.vit_forward_int8_fast, cfg=cfg))
out_a = fwd_a(qparams, images)
t_a = run("A production int8 (adaptive block_t)", fwd_a)

# Monkeypatch the TILE PICKER, not the kernel: _qblock_fast passes
# block_t=mlp_block_t(...) explicitly at call time, which would override
# a functools.partial bound on mlp_block_int8 and silently compare the
# adaptive tile against itself (ADVICE r4 — the original partial-binding
# version of this sweep went inert once the picker landed).
orig_pick = quant_block.mlp_block_t
for bt in (384, 512, 640, 768):
    quant_block.mlp_block_t = lambda *a, **k: bt  # noqa: B023
    jax.clear_caches()
    fwd_v = jax.jit(lambda p, im: quantized.vit_forward_int8_fast(p, im,
                                                                  cfg))
    try:
        out_v = fwd_v(qparams, images)
        d = float(jnp.max(jnp.abs(out_a - out_v)))
        assert d == 0.0, f"block_t={bt} broke exactness: max|diff|={d:.3e}"
        run(f"B block_t={bt} (bit-exact vs A)", fwd_v)
    except AssertionError:
        raise
    except Exception as e:  # noqa: BLE001
        print(f"block_t={bt}: FAILED {type(e).__name__}: {str(e)[:120]}")
quant_block.mlp_block_t = orig_pick
