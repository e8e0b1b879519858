"""Round 4: train-step decomposition at ViT-B/16 @224 b64 (bench geometry).

The inference forward sits at ~85% MFU but the 57 ms train step implies
only ~60% on the 3x-forward-FLOPs estimate.  Before attacking anything,
decompose where the time goes (the tunnel profiler hangs — docs/perf.md —
so this is ablation accounting, the round-3 methodology):

  A  control      production train step, donate=False (bench mode=train)
  B  donate       same step, donate_argnums=(0,1) — params/opt buffer reuse
  C  grad-only    value_and_grad, no optimizer update / param apply
  D  fwd-only     forward with safe_softmax=True (the training forward)
  E  scan+remat   cfg.remat=True (the memory-tight variant, for the record)

backward = C - D, optimizer+apply = A - C, donation win = A - B.

Run: python experiments/perf_train_r4.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax

from vit_fpga_tpu.models import vit
from vit_fpga_tpu.train.trainer import make_vit_train_step, vit_loss
from vit_fpga_tpu.utils.timing import time_device_loop

B, IMG = 64, 224
cfg = vit.config("vit_b16", image_size=IMG, dtype="bfloat16")
cfg_sm = dataclasses.replace(cfg, safe_softmax=True)
params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
images = jax.device_put(
    jax.random.normal(jax.random.key(1), (B, IMG, IMG, 3),
                      jnp.float32).astype(jnp.bfloat16))
labels = jax.device_put(jnp.zeros((B,), jnp.int32))
opt = optax.sgd(1e-4)
opt_state = jax.device_put(opt.init(params))
print(f"device: {jax.devices()}", flush=True)


def anchored(p2, loss):
    leaves = jax.tree_util.tree_leaves(p2)
    return loss + sum(jnp.sum(l).astype(jnp.float32) * 1e-20
                      for l in leaves)


def make_full(c, donate):
    step = make_vit_train_step(c, opt, donate=donate)

    def f(p, s, y, x):
        p2, _, m = step(p, s, x, y)
        return anchored(p2, m["loss"])
    return f


def grad_only(p, s, y, x):
    (loss, _), grads = jax.value_and_grad(
        partial(vit_loss, cfg=cfg_sm), has_aux=True)(p, x, y)
    return anchored(grads, loss)


def fwd_only(p, s, y, x):
    loss, _ = vit_loss(p, x, y, cfg_sm)
    return loss


variants = [
    ("A control  ", make_full(cfg, donate=False)),
    ("C grad-only", grad_only),
    ("D fwd-only ", fwd_only),
    ("E scan+remat",
     make_full(dataclasses.replace(cfg, remat=True), donate=False)),
]

for r in range(3):
    out = []
    for name, fn in variants:
        t = time_device_loop(fn, (params, opt_state, labels, images),
                             n_lo=2, n_hi=6, reps=3)
        out.append(f"{name} {t * 1e3:7.2f} ms")
    print(f"round {r}: " + "  |  ".join(out), flush=True)
