"""Round 4: CLIP-L serving — host JPEG decode vs device rate at b256.

Roadmap item 3: BASELINE config 5 serves at 83.2% MFU device-side; the
question is whether the HOST half of the pipeline (JPEG decode pool ->
batcher upload -> async dispatch) keeps the device fed.  On this
transport an END-TO-END run cannot answer it: the axon tunnel's H2D
path moves a 36.75 MB b256 uint8 batch in tens of seconds (measured
below), so e2e serving is transport-bound regardless of pipeline
design (a 128-image ViT-B serve measured 1.5 img/s, ~22 s/batch of a
9.2 MB upload).  Stage rates ARE measurable:

  decode-only   ThreadPoolExecutor(w) decoding distinct 224x224 JPEGs
                (real ~20 KB photograph-ish files)
  device rate   forward_raw via the device-loop timer (the documented
                methodology; wall-clock block_until_ready LIES here —
                this session it read "3.87M img/s")
  H2D           device_put of the b256 uint8 batch, completion forced
                by fetching a reduction of the transferred buffer

The transport-free overlap proof of the ImageServer pipeline itself
lives in experiments/perf_serving_stub.py (CPU, stub device clocked at
the measured device rate).  Reference hook: the frame ring that
overlaps host capture with device compute
(/root/reference/src/netFPGA.cpp:319-327).

Run: python experiments/perf_serving_overlap.py
"""
import io
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vit_fpga_tpu.models import clip as clip_mod
from vit_fpga_tpu.runtime.serving import decode_jpeg
from vit_fpga_tpu.utils.timing import time_device_loop

BATCH, SIZE = 256, 224
N_JPEG = 64

cfg = clip_mod.clip_vision_config("vit_l14", image_size=SIZE,
                                  dtype="bfloat16")
params = jax.device_put(clip_mod.init_params(jax.random.key(0), cfg))
jfwd = clip_mod.jit_forward(cfg, raw=True)

# Distinct, photograph-ish JPEGs (smooth gradients + noise compress to
# realistic sizes; pure noise decodes unrealistically slowly).
rng = np.random.default_rng(0)
yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
jpegs = []
for i in range(N_JPEG):
    base = (128 + 100 * np.sin(xx / (6 + i % 11) + i)
            * np.cos(yy / (9 + i % 7))).astype(np.float32)
    img = np.clip(base[..., None]
                  + rng.normal(0, 12, (SIZE, SIZE, 3)), 0, 255)
    buf = io.BytesIO()
    Image.fromarray(img.astype(np.uint8)).save(buf, format="JPEG",
                                               quality=90)
    jpegs.append(buf.getvalue())
print(f"jpeg bytes: median {sorted(len(j) for j in jpegs)[N_JPEG//2]}",
      flush=True)

host_batch = np.zeros((BATCH, SIZE, SIZE, 3), np.uint8)
for i in range(BATCH):
    host_batch[i] = decode_jpeg(jpegs[i % N_JPEG], SIZE)
dev_batch = jax.device_put(host_batch)
jax.block_until_ready(jfwd(params, dev_batch))   # compile outside timing
print("device:", jax.devices(), flush=True)

# -- host decode pool ---------------------------------------------------------
for w in (4, 8, 16):
    pool = ThreadPoolExecutor(w)
    n = 4 * BATCH
    t0 = time.perf_counter()
    list(pool.map(lambda i: decode_jpeg(jpegs[i % N_JPEG], SIZE),
                  range(n)))
    dt = time.perf_counter() - t0
    pool.shutdown()
    print(f"decode-only  w={w:2d}: {n / dt:7.1f} img/s", flush=True)

# -- device rate (honest timer) ----------------------------------------------
t = time_device_loop(jfwd, (params, dev_batch), n_lo=2, n_hi=8)
print(f"device rate (loop timer): {BATCH / t:7.1f} img/s "
      f"({t * 1e3:.1f} ms/batch)", flush=True)

# -- tunnel H2D bandwidth ------------------------------------------------------
# completion forced by FETCHING a reduction of the transferred buffer;
# each round perturbs the host batch so nothing is cached
red = jax.jit(lambda a: jnp.sum(a, dtype=jnp.int32))
for r in range(3):
    host_batch[0, 0, 0, 0] = r
    t0 = time.perf_counter()
    d = jax.device_put(host_batch)
    np.asarray(red(d))
    dt = time.perf_counter() - t0
    mb = host_batch.nbytes / 1e6
    print(f"H2D round {r}: {mb:.1f} MB in {dt:.2f}s "
          f"({mb / dt:.1f} MB/s) -> {BATCH / dt:.1f} img/s ceiling",
          flush=True)
