#!/usr/bin/env bash
# True per-call latency percentiles via the pure-native PJRT client
# (VERDICT r2 #8): the native client blocks on the device-complete
# event, so host-observed per-call times are genuine per-request
# latencies (the tunnel acks the Python path's dispatch early).
# Run on the TPU host; results recorded in docs/perf.md.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}
DEMO=native/build/vft_pjrt_demo
ITERS=${ITERS:-1000}

echo "== export ViT-B/16 b1 bf16 =="
python -m vit_fpga_tpu.cli export out=/tmp/vft_lat_vitb model=vit_b16 \
    image=224 batch=1 classes=1000 dtype=bfloat16
echo "== ViT-B/16 per-call percentiles (${ITERS} calls) =="
$DEMO model=/tmp/vft_lat_vitb mode=latency iters=$ITERS

echo "== export CLIP ViT-L/14 b1 bf16 =="
python -m vit_fpga_tpu.cli export out=/tmp/vft_lat_clipl \
    model=clip_vit_l14 image=224 batch=1 classes=768 dtype=bfloat16
echo "== CLIP-L/14 per-call percentiles (${ITERS} calls) =="
$DEMO model=/tmp/vft_lat_clipl mode=latency iters=$ITERS

echo "== streaming overlap (ViT-B, depth 24) =="
$DEMO model=/tmp/vft_lat_vitb mode=stream frames=256 depth=24
