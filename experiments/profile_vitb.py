"""Device-trace profiling of the ViT-B/16 b64 bf16 step (VERDICT r2 #1).

Captures a jax.profiler trace of the production forward on the real chip
and aggregates the xplane: per-op device time, total TensorCore busy time
vs wall time, and the top ops.  This turns the ablation-based "where the
remaining 25% sits" account (docs/perf.md) into hardware-counter evidence
— or documents that the axon tunnel cannot produce device traces.

Usage: python experiments/profile_vitb.py [outdir]
"""
import collections
import glob
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vit_fpga_tpu.models import vit

OUTDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile_vitb"


def main():
    print("backend:", jax.default_backend(), jax.devices())
    cfg = vit.config("vit_b16", image_size=224, dtype="bfloat16")
    params = vit.init_params(jax.random.key(0), cfg)
    params = jax.device_put(params)
    images = jnp.asarray(
        jax.random.normal(jax.random.key(1), (64, 224, 224, 3)),
        jnp.float32)
    fn = jax.jit(lambda p, x: vit.forward(p, x, cfg))
    # warm
    out = fn(params, images)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(params, images)
    jax.block_until_ready(out)
    print(f"warm wall per step (host view): "
          f"{(time.perf_counter() - t0) / 5 * 1e3:.3f} ms")

    with jax.profiler.trace(OUTDIR):
        for _ in range(10):
            out = fn(params, images)
        jax.block_until_ready(out)

    paths = glob.glob(os.path.join(OUTDIR, "**", "*.xplane.pb"),
                      recursive=True)
    print("xplane files:", paths)
    if not paths:
        print("NO TRACE PRODUCED")
        return
    try:
        from jax.profiler import ProfileData
    except ImportError:
        print("no jax.profiler.ProfileData in this version")
        return
    data = ProfileData.from_file(paths[-1])
    for plane in data.planes:
        print(f"\n=== plane: {plane.name} ===")
        # aggregate event durations per line
        for line in plane.lines:
            events = list(line.events)
            if not events:
                continue
            total = sum(e.duration_ns for e in events)
            start = min(e.start_ns for e in events)
            end = max(e.start_ns + e.duration_ns for e in events)
            wall = end - start
            print(f"  line {line.name!r}: {len(events)} events, busy "
                  f"{total / 1e6:.3f} ms over {wall / 1e6:.3f} ms span "
                  f"({100 * total / max(wall, 1):.1f}% busy)")
            agg = collections.Counter()
            for e in events:
                agg[e.name] += e.duration_ns
            for name, ns in agg.most_common(15):
                print(f"      {ns / 1e6:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
