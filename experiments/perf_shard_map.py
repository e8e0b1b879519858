"""Multi-chip perf sanity (VERDICT r2 #2): the fused shard_map path on a
1-device mesh vs the plain single-device forward on the real chip — the
shard_map wrapper must cost ~nothing, since the dp body IS the full
single-device dispatch (parallel/shard_model.py).
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vit_fpga_tpu.models import vit
from vit_fpga_tpu.parallel import shard_model as sm
from vit_fpga_tpu.parallel.mesh import make_mesh
from vit_fpga_tpu.utils.timing import time_device_loop_single


def main():
    cfg = vit.config("vit_b16", image_size=224, dtype="bfloat16")
    params = vit.init_params(jax.random.key(0), cfg)
    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(64, 224, 224, 3)),
        jnp.float32)

    plain = jax.jit(lambda p, x: vit.forward(p, x, cfg))
    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    sharded = sm.make_sharded_forward(cfg, mesh, impl="pallas")
    ptp = jax.device_put(sm.to_tp_layout(params),
                         sm.vit_tp_param_sharding(mesh))

    a = np.asarray(plain(params, images), np.float32)
    b = np.asarray(sharded(ptp, images), np.float32)
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
    print(f"parity plain vs shard_map: rel err {err:.2e}", flush=True)

    # pass params through the timing loop as ARGS (closure constants
    # exceed the tunnel's remote-compile request limit)
    pl_leaves, pl_def = jax.tree_util.tree_flatten(params)
    sh_leaves, sh_def = jax.tree_util.tree_flatten(ptp)

    def plain_fn(*a):
        return plain(jax.tree_util.tree_unflatten(pl_def, a[:-1]), a[-1])

    def shard_fn(*a):
        return sharded(jax.tree_util.tree_unflatten(sh_def, a[:-1]),
                       a[-1])

    for rnd in range(4):
        tp_ = time_device_loop_single(plain_fn,
                                      tuple(pl_leaves) + (images,), n=8)
        ts = time_device_loop_single(shard_fn,
                                     tuple(sh_leaves) + (images,), n=8)
        print(f"round {rnd}: plain {tp_ * 1e3:7.3f} ms  "
              f"shard_map {ts * 1e3:7.3f} ms  "
              f"overhead {100 * (ts / tp_ - 1):+.2f}%", flush=True)


if __name__ == "__main__":
    main()
