"""Real multi-host execution at process_count=2 (VERDICT r3 #6).

Everything else in the suite exercises multi-chip sharding inside ONE
process (the virtual 8-device CPU mesh).  This test spawns two fresh
Python processes, initializes ``jax.distributed`` across them
(coordinator + split device sets — the exact code path a TPU pod run
takes through ``parallel/mesh.distributed_init``), builds the hybrid
("dcn", "dp", "tp") mesh across both processes, runs one dp+tp-sharded
ViT train step on globally-sharded arrays, and asserts loss parity with
the same step executed in a single process.

No TPU needed: each process hosts 4 virtual CPU devices; cross-process
collectives ride XLA's CPU collectives over the coordination service.

The reference has no multi-host capability at all (SURVEY.md §2.3:
"distributed communication backend: NONE"); this is net-new scope the
TPU rebuild carries as first-class.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
import optax

from vit_fpga_tpu.parallel.mesh import distributed_init, make_hybrid_mesh
from vit_fpga_tpu.parallel.sharding import batch_sharding
from vit_fpga_tpu.models import vit
from vit_fpga_tpu.train.trainer import init_train_state, make_vit_train_step

ok = distributed_init(coordinator_address=f"127.0.0.1:{port}",
                      num_processes=2, process_id=pid)
assert ok, "distributed_init returned False for a 2-process run"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.local_devices()) == 4, jax.local_devices()
assert len(jax.devices()) == 8, jax.devices()

# dcn axis spans the two processes (inter-host), dp*tp inside each.
mesh = make_hybrid_mesh(dcn=2, dp=2, tp=2)
assert mesh.shape == {"dcn": 2, "dp": 2, "tp": 2}, mesh.shape

cfg = vit.ViTConfig(image_size=32, patch_size=8, hidden_dim=64,
                    depth=2, num_heads=4, mlp_dim=128, num_classes=16,
                    dtype="float32", attn_impl="xla")
optimizer = optax.sgd(1e-2)
params, opt_state = init_train_state(jax.random.key(0), cfg, optimizer,
                                     mesh)

step = make_vit_train_step(cfg, optimizer, mesh)

batch = 8
rng = np.random.default_rng(0)
h_images = rng.normal(size=(batch, 32, 32, 3)).astype(np.float32)
h_labels = rng.integers(0, 16, size=(batch,)).astype(np.int32)

# Build GLOBAL arrays from per-process host data: every process holds the
# full batch; make_array_from_callback places each process's addressable
# shards (the multi-host analogue of the device_put in dryrun_multichip).
img_s = batch_sharding(mesh, 4)
lab_s = batch_sharding(mesh, 1)
images = jax.make_array_from_callback((batch, 32, 32, 3), img_s,
                                      lambda idx: h_images[idx])
labels = jax.make_array_from_callback((batch,), lab_s,
                                      lambda idx: h_labels[idx])

params, opt_state, metrics = step(params, opt_state, images, labels)
jax.block_until_ready(params)
loss = float(metrics["loss"])
assert np.isfinite(loss), loss
if pid == 0:
    print(f"MULTIPROC_LOSS={loss:.10f}", flush=True)
jax.distributed.shutdown()
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_loss() -> float:
    """The same step on the in-process 8-device mesh (same seeds/data)."""
    import jax
    import jax.numpy as jnp  # noqa: F401
    import optax

    from vit_fpga_tpu.models import vit
    from vit_fpga_tpu.parallel.mesh import make_hybrid_mesh
    from vit_fpga_tpu.parallel.sharding import batch_sharding
    from vit_fpga_tpu.train.trainer import (init_train_state,
                                            make_vit_train_step)

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    mesh = make_hybrid_mesh(dcn=2, dp=2, tp=2,
                            devices=jax.devices()[:8])
    cfg = vit.ViTConfig(image_size=32, patch_size=8, hidden_dim=64,
                        depth=2, num_heads=4, mlp_dim=128, num_classes=16,
                        dtype="float32", attn_impl="xla")
    optimizer = optax.sgd(1e-2)
    params, opt_state = init_train_state(jax.random.key(0), cfg,
                                         optimizer, mesh)
    step = make_vit_train_step(cfg, optimizer, mesh)
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
        batch_sharding(mesh, 4))
    labels = jax.device_put(rng.integers(0, 16, size=(8,)).astype(np.int32),
                            batch_sharding(mesh, 1))
    _, _, metrics = step(params, opt_state, images, labels)
    return float(metrics["loss"])


def test_two_process_distributed_train_step_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    # children configure their own platform/devices; scrub the parent's
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, str(pid),
                          str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=repo)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} failed (rc={p.returncode}):\n{out[-4000:]}")
    loss_lines = [ln for ln in outs[0].splitlines()
                  if ln.startswith("MULTIPROC_LOSS=")]
    assert loss_lines, f"no loss line from worker 0:\n{outs[0][-4000:]}"
    multi = float(loss_lines[-1].split("=")[1])

    single = _single_process_loss()
    # identical data, params, mesh topology and math — the cross-process
    # run must reproduce the in-process loss to float32 tolerance
    np.testing.assert_allclose(multi, single, rtol=1e-6, atol=1e-7)
