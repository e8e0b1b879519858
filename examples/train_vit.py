"""End-to-end ViT training example (synthetic classification data).

Usage:
    python examples/train_vit.py [variant=vit_ti16] [image=64] [batch=32]
                                 [steps=50] [classes=10] [dp=1] [tp=1]

Runs on whatever devices are available: a single TPU chip, or a virtual
CPU mesh (set JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
and dp/tp accordingly).  Demonstrates the full training stack: mesh +
shardings, optax AdamW, remat, checkpoint save/resume.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv):
    from vit_fpga_tpu.utils.options import Options
    opts = Options(argv)
    variant = opts.get("variant", str, "vit_ti16")
    image = opts.get("image", int, 64)
    batch = opts.get("batch", int, 32)
    steps = opts.get("steps", int, 50)
    classes = opts.get("classes", int, 10)
    dp = opts.get("dp", int, 1)
    tp = opts.get("tp", int, 1)

    from vit_fpga_tpu.utils.platform import respect_jax_platforms
    respect_jax_platforms()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vit_fpga_tpu.models import vit
    from vit_fpga_tpu.parallel.mesh import make_mesh
    from vit_fpga_tpu.train.trainer import Trainer

    mesh = None
    if dp * tp > 1:
        mesh = make_mesh(dp=dp, tp=tp, devices=jax.devices()[:dp * tp])

    cfg = vit.config(variant, image_size=image, num_classes=classes,
                     dtype="bfloat16", remat=True)
    trainer = Trainer(cfg, learning_rate=1e-3, mesh=mesh)

    # Synthetic separable data: class = argmax over fixed random probes.
    rng = np.random.default_rng(0)
    probes = rng.normal(size=(classes, image, image, 3)).astype(np.float32)

    def make_batch(step):
        r = np.random.default_rng(step)
        x = r.normal(size=(batch, image, image, 3)).astype(np.float32)
        y = np.einsum("bhwc,khwc->bk", x, probes).argmax(-1).astype(
            np.int32)
        return jnp.asarray(x), jnp.asarray(y)

    hist = trainer.fit((make_batch(i) for i in range(steps)),
                       log_every=max(1, steps // 10))
    first, last = hist[0], hist[-1]
    print(f"loss {first['loss']:.4f} -> {last['loss']:.4f}; "
          f"acc {first['accuracy']:.3f} -> {last['accuracy']:.3f}")

    # checkpoint round-trip
    from vit_fpga_tpu.utils.checkpoint import (load_train_state,
                                               save_train_state)
    state = {"params": trainer.params, "opt_state": trainer.opt_state,
             "step": steps}
    path = os.path.abspath("vit_train_ckpt")
    save_train_state(path, state)
    restored = load_train_state(path, like=state)
    print(f"checkpoint saved+restored at step {restored['step']}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
