"""Command-line apps (the L5 'application' layer of SURVEY.md §1).

Usage: ``python -m vit_fpga_tpu.cli <command> [key=value ...]``

Commands:
  demo    — end-to-end tour: dense net forward/train, streaming ring
  bench   — ViT/CLIP throughput (same engine as the repo-root bench.py)
  parity  — oracle-vs-device parity report (f32, bf16, int8 paths)
  serve   — throughput test of the JPEG serving pipeline
            (dtype=bfloat16|int8, optional ckpt=<npz> with automatic
            softmax-window calibration at load)
  export  — AOT-export a model dir for the native PJRT client
  calibrate — softmax clip-window check for a checkpoint (utils/calibrate)
"""

from __future__ import annotations

import sys

import numpy as np

from .utils.options import Options


def cmd_demo(opts: Options) -> int:
    from . import ACT_IDENTITY, ACT_RELU2, ImageSet, NetSets, random_net
    from .backends.tpu import NetTPU
    n_ins = opts.get("n_ins", int, 64)
    net = NetTPU(random_net(n_ins, [128, 32, 10], seed=0,
                            activations=[ACT_RELU2, ACT_RELU2,
                                         ACT_IDENTITY]))
    x = np.random.default_rng(0).normal(size=(n_ins,)).astype(np.float32)
    out = net.launch_forward(x)
    print(f"forward: {out.shape} in {net.get_forward_performance()} us")
    rng = np.random.default_rng(1)
    X = rng.normal(size=(128, n_ins)).astype(np.float32)
    Y = rng.normal(size=(128, 10)).astype(np.float32)
    net.init_gradient(NetSets(X, Y))
    errs = net.launch_gradient(50, 1e-6, 0.01)
    nz = errs[errs > 0]
    print(f"train: loss {nz[0]:.4f} -> {nz[-1]:.4f} "
          f"in {net.get_gradient_performance()} us")
    img = rng.integers(0, 256, (256, 512), np.uint8)
    for i in range(4):
        net.filter_image(ImageSet(img, original_h=256, original_w=512,
                                  original_x_pos=i))
    got = [net.get_filtered_image() for _ in range(4)]
    print(f"pipeline: {sum(not g.empty for g in got)}/4 frames, "
          f"FIFO={[g.original_x_pos for g in got]}")
    return 0


def cmd_bench(opts: Options) -> int:
    import bench  # repo-root bench.py
    argv = [f"{k}={opts.get(k)}" for k in opts.keys()]
    bench.main(argv + ["json_only=false"])
    return 0


def cmd_parity(opts: Options) -> int:
    import jax.numpy as jnp
    from .backends.cpu import NetCPU
    from .backends.tpu import NetTPU
    from .defines import ACT_IDENTITY, ACT_RELU2, random_net
    from .models import quantized
    data = random_net(opts.get("n_ins", int, 64),
                      [128, 32, 10], seed=0,
                      activations=[ACT_RELU2, ACT_RELU2, ACT_IDENTITY])
    x = np.random.default_rng(0).normal(
        size=(8, data.n_ins)).astype(np.float32)
    oracle = NetCPU(data).forward_batch(x)

    f32 = NetTPU(data).forward_batch(x)
    rel = np.abs(f32 - oracle).max() / (np.abs(oracle).max() + 1e-12)
    print(f"f32 device vs oracle: max rel err {rel:.2e}")

    bf16 = NetTPU(data, compute_dtype="bfloat16").forward_batch(x)
    rel = np.abs(bf16 - oracle).max() / (np.abs(oracle).max() + 1e-12)
    print(f"bf16 device vs oracle: max rel err {rel:.2e}")

    qp = quantized.quantize_mlp(data)
    ref = quantized.mlp_forward_int8_numpy(qp, x)
    dev = quantized.device_qparams(qp)
    out = np.asarray(quantized.mlp_forward_int8(dev, jnp.asarray(x),
                                                qp["acts"]))
    exact = np.array_equal(out, ref)
    print(f"int8 device vs int8 oracle: bit-exact={exact}")
    rel = np.abs(ref - oracle).max() / (np.abs(oracle).max() + 1e-12)
    print(f"int8 oracle vs f32 oracle: max rel err {rel:.2e} "
          f"(quantization noise)")
    return 0


def cmd_serve(opts: Options) -> int:
    import io
    import time
    import jax
    from PIL import Image
    from .models import vit
    from .runtime.serving import ImageServer
    model = opts.get("model", str, "vit_b16")
    batch = opts.get("batch", int, 64)
    n = opts.get("images", int, 256)
    size = opts.get("image", int, 224)
    dtype = opts.get("dtype", str, "bfloat16")   # bfloat16 | int8
    ckpt = opts.get("ckpt", str, "")
    if dtype not in ("bfloat16", "int8"):
        raise SystemExit("serve supports dtype=bfloat16|int8")
    is_clip = model.startswith("clip_")
    # The serving compute dtype is bf16 either way (int8 engines keep
    # bf16 activations); cfg.dtype stays bfloat16 and the int8 switch
    # picks the quantized forward below — one API, two datapaths, like
    # the reference (/root/reference/include/netAbstract.h:8-21).
    if is_clip:
        from .models import clip as clip_mod
        cfg = clip_mod.clip_vision_config(model.removeprefix("clip_"),
                                          image_size=size,
                                          dtype="bfloat16")
        params = (_load_ckpt(ckpt) if ckpt
                  else clip_mod.init_params(jax.random.key(0), cfg))
    else:
        cfg = vit.config(model, image_size=size, dtype="bfloat16")
        params = (_load_ckpt(ckpt) if ckpt
                  else vit.init_params(jax.random.key(0), cfg))
    if ckpt:
        # trust boundary: never serve an unmeasured checkpoint on the
        # max-free softmax fast path (utils/checkpoint.autocalibrated)
        from .utils.checkpoint import autocalibrated
        cfg = autocalibrated(params, cfg, source=f"ckpt {ckpt}")
    if dtype == "int8":
        from .models import quantized
        # quant=static serves the calibrated static-scale datapath (the
        # reference-faithful fixed-point mode); calibration runs on a
        # synthetic probe batch unless the checkpoint ships real inputs
        if opts.get("quant", str, "dynamic") == "static":
            quant = (quantized.quantize_clip_vision_static if is_clip
                     else quantized.quantize_vit_static)
            params = jax.device_put(quant(params, cfg))
        else:
            quant = (quantized.quantize_clip_vision_fast if is_clip
                     else quantized.quantize_vit_fast)
            params = jax.device_put(quant(params))
        jfwd = quantized.jit_forward_int8(cfg, raw=True, clip=is_clip)
    elif is_clip:
        params = jax.device_put(params)
        jfwd = clip_mod.jit_forward(cfg, raw=True)
    else:
        params = jax.device_put(params)
        jfwd = vit.jit_forward(cfg, raw=True)
    rng = np.random.default_rng(0)
    jpegs = []
    for _ in range(8):
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 256, (size, size, 3),
                                     np.uint8)).save(buf, format="JPEG")
        jpegs.append(buf.getvalue())
    # warm the compile outside the measurement
    import jax.numpy as jnp
    jax.block_until_ready(jfwd(params, jnp.zeros((batch, size, size, 3),
                                                 jnp.uint8)))
    with ImageServer(lambda b: jfwd(params, b), image_size=size,
                     batch_size=batch) as server:
        t0 = time.perf_counter()
        futs = [server.submit(jpegs[i % 8]) for i in range(n)]
        for f in futs:
            f.result(timeout=600)
        dt = time.perf_counter() - t0
    print(f"served {n} images in {dt:.2f}s ({n / dt:.1f} img/s), "
          f"{server.batches} batches, dtype={dtype}")
    print("note: over the axon tunnel, host->device image transfer "
          "dominates; on local TPU hosts the device step is the bound")
    return 0


def _load_ckpt(path: str):
    from .utils.checkpoint import load_params
    return load_params(path)


def cmd_export(opts: Options) -> int:
    """AOT-export a model for the pure-native PJRT client
    (native/build/vft_pjrt_demo; see utils/export_pjrt.py)."""
    from .utils.export_pjrt import export_vit
    out = export_vit(opts.get("out", str, "/tmp/vft_pjrt_model"),
                     variant=opts.get("model", str, "vit_b16"),
                     image_size=opts.get("image", int, 224),
                     batch=opts.get("batch", int, 8),
                     num_classes=opts.get("classes", int, 1000),
                     dtype=opts.get("dtype", str, "bfloat16"),
                     seed=opts.get("seed", int, 0))
    print(out)
    return 0


def cmd_calibrate(opts: Options) -> int:
    """Measure a checkpoint's attention-score range and report whether
    the max-free softmax fast path is safe for it (utils/calibrate.py).
    ``ckpt=`` loads a save_params .npz; without it, a fresh init is
    probed (illustrative)."""
    import jax
    from .models import vit
    from .utils import calibrate
    from .utils.checkpoint import load_params
    cfg = vit.config(opts.get("model", str, "vit_b16"),
                     image_size=opts.get("image", int, 224),
                     dtype=opts.get("dtype", str, "bfloat16"))
    ckpt = opts.get("ckpt", str, "")
    params = (load_params(ckpt) if ckpt
              else vit.init_params(jax.random.key(0), cfg))
    res = calibrate.choose_softmax_mode(params, cfg)
    print(f"score range: [{res.score_min:.1f}, {res.score_max:.1f}]  "
          f"per-layer max: {np.round(res.per_layer_max, 1).tolist()}")
    print(f"softmax mode: {res.mode}"
          + ("  (set ViTConfig.safe_softmax=True)" if res.safe else ""))
    return 0


COMMANDS = {"demo": cmd_demo, "bench": cmd_bench, "parity": cmd_parity,
            "serve": cmd_serve, "export": cmd_export,
            "calibrate": cmd_calibrate}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in COMMANDS:
        print(__doc__)
        return 2
    return COMMANDS[argv[0]](Options(argv[1:]))


if __name__ == "__main__":
    sys.exit(main())
