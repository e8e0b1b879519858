#!/usr/bin/env python
"""Headline benchmark: ViT-B/16 @224 bf16 batch-64 inference throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
fraction of the TPU v5e bf16 roofline achieved (i.e. model FLOPs
utilization): roofline img/s = peak_flops / flops_per_image.  Targets from
BASELINE.json: > 0.90.

Usage: python bench.py [model=vit_b16] [batch=64] [image=224]
                       [dtype=bfloat16] [iters=10] [inner=8] [attn=auto]
                       [raw=false] [json_only=true] [mode=throughput]
                       [extras=auto]

With no arguments (the driver invocation) the line also carries an
"extras" dict with the int8-throughput and bf16/int8 batch-1 latency
configs, so every BENCH_r*.json artifact records all headline numbers;
pass extras=false (or any explicit argument) to run one config only.

Modes:
  throughput — images/sec at the given batch (default; the headline)
  latency    — batch-1 single-image p50/p99 latency in µs (the second half
               of BASELINE.json's metric; the reference's µs counter at
               /root/reference/src/netFPGA.cpp:262-284 was latency-only)
  train      — ms per optimizer step (ViT classification, optax sgd),
               net-new capability: the reference stubs training entirely
"""

from __future__ import annotations

import json
import sys


def vit_flops_per_image(cfg) -> float:
    """Analytic forward FLOPs (2*MACs) per image, incl. patch embed."""
    n, d, m, l = cfg.seq_len, cfg.hidden_dim, cfg.mlp_dim, cfg.depth
    p3 = cfg.patch_size * cfg.patch_size * 3
    patch = 2 * cfg.n_patches * p3 * d
    qkv = 2 * n * d * 3 * d
    attn = 2 * 2 * n * n * d
    proj = 2 * n * d * d
    mlp = 2 * 2 * n * d * m
    head = 2 * d * cfg.num_classes
    return patch + l * (qkv + attn + proj + mlp) + head


def main(argv):
    from vit_fpga_tpu.utils.options import Options
    opts = Options(argv)
    extras = opts.get("extras", bool, not argv)
    result = run(opts)
    if extras and result.get("unit") == "images/sec/chip":
        # Attach the other BASELINE-relevant configs to the single JSON
        # line so the driver artifact (BENCH_r*.json) records them too:
        # the reference's defining datapath was fixed-point
        # (/root/reference/def/defines.h:10-12) and its primary metric
        # per-call us latency (/root/reference/src/netFPGA.cpp:262-284).
        #
        # If a harness timeout SIGTERMs us mid-extras (7 configs cold-
        # compile in ~15-25 min through the tunnel), emit the headline +
        # whatever extras completed instead of dying output-less: a
        # partial artifact beats an empty one.
        import signal

        def _emit_and_exit(signum, frame):  # noqa: ARG001
            result.setdefault("extras", {})["truncated"] = (
                "SIGTERM during extras; headline + completed extras only")
            print(json.dumps(result), flush=True)
            raise SystemExit(0)

        prev_handler = signal.signal(signal.SIGTERM, _emit_and_exit)
        result["extras"] = {}
        for key, extra_argv in (
            ("int8_throughput", ["dtype=int8"]),
            ("int8_static_throughput", ["dtype=int8", "quant=static"]),
            ("bf16_latency", ["mode=latency"]),
            ("int8_latency", ["mode=latency", "dtype=int8"]),
            ("int8_static_latency",
             ["mode=latency", "dtype=int8", "quant=static"]),
            ("train", ["mode=train"]),
        ):
            try:
                result["extras"][key] = run(Options(list(extra_argv)))
            except Exception as e:  # noqa: BLE001 — extras never break
                result["extras"][key] = {"error": f"{type(e).__name__}: "
                                                  f"{e}"}
        signal.signal(signal.SIGTERM, prev_handler)
    print(json.dumps(result))


def run(opts):
    model = opts.get("model", str, "vit_b16")
    mode = opts.get("mode", str, "throughput")
    batch = opts.get("batch", int, 1 if mode == "latency" else 64)
    image = opts.get("image", int, 224)
    dtype = opts.get("dtype", str, "bfloat16")
    # Latency mode chains many more calls per loop: at ~200 us/call the
    # default 10-call slope is ~2 ms of signal against ~30 ms of tunnel
    # RTT jitter, and the conservative contention guard then inflates
    # the report (measured: int8 b1 read 252 us with short loops vs a
    # stable 167 us at n=256 — experiments/perf_int8_lat_ablate.py).
    iters = opts.get("iters", int, 224 if mode == "latency" else 10)
    inner = opts.get("inner", int, 32 if mode == "latency" else 8)
    attn = opts.get("attn", str, "auto")
    json_only = opts.get("json_only", bool, True)

    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
    import jax
    import jax.numpy as jnp
    from vit_fpga_tpu.models import vit
    from vit_fpga_tpu.ops.common import V5E_BF16_FLOPS
    from vit_fpga_tpu.utils.timing import time_device_loop

    is_clip = model.startswith("clip_")
    is_deit = model.startswith("deit_")
    if is_clip:
        from vit_fpga_tpu.models import clip
        cfg = clip.clip_vision_config(model.removeprefix("clip_"),
                                      image_size=image, dtype=dtype,
                                      attn_impl=attn)
        params = jax.device_put(
            clip.init_params(jax.random.key(0), cfg, projection_dim=768))
    elif is_deit:
        from vit_fpga_tpu.models import deit
        cfg = deit.config(model, image_size=image, dtype=dtype,
                          attn_impl=attn)
        params = jax.device_put(deit.init_params(jax.random.key(0), cfg))
    else:
        cfg = vit.config(model, image_size=image, dtype=dtype,
                         attn_impl=attn)
        params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
    images = jax.device_put(
        jax.random.normal(jax.random.key(1), (batch, image, image, 3),
                          jnp.float32).astype(cfg.compute_dtype))

    if dtype == "int8":
        # fast row-wise fused path (the per-tensor bit-exact path is the
        # parity harness, not the serving path); quant=static selects the
        # calibrated static-scale datapath (round 5 — the reference-
        # faithful fixed-point mode, /root/reference/def/defines.h:11-12)
        quant = opts.get("quant", str, "dynamic")
        from vit_fpga_tpu.models import quantized
        if is_clip:
            if quant == "static":
                qparams = jax.device_put(
                    quantized.quantize_clip_vision_static(params, cfg))
            else:
                qparams = jax.device_put(
                    quantized.quantize_clip_vision_fast(params))

            def fwd(p, x):
                return quantized.clip_forward_int8_fast(p, x, cfg)
        else:
            if quant == "static":
                qparams = jax.device_put(
                    quantized.quantize_vit_static(params, cfg))
            else:
                qparams = jax.device_put(
                    quantized.quantize_vit_fast(params))

            def fwd(p, x):
                return quantized.vit_forward_int8_fast(p, x, cfg)

        run_params = qparams
    else:
        if is_clip:
            from vit_fpga_tpu.models import clip as _clip

            def fwd(p, x):
                return _clip.forward(p, x, cfg)
        elif is_deit:
            from vit_fpga_tpu.models import deit as _deit

            def fwd(p, x):
                return _deit.forward(p, x, cfg)
        else:
            def fwd(p, x):
                return vit.forward(p, x, cfg)

        run_params = params

    if mode == "latency" and dtype == "int8" and not is_clip:
        from vit_fpga_tpu.models import quantized as _q
        if _q.int8_latency_supported(cfg, batch):
            # prep-once cls-last fold: posb/cast work stays off the
            # per-request path (models/quantized.prep_int8_latency)
            run_params = jax.device_put(_q.prep_int8_latency(qparams, cfg))

            def fwd(p, x):  # noqa: F811
                return _q.vit_forward_int8_latency(p, x, cfg)

    if mode == "latency" and dtype == "int8" and is_clip:
        from vit_fpga_tpu.models import quantized as _q
        if _q.clip_int8_latency_supported(cfg, batch):
            def fwd(p, x):  # noqa: F811
                return _q.clip_forward_int8_latency(p, x, cfg)

    if mode == "latency" and dtype == "bfloat16":
        # single-launch whole-encoder kernel (layers on the grid,
        # weights double-buffered per layer)
        if is_clip:
            from vit_fpga_tpu.models import clip as _clipm
            if _clipm.latency_forward_supported(cfg, batch):
                def fwd(p, x):  # noqa: F811
                    return _clipm.forward_latency(p, x, cfg)
        else:
            # NOT the one-kernel forward_latency_logits: fusing embed +
            # head into the stack kernel LOSES 10-25 us bf16 / ties int8
            # (experiments/perf_full_stack.py) — the separate launches
            # overlap, the fused stages serialize into the grid.
            from vit_fpga_tpu.models.vit import (forward_latency,
                                                 latency_forward_supported,
                                                 prep_latency)
            if latency_forward_supported(cfg, batch):
                run_params = jax.device_put(prep_latency(params, cfg))

                def fwd(p, x):  # noqa: F811
                    return forward_latency(p, x, cfg)

    if mode == "train":
        # ms per optimizer step — net-new capability: the reference stubs
        # training entirely (/root/reference/src/netFPGA.cpp:518-580).
        if is_clip or dtype == "int8":
            raise SystemExit("mode=train supports the ViT classifier "
                             "family in bf16/float32")
        import optax
        from vit_fpga_tpu.train.trainer import make_vit_train_step
        opt = optax.sgd(1e-4)
        opt_state = jax.device_put(opt.init(params))
        labels = jax.device_put(jnp.zeros((batch,), jnp.int32))
        step = make_vit_train_step(cfg, opt, donate=False)

        # images LAST: the device-loop timer threads its serial-dependency
        # perturbation through the final argument, which must be float.
        # Fold every updated parameter into the returned scalar — without
        # this XLA dead-code-eliminates the whole backward + optimizer
        # (observed: "train" matching pure-forward time).
        def train_once(p, s, y, x):
            p2, _, m = step(p, s, x, y)
            leaves = jax.tree_util.tree_leaves(p2)
            anchor = sum(jnp.sum(l).astype(jnp.float32) * 1e-20
                         for l in leaves)
            return m["loss"] + anchor

        sec = time_device_loop(train_once,
                               (params, opt_state, labels, images),
                               n_lo=2, n_hi=2 + max(4, iters // 2), reps=3)
        fwd_flops = vit_flops_per_image(cfg) * batch
        train_flops = 3 * fwd_flops   # fwd + 2x bwd (standard estimate)
        peak = V5E_BF16_FLOPS if dtype == "bfloat16" else V5E_BF16_FLOPS / 2
        return {
            "metric": f"{model}@{image}px {dtype} batch-{batch} "
                      "train step time",
            "value": round(sec * 1e3, 3),
            "unit": "ms/step",
            "vs_baseline": round(train_flops / sec / peak, 4),
        }

    sec_per_call = time_device_loop(fwd, (run_params, images),
                                    n_lo=inner, n_hi=inner + iters,
                                    reps=3)
    imgs_per_s = batch / sec_per_call

    if mode == "latency":
        # Batch-1 warm-path single-image latency.  The device-loop timer
        # measures pure device time per call (the tunnel acks dispatch
        # early, so host-side percentiles are transport noise here); p50
        # and p99 are taken over per-rep loop estimates.
        reps = []
        for _ in range(5):
            reps.append(time_device_loop(fwd, (run_params, images),
                                         n_lo=inner, n_hi=inner + iters,
                                         reps=1))
        reps.sort()
        p50 = reps[len(reps) // 2]
        peak = (V5E_BF16_FLOPS if dtype == "bfloat16" else
                2 * V5E_BF16_FLOPS if dtype == "int8" else
                V5E_BF16_FLOPS / 2)
        ideal = vit_flops_per_image(cfg) * batch / peak
        return {
            "metric": f"{model}@{image}px {dtype} batch-{batch} "
                      "single-image p50 latency",
            "value": round(p50 * 1e6, 1),
            "unit": "us",
            # honest label: max over the 5 loop estimates, NOT a true
            # p99 (each estimate is itself a device-loop mean)
            "max_us": round(reps[-1] * 1e6, 1),
            "vs_baseline": round(ideal / p50, 4),
        }

    flops = vit_flops_per_image(cfg)
    if dtype == "bfloat16":
        peak = V5E_BF16_FLOPS
    elif dtype == "int8":
        peak = 2 * V5E_BF16_FLOPS   # v5e int8 = 394 TOPS
    else:
        peak = V5E_BF16_FLOPS / 2   # f32 full-precision mode
    roofline = peak / flops
    mfu = imgs_per_s / roofline

    if not json_only:
        print(f"# {model}@{image} batch={batch} {dtype} attn={attn} "
              f"step={sec_per_call * 1e3:.2f}ms "
              f"flops/img={flops / 1e9:.1f}G roofline={roofline:.0f}img/s "
              f"backend={jax.default_backend()}", file=sys.stderr)
    return {
        "metric": f"{model}@{image}px {dtype} batch-{batch} "
                  "inference throughput",
        "value": round(imgs_per_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(mfu, 4),
    }


if __name__ == "__main__":
    main(sys.argv[1:])
