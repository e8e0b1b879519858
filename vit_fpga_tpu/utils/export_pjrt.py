"""AOT export for the pure-native PJRT client.

The reference ships a static library an app links with NO Python anywhere
(/root/reference/Makefile:75,94-95).  Round 1's native TPU path embedded a
CPython interpreter (native/src/net_tpu_embed.cc); this module provides
the true native analogue: export the jitted model as StableHLO + flat
weights, and the C++ PJRT C-API client (native/src/net_pjrt.cc) compiles
and runs it against any PJRT plugin (libtpu.so on a TPU host) with no
libpython in sight.

Artifacts written to ``out_dir``:
  model.mlir          — StableHLO text of forward_raw(params, uint8 imgs)
  compile_options.pb  — serialized xla.CompileOptionsProto
  weights.bin         — all param leaves, raw bytes, back to back
  manifest.txt        — arg table (see format below), line-oriented so the
                        C++ side needs no JSON parser

Manifest format (whitespace-separated, one record per line):
  vft-pjrt-manifest v1
  nargs <N>
  arg <idx> <kind weight|input> <dtype> <ndim> <dims...> <offset> <nbytes>
  out <dtype> <ndim> <dims...>
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_DTYPE_NAMES = {"float32": "f32", "bfloat16": "bf16", "uint8": "u8",
                "int8": "i8", "int32": "i32"}


def export_vit(out_dir: str, variant: str = "vit_b16",
               image_size: int = 224, batch: int = 8,
               num_classes: int = 1000, dtype: str = "bfloat16",
               params: Optional[dict] = None, seed: int = 0) -> str:
    """Lower a model's raw-pixel forward for a fixed batch and dump the
    native-client artifact directory.  Returns ``out_dir``.

    Families: ViT variants (any ``models.vit`` name), ``clip_*`` vision
    towers (embeddings out), and ``dtype="int8"`` for BOTH (the quantized
    mega-kernel path — weights exported already-quantized)."""
    import jax
    import jax.numpy as jnp
    from jaxlib import xla_client

    from ..models import vit

    is_clip = variant.startswith("clip_")
    if is_clip:
        from ..models import clip
        cfg = clip.clip_vision_config(variant.removeprefix("clip_"),
                                      image_size=image_size,
                                      dtype="bfloat16"
                                      if dtype == "int8" else dtype)
        if params is None:
            params = clip.init_params(jax.random.key(seed), cfg,
                                      projection_dim=num_classes or 768)
        model_fn = lambda p, x: clip.forward_raw(p, x, cfg)  # noqa: E731
        out_cols = params["proj"].shape[1]
    else:
        cfg = vit.config(variant, image_size=image_size,
                         num_classes=num_classes,
                         dtype="bfloat16" if dtype == "int8" else dtype)
        if params is None:
            params = vit.init_params(jax.random.key(seed), cfg)
        model_fn = lambda p, x: vit.forward_raw(p, x, cfg)  # noqa: E731
        out_cols = num_classes
    if dtype == "int8":
        from ..models import quantized
        if is_clip:
            params = quantized.quantize_clip_vision_fast(params)

            def model_fn(p, x):  # noqa: F811
                return quantized.clip_forward_int8_fast(
                    p, vit.preprocess(x, cfg), cfg)
        else:
            params = quantized.quantize_vit_fast(params)

            def model_fn(p, x):  # noqa: F811
                return quantized.vit_forward_int8_fast(
                    p, vit.preprocess(x, cfg), cfg)

    img_spec = jax.ShapeDtypeStruct((batch, image_size, image_size, 3),
                                    jnp.uint8)
    return _write_artifacts(out_dir, model_fn, params, img_spec,
                            ("f32", (batch, out_cols)))


def _write_artifacts(out_dir: str, model_fn, params, input_spec,
                     out_spec) -> str:
    """Lower ``model_fn(params, input)`` and write the artifact dir."""
    import jax
    from jaxlib import xla_client

    lowered = jax.jit(model_fn).lower(params, input_spec)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "model.mlir"), "w") as f:
        f.write(lowered.as_text())
    with open(os.path.join(out_dir, "compile_options.pb"), "wb") as f:
        f.write(xla_client.CompileOptions().SerializeAsString())

    leaves = jax.tree_util.tree_leaves(params)
    lines = ["vft-pjrt-manifest v1", f"nargs {len(leaves) + 1}"]
    offset = 0
    with open(os.path.join(out_dir, "weights.bin"), "wb") as f:
        for i, leaf in enumerate(leaves):
            arr = np.asarray(leaf)
            name = _DTYPE_NAMES[str(arr.dtype)]
            raw = arr.tobytes()
            dims = " ".join(str(d) for d in arr.shape)
            lines.append(f"arg {i} weight {name} {arr.ndim} {dims} "
                         f"{offset} {len(raw)}")
            f.write(raw)
            offset += len(raw)
    in_dt = _DTYPE_NAMES[str(np.dtype(input_spec.dtype))]
    in_dims = " ".join(str(d) for d in input_spec.shape)
    lines.append(f"arg {len(leaves)} input {in_dt} "
                 f"{len(input_spec.shape)} {in_dims} 0 0")
    out_dt, out_dims = out_spec
    lines.append(f"out {out_dt} {len(out_dims)} "
                 + " ".join(str(d) for d in out_dims))
    with open(os.path.join(out_dir, "manifest.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return out_dir


def export_dense(out_dir: str, data=None, n_ins: int = 784,
                 widths=(256, 10), seed: int = 0,
                 compute_dtype: str = "float32") -> str:
    """Export the reference-layout dense net's forward (batch-1, the
    reference's exact inference shape — src/netFPGA.cpp:239-290) for the
    native PJRT client."""
    import jax
    import jax.numpy as jnp

    from .. import random_net
    from ..backends.tpu import _forward_fn

    if data is None:
        data = random_net(n_ins, list(widths), seed=seed)
    data.validate()
    params = [(jnp.asarray(np.ascontiguousarray(np.asarray(w).T),
                           jnp.float32),
               jnp.asarray(np.asarray(b), jnp.float32))
              for w, b in zip(data.params, data.bias)]
    acts = tuple(int(a) for a in data.activations)
    dt = jnp.float32 if compute_dtype == "float32" else jnp.bfloat16

    def fn(params, x):
        return _forward_fn(params, x, acts=acts, compute_dtype=dt)

    in_spec = jax.ShapeDtypeStruct((1, data.n_ins), jnp.float32)
    return _write_artifacts(out_dir, fn, params, in_spec,
                            ("f32", (1, int(data.n_p_l[-1]))))


def export_filter(out_dir: str, height: int = 1080, width: int = 1920,
                  kind: str = "sharpen") -> str:
    """Export the streaming image filter (the reference's image_process
    device program, src/netFPGA.cpp:303) as a PJRT artifact.  Output is
    uint8 — the client reads it with forward_bytes()."""
    import jax
    import jax.numpy as jnp

    from ..ops.image_filter import filter_image_device

    def fn(params, img):
        del params
        return filter_image_device(img, kind)

    in_spec = jax.ShapeDtypeStruct((height, width), jnp.uint8)
    return _write_artifacts(out_dir, fn, {}, in_spec,
                            ("u8", (height, width)))


def main(argv=None) -> None:
    import sys

    from .options import Options
    opts = Options(sys.argv[1:] if argv is None else argv)
    export_vit(opts.get("out", str, "/tmp/vft_pjrt_model"),
               variant=opts.get("model", str, "vit_b16"),
               image_size=opts.get("image", int, 224),
               batch=opts.get("batch", int, 8),
               num_classes=opts.get("classes", int, 1000),
               dtype=opts.get("dtype", str, "bfloat16"),
               seed=opts.get("seed", int, 0))
    print(opts.get("out", str, "/tmp/vft_pjrt_model"))


if __name__ == "__main__":
    main()
