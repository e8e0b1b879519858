"""Batch-1 embed-stage shootout: can the patchify transpose be removed?

perf_lat_split.py showed the "patch" stage (astype + patchify [+ pad])
costs ~18 us at batch 1 — the strided 6-d transpose inside patchify is
the cost, not the pad (cls-last removed the pad for ~2-3 us).  The
transpose exists only to build the (N, P*P*3) patch matrix for the
embed GEMM; the GEMM itself is ~1 us of MXU time.  Four ways to get
from a (1, 224, 224, 3) bf16 image to the (1, n_pad, D) cls-last token
tensor:

  xla_t   patchify (reshape+transpose+reshape) -> embed_tokens_cls_last
          [the current forward_latency path]
  conv    lax.conv stride P on the raw image (XLA implicit-GEMM conv),
          then XLA posb assembly (add + concat prefix/tail rows)
  dotg    transpose-FREE: reshape (1,gh,P,gw,P*3) (all contiguous
          splits), multi-contracting dot_general over (P, P*3),
          then XLA posb assembly
  strip   Pallas kernel consuming the same transpose-free reshape:
          P accumulation dots of (gh*gw, P*3) @ (P*3, D) per image,
          posb add + prefix/tail rows in-kernel (one launch, no XLA
          relayout anywhere)

All four are parity-checked against each other before timing.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.models import vit
from vit_fpga_tpu.utils.timing import time_device_loop_single

# -- inlined copy of the superseded round-2 cls-last embed kernel (removed
#    from ops/patch_embed.py after dotg won) so xla_t stays runnable -------
def _cls_last_kernel(p_ref, k_ref, pb_ref, o_ref, *, n_patches: int):
    acc = jnp.dot(p_ref[0], k_ref[:], preferred_element_type=jnp.float32)
    o_ref[0, :n_patches] = (acc + pb_ref[:n_patches]).astype(o_ref.dtype)
    o_ref[0, n_patches:] = pb_ref[n_patches:].astype(o_ref.dtype)


@jax.jit
def embed_tokens_cls_last(patches, kernel, posb):
    b, npch, p3 = patches.shape
    n_pad, d = posb.shape
    return pl.pallas_call(
        functools.partial(_cls_last_kernel, n_patches=npch),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, npch, p3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p3, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), kernel.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(patches, kernel, posb.astype(jnp.float32))


cfg = vit.config("vit_b16", image_size=224, dtype="bfloat16")
P = cfg.patch_size
GH = GW = cfg.image_size // P
NPCH = GH * GW
N = cfg.seq_len
NPAD = 208
D = cfg.hidden_dim
P3 = P * 3          # one pixel-row of one patch: (px, c)


def _strip_kernel(x_ref, k_ref, pb_ref, o_ref, *, n_patches: int):
    # x_ref: (1, GH, P, GW, P3); k_ref: (P, P3, D); pb_ref: (NPAD, D)
    acc = jnp.zeros((n_patches, D), jnp.float32)
    for py in range(P):
        rows = x_ref[0, :, py].reshape(n_patches, P3)
        acc = acc + jnp.dot(rows, k_ref[py],
                            preferred_element_type=jnp.float32)
    o_ref[0, :n_patches] = (acc + pb_ref[:n_patches]).astype(o_ref.dtype)
    o_ref[0, n_patches:] = pb_ref[n_patches:].astype(o_ref.dtype)


@jax.jit
def strip_embed(x5: jax.Array, k3: jax.Array, posb: jax.Array):
    b = x5.shape[0]
    return pl.pallas_call(
        functools.partial(_strip_kernel, n_patches=NPCH),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, GH, P, GW, P3), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, P3, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NPAD, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NPAD, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, NPAD, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x5, k3, posb.astype(jnp.float32))


def main():
    params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
    prep = jax.device_put(vit.prep_latency(params, cfg))
    wp, posb = prep["wp_cl"], prep["posb_cl"]          # (P3*P, D), (NPAD, D)
    k4 = wp.reshape(P, P, 3, D)                         # (py, px, c, d)
    k3 = wp.reshape(P, P3, D)                           # (py, (px,c), d)
    img = jax.device_put(jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 224, 224, 3)) * 0.5,
        jnp.bfloat16))

    @jax.jit
    def xla_t(x):
        pch = vit.patchify(x, P)
        return embed_tokens_cls_last(pch, wp, posb)

    def _assemble(flat):
        # flat: (1, NPCH, D) f32 GEMM output -> cls-last padded tokens
        body = (flat + posb[None, :NPCH]).astype(jnp.bfloat16)
        tail = jnp.broadcast_to(posb[None, NPCH:].astype(jnp.bfloat16),
                                (flat.shape[0], NPAD - NPCH, D))
        return jnp.concatenate([body, tail], axis=1)

    @jax.jit
    def conv(x):
        y = jax.lax.conv_general_dilated(
            x, k4.astype(jnp.bfloat16), (P, P), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return _assemble(y.reshape(1, NPCH, D))

    @jax.jit
    def dotg(x):
        x5 = x.reshape(1, GH, P, GW, P3)
        y = jax.lax.dot_general(
            x5, k3, (((2, 4), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)
        return _assemble(y.reshape(1, NPCH, D))

    @jax.jit
    def strip(x):
        return strip_embed(x.reshape(1, GH, P, GW, P3), k3, posb)

    fns = [("xla_t", xla_t), ("conv", conv), ("dotg", dotg),
           ("strip", strip)]
    ref = None
    for name, f in fns:
        try:
            out = np.asarray(jax.block_until_ready(f(img)), np.float32)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            fns = [x for x in fns if x[0] != name]
            continue
        if ref is None:
            ref = out
        else:
            err = np.max(np.abs(out - ref))
            print(f"{name}: parity max|d|={err:.4f}")
            assert err < 0.1, name
    print("parity ok", flush=True)

    for rnd in range(4):
        line = []
        for name, f in fns:
            t = time_device_loop_single(f, (img,), n=512)
            line.append(f"{name} {t * 1e6:6.1f}")
        print(f"round {rnd}: " + "  ".join(line) + "  (us)", flush=True)


if __name__ == "__main__":
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    main()


def main_b64():
    """Throughput-path stage A/B: _fused_embed (patchify+pad+kernel,
    cls-FIRST) vs transpose-free dotg + XLA assembly at batch 64."""
    params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
    img = jax.device_put(jnp.asarray(
        np.random.default_rng(0).normal(size=(64, 224, 224, 3)) * 0.5,
        jnp.bfloat16))
    wp = params["patch_embed"]["kernel"].astype(jnp.bfloat16)
    k3 = wp.reshape(P, P3, D)
    pos = params["pos_embed"][0].astype(jnp.float32)
    bias = params["patch_embed"]["bias"].astype(jnp.float32)
    pre = params["cls_token"][0].astype(jnp.float32)
    posb_first = jnp.concatenate([
        pre + pos[:1], pos[1:] + bias,
        jnp.zeros((NPAD - N, D), jnp.float32)], axis=0)
    posb_first = jax.device_put(posb_first)

    @jax.jit
    def cur(x):
        return vit._fused_embed(params, x, cfg, NPAD)

    @jax.jit
    def dotg64(x):
        b = x.shape[0]
        x5 = x.reshape(b, GH, P, GW, P3)
        y = jax.lax.dot_general(
            x5, k3, (((2, 4), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)
        body = (y.reshape(b, NPCH, D)
                + posb_first[None, 1:1 + NPCH]).astype(jnp.bfloat16)
        head_ = jnp.broadcast_to(
            posb_first[None, :1].astype(jnp.bfloat16), (b, 1, D))
        tail = jnp.broadcast_to(
            posb_first[None, 1 + NPCH:].astype(jnp.bfloat16),
            (b, NPAD - 1 - NPCH, D))
        return jnp.concatenate([head_, body, tail], axis=1)

    a = np.asarray(jax.block_until_ready(cur(img)), np.float32)
    bb = np.asarray(jax.block_until_ready(dotg64(img)), np.float32)
    print("b64 parity max|d|=", np.max(np.abs(a - bb)), flush=True)
    for rnd in range(4):
        ta = time_device_loop_single(cur, (img,), n=128)
        tb = time_device_loop_single(dotg64, (img,), n=128)
        print(f"round {rnd}: fused_embed {ta*1e6:7.1f}  dotg {tb*1e6:7.1f}"
              "  (us)", flush=True)
