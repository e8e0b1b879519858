"""Embed-stage decomposition at ViT-B b64 (round 3).

The dotg embed measures ~260 us vs a ~112 us floor (GEMM 75 + HBM 37).
Where does the rest sit?  Variants:
  A : production embed_tokens_dotg (u8 images in, padded tokens out)
  B : A with images pre-converted to bf16 (isolates the u8 convert)
  C : the raw 5D dot_general alone, no posb/concat (isolates assembly)
  D : C + posb add, no prefix/tail concat
  E : patches pre-reshaped (b*npch, p*p*3) 2D GEMM (isolates the 5D
      dot_general's layout handling)
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops.patch_embed import embed_tokens_dotg
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, HW, P, D = 64, 224, 16, 768
GH = HW // P
NPCH = GH * GH
N, NPRE, N_PAD = 197, 1, 208


def main():
    rng = np.random.default_rng(0)
    img_u8 = jnp.asarray(rng.integers(0, 256, (B, HW, HW, 3), np.uint8))
    img_bf = img_u8.astype(jnp.bfloat16)
    kern = jnp.asarray(rng.normal(size=(P * P * 3, D)) * 0.02,
                       jnp.bfloat16)
    posb = jnp.asarray(rng.normal(size=(N_PAD, D)) * 0.02, jnp.float32)

    fa = jax.jit(lambda im: embed_tokens_dotg(
        im.astype(jnp.bfloat16), kern, posb, P, NPRE))
    fb = jax.jit(lambda im: embed_tokens_dotg(im, kern, posb, P, NPRE))

    k3 = kern.reshape(P, P * 3, D)

    @jax.jit
    def fc(im):
        x5 = im.astype(jnp.bfloat16).reshape(B, GH, P, GH, P * 3)
        return jax.lax.dot_general(
            x5, k3, (((2, 4), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def fd(im):
        x5 = im.astype(jnp.bfloat16).reshape(B, GH, P, GH, P * 3)
        y = jax.lax.dot_general(
            x5, k3, (((2, 4), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y.reshape(B, NPCH, D)
                + posb[None, NPRE:NPRE + NPCH]).astype(jnp.bfloat16)

    @jax.jit
    def fe(flat):
        y = jnp.dot(flat, kern, preferred_element_type=jnp.float32)
        return (y.reshape(B, NPCH, D)
                + posb[None, NPRE:NPRE + NPCH]).astype(jnp.bfloat16)

    flat = jnp.asarray(
        rng.normal(size=(B * NPCH, P * P * 3)), jnp.bfloat16)

    @jax.jit
    def fd2(im):
        x5 = im.astype(jnp.bfloat16).reshape(B, GH, P, GH, P * 3)
        y = jax.lax.dot_general(
            x5, k3, (((2, 4), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)
        pb = posb[NPRE:NPRE + NPCH].reshape(1, GH, GH, D)
        return (y + pb).astype(jnp.bfloat16).reshape(B, NPCH, D)

    cases = [("A dotg(u8)", fa, (img_u8,)), ("B dotg(bf16)", fb,
                                             (img_bf,)),
             ("C 5Ddot", fc, (img_u8,)), ("D 5Ddot+posb", fd, (img_u8,)),
             ("E 2Dgemm+posb", fe, (flat,)),
             ("D2 add-pre-reshape", fd2, (img_u8,))]
    for rnd in range(3):
        line = f"round {rnd}:"
        for name, f, args in cases:
            t = time_device_loop_single(f, args, n=32)
            line += f"  {name} {t * 1e6:6.1f}us"
        print(line)


if __name__ == "__main__":
    main()
