"""Does keeping tokens in the sublane-padded layout (B, n_pad, D) across
the whole encoder beat per-layer pad/slice?

Config A (production): tokens stay (B, 197, D); every attn_block_pallas
call pads to 208 and slices back, every fused_mlp call pads 12608->12800.
Config B: pad ONCE after embed to (B, 208, D), run all 12 blocks with
n_valid=197 (no per-layer pad/slice; MLP runs 13312 rows = 26 exact
cells), slice once at the end.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from vit_fpga_tpu.ops.attn_block import attn_block_pallas, attn_block_xla
from vit_fpga_tpu.ops.fused_mlp import fused_mlp_pallas
from vit_fpga_tpu.utils.timing import time_device_loop_single

B, N, D, H, M, L = 64, 197, 768, 12, 3072, 12
NP = 208

ks = jax.random.split(jax.random.key(0), 10)
x = jax.device_put(jax.random.normal(ks[0], (B, N, D), jnp.bfloat16))
blk = dict(
    ls1=jnp.ones((D,), jnp.float32), lb1=jnp.zeros((D,), jnp.float32),
    wqkv=jax.device_put(jax.random.normal(ks[1], (D, 3 * D), jnp.bfloat16)
                        * 0.02),
    bqkv=jnp.zeros((3 * D,), jnp.float32),
    wo=jax.device_put(jax.random.normal(ks[2], (D, D), jnp.bfloat16) * 0.02),
    bo=jnp.zeros((D,), jnp.float32),
    ls2=jnp.ones((D,), jnp.float32), lb2=jnp.zeros((D,), jnp.float32),
    w1=jax.device_put(jax.random.normal(ks[3], (D, M), jnp.bfloat16) * 0.02),
    b1=jnp.zeros((M,), jnp.float32),
    w2=jax.device_put(jax.random.normal(ks[4], (M, D), jnp.bfloat16) * 0.02),
    b2=jnp.zeros((D,), jnp.float32),
)


def block_a(h, b):
    h = attn_block_pallas(h, b["ls1"], b["lb1"], b["wqkv"], b["bqkv"],
                          b["wo"], b["bo"], H)
    t = h.reshape(B * N, D)
    t = fused_mlp_pallas(t, b["ls2"], b["lb2"], b["w1"], b["b1"],
                         b["w2"], b["b2"], act="gelu_tanh")
    return t.reshape(B, N, D)


def enc_a(b, h):
    for _ in range(L):
        h = block_a(h, b)
    return h


def block_b(h, b):
    h = attn_block_pallas(h, b["ls1"], b["lb1"], b["wqkv"], b["bqkv"],
                          b["wo"], b["bo"], H, n_valid=N)
    t = h.reshape(B * NP, D)
    t = fused_mlp_pallas(t, b["ls2"], b["lb2"], b["w1"], b["b1"],
                         b["w2"], b["b2"], act="gelu_tanh")
    return t.reshape(B, NP, D)


def enc_b(b, h):
    hp = jnp.pad(h, [(0, 0), (0, NP - N), (0, 0)])
    for _ in range(L):
        hp = block_b(hp, b)
    return hp[:, :N]


ra = np.asarray(jax.jit(enc_a)(blk, x), np.float32)
rb = np.asarray(jax.jit(enc_b)(blk, x), np.float32)
print("maxdiff A vs B:", np.abs(ra - rb).max(), flush=True)

for rnd in range(4):
    ta = time_device_loop_single(enc_a, (blk, x), n=8, reps=3)
    tb = time_device_loop_single(enc_b, (blk, x), n=8, reps=3)
    print(f"A(per-layer pad) {ta * 1e3:7.3f} ms   "
          f"B(padded residency) {tb * 1e3:7.3f} ms", flush=True)
