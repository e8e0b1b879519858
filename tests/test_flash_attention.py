"""Blockwise flash attention parity vs the whole-sequence reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from vit_fpga_tpu.ops.attention import mha_xla
from vit_fpga_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("n,bq,bk", [(256, 128, 128), (300, 128, 128),
                                     (512, 256, 128)])
def test_flash_matches_reference(n, bq, bk):
    rng = np.random.default_rng(0)
    b, h, dh = 1, 2, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
               for _ in range(3))
    ref = mha_xla(q, k, v)
    out = flash_attention(q, k, v, bq=bq, bk=bk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_key_masking():
    rng = np.random.default_rng(1)
    b, h, n, dh = 1, 1, 256, 32
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
               for _ in range(3))
    ref = mha_xla(q, k, v, n_valid=200)
    out = flash_attention(q, k, v, n_valid=200, bq=128, bk=128,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
