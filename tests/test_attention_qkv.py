"""Packed-qkv attention parity: pallas kernel vs einsum reference vs the
unpacked mha implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from vit_fpga_tpu.ops.attention import (mha_qkv_pallas, mha_qkv_xla,
                                        mha_xla)


@pytest.mark.parametrize("n", [64, 197])
def test_mha_qkv_pallas_matches_xla(n):
    rng = np.random.default_rng(0)
    b, nh, dh = 2, 4, 32
    d = nh * dh
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * d)), jnp.float32)
    ref = mha_qkv_xla(qkv, nh)
    out = mha_qkv_pallas(qkv, nh, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_mha_qkv_xla_matches_unpacked():
    rng = np.random.default_rng(1)
    b, n, nh, dh = 2, 33, 3, 16
    d = nh * dh
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * d)), jnp.float32)
    packed = mha_qkv_xla(qkv, nh)
    q = qkv[..., :d].reshape(b, n, nh, dh).transpose(0, 2, 1, 3)
    k = qkv[..., d:2 * d].reshape(b, n, nh, dh).transpose(0, 2, 1, 3)
    v = qkv[..., 2 * d:].reshape(b, n, nh, dh).transpose(0, 2, 1, 3)
    unpacked = mha_xla(q, k, v).transpose(0, 2, 1, 3).reshape(b, n, d)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(unpacked),
                               rtol=1e-5, atol=1e-5)


def test_mha_qkv_key_masking():
    rng = np.random.default_rng(2)
    b, n, nh, dh = 1, 64, 2, 32
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * nh * dh)), jnp.float32)
    ref = mha_qkv_xla(qkv, nh, n_valid=40)
    out = mha_qkv_pallas(qkv, nh, n_valid=40, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
