"""Pallas/XLA kernels under shard_map on the virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_fpga_tpu.ops.attention import mha_qkv_xla
from vit_fpga_tpu.parallel.mesh import make_mesh
from vit_fpga_tpu.parallel.shard_ops import (fused_mlp_sharded,
                                             mha_qkv_sharded)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_mha_qkv_sharded_matches_single():
    mesh = make_mesh(dp=8, tp=1)
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(16, 33, 3 * 64)), jnp.float32)
    ref = np.asarray(mha_qkv_xla(qkv, 4))
    out = np.asarray(mha_qkv_sharded(qkv, 4, mesh, impl="xla"))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_fused_mlp_sharded_matches_single():
    from vit_fpga_tpu.ops.fused_mlp import fused_mlp_xla
    mesh = make_mesh(dp=4, tp=2)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    s = jnp.ones((32,), jnp.float32)
    b = jnp.zeros((32,), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(32, 64)) * 0.1, jnp.float32)
    b1 = jnp.zeros((64,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.float32)
    b2 = jnp.zeros((32,), jnp.float32)
    ref = np.asarray(fused_mlp_xla(x, s, b, w1, b1, w2, b2,
                                   act="gelu_tanh"))
    out = np.asarray(fused_mlp_sharded(x, s, b, w1, b1, w2, b2, mesh,
                                       act="gelu_tanh"))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_ring_attention_matches_single_device():
    """Sequence-parallel ring attention (k/v rotating via ppermute with
    online-softmax accumulation) is exact vs whole-sequence attention."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from vit_fpga_tpu.ops.attention import mha_xla
    from vit_fpga_tpu.parallel.shard_ops import ring_attention

    devs = np.asarray(jax.devices()[:4])
    mesh = Mesh(devs, axis_names=("sp",))
    rng = np.random.default_rng(0)
    B, H, N, Dh = 2, 3, 32, 16
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, Dh)), jnp.float32)
               for _ in range(3))
    ref = np.asarray(mha_xla(q, k, v))
    got = np.asarray(ring_attention(q, k, v, mesh))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
