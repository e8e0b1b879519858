"""Int8 quantized-path tests: bit-exact dense parity, ViT int8 tolerance."""

import numpy as np

import jax.numpy as jnp

from vit_fpga_tpu.defines import ACT_IDENTITY, ACT_RELU2, random_net
from vit_fpga_tpu.models import quantized, vit
from vit_fpga_tpu.ops import quant


def test_quantizer_numpy_jnp_identical():
    x = np.random.default_rng(0).normal(size=(64, 32)).astype(np.float32)
    qn, sn = quant.quantize_numpy(x)
    qj, sj = quant.quantize_jnp(jnp.asarray(x))
    np.testing.assert_array_equal(qn, np.asarray(qj))
    np.testing.assert_allclose(sn, float(sj), rtol=1e-7)


def test_int8_linear_xla_bit_exact_vs_numpy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(16, 48)).astype(np.float32)
    w = rng.normal(size=(48, 24)).astype(np.float32)
    b = rng.normal(size=(24,)).astype(np.float32)
    xq, sx = quant.quantize_numpy(x)
    wq, sw = quant.quantize_numpy(w)
    ref = quant.int8_linear_numpy(xq, sx, wq, sw, b)
    out = np.asarray(quant.int8_linear_xla(
        jnp.asarray(xq), sx, jnp.asarray(wq), sw, jnp.asarray(b)))
    np.testing.assert_array_equal(out, ref)  # BIT exact


def test_int8_gemm_pallas_exact():
    rng = np.random.default_rng(2)
    xq = rng.integers(-127, 128, size=(100, 130), dtype=np.int8)
    wq = rng.integers(-127, 128, size=(130, 70), dtype=np.int8)
    ref = xq.astype(np.int32) @ wq.astype(np.int32)
    out = np.asarray(quant.int8_gemm_pallas(
        jnp.asarray(xq), jnp.asarray(wq), bm=128, bn=128, bk=128,
        interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_mlp_int8_bit_exact_parity():
    """The quantized dense path: numpy oracle == device, bit for bit."""
    data = random_net(32, [64, 48, 8], seed=3,
                      activations=[ACT_RELU2, ACT_RELU2, ACT_IDENTITY])
    qp = quantized.quantize_mlp(data)
    x = np.random.default_rng(4).normal(size=(16, 32)).astype(np.float32)
    ref = quantized.mlp_forward_int8_numpy(qp, x)
    dev = quantized.device_qparams(qp)
    out = np.asarray(quantized.mlp_forward_int8(
        dev, jnp.asarray(x), qp["acts"], impl="xla"))
    np.testing.assert_array_equal(out, ref)


def test_mlp_int8_close_to_f32():
    data = random_net(32, [64, 8], seed=5,
                      activations=[ACT_RELU2, ACT_IDENTITY])
    from vit_fpga_tpu.backends.cpu import NetCPU
    f32 = NetCPU(data)
    qp = quantized.quantize_mlp(data)
    x = np.random.default_rng(6).normal(size=(8, 32)).astype(np.float32)
    ref = f32.forward_batch(x)
    out = quantized.mlp_forward_int8_numpy(qp, x)
    # int8 quantization noise bound, not exactness
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 0.1 * scale + 0.5


def test_vit_int8_forward():
    cfg = vit.ViTConfig(image_size=32, patch_size=8, hidden_dim=64,
                        depth=2, num_heads=4, mlp_dim=128, num_classes=10,
                        dtype="float32", attn_impl="xla")
    import jax
    params = vit.init_params(jax.random.key(0), cfg)
    qp = quantized.quantize_vit(params)
    imgs = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 32, 32, 3)), jnp.float32)
    ref = np.asarray(vit.forward(params, imgs, cfg))
    out = np.asarray(quantized.vit_forward_int8(qp, imgs, cfg, impl="xla"))
    assert out.shape == ref.shape
    # logit parity within quantization tolerance
    denom = np.abs(ref).max() + 1e-6
    rel = np.abs(out - ref).max() / denom
    assert rel < 0.25, f"int8 logits off by {rel:.3f} (rel)"
    # top-1 agreement on random nets is a weak but meaningful check
    assert (out.argmax(-1) == ref.argmax(-1)).mean() >= 0.5
