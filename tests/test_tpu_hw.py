"""Hardware parity tests — run with VIT_TESTS_ON_TPU=1 on a real chip.

These compile the production (non-interpret) Pallas kernels and check
them against the XLA/oracle references on device.  Skipped on the CPU
test platform (interpret-mode parity is covered elsewhere).
"""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    not os.environ.get("VIT_TESTS_ON_TPU")
    or jax.default_backend() != "tpu",
    reason="needs real TPU (set VIT_TESTS_ON_TPU=1)")


def test_image_filter_bit_exact_on_hw():
    import jax.numpy as jnp
    from vit_fpga_tpu.ops.image_filter import (filter_image_numpy,
                                               filter_image_pallas)
    img = np.random.default_rng(0).integers(0, 256, (1080, 1920),
                                            np.uint8)
    out = np.asarray(filter_image_pallas(jnp.asarray(img), "sharpen"))
    ref = filter_image_numpy(img, "sharpen")
    np.testing.assert_array_equal(out, ref)


def test_fused_attention_parity_on_hw():
    import jax.numpy as jnp
    from vit_fpga_tpu.ops.attention import mha_qkv_pallas, mha_qkv_xla
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.normal(size=(4, 197, 3 * 768)), jnp.float32)
    ref = np.asarray(mha_qkv_xla(qkv, 12))
    out = np.asarray(mha_qkv_pallas(qkv, 12))
    np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)


def test_attn_block_parity_on_hw():
    import jax.numpy as jnp
    from vit_fpga_tpu.ops.attn_block import (attn_block_pallas,
                                             attn_block_xla)
    rng = np.random.default_rng(2)
    d, nh = 768, 12
    x = jnp.asarray(rng.normal(size=(2, 197, d)), jnp.float32)
    args = (jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1, jnp.float32),
            jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32),
            jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.02, jnp.float32),
            jnp.asarray(rng.normal(size=(3 * d,)) * 0.02, jnp.float32),
            jnp.asarray(rng.normal(size=(d, d)) * 0.02, jnp.float32),
            jnp.asarray(rng.normal(size=(d,)) * 0.02, jnp.float32))
    ref = np.asarray(attn_block_xla(x, *args, num_heads=nh))
    out = np.asarray(attn_block_pallas(x, *args, nh))
    np.testing.assert_allclose(out, ref, rtol=3e-3, atol=3e-3)


def test_fused_mlp_parity_on_hw():
    import jax.numpy as jnp
    from vit_fpga_tpu.ops.fused_mlp import fused_mlp_pallas, fused_mlp_xla
    rng = np.random.default_rng(3)
    t, d, m = 512, 768, 3072
    x = jnp.asarray(rng.normal(size=(t, d)), jnp.bfloat16)
    s = jnp.ones((d,), jnp.float32)
    b = jnp.zeros((d,), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, m)) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((m,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(m, d)) * 0.02, jnp.bfloat16)
    b2 = jnp.zeros((d,), jnp.float32)
    ref = np.asarray(fused_mlp_xla(x, s, b, w1, b1, w2, b2,
                                   act="gelu_tanh")).astype(np.float32)
    out = np.asarray(fused_mlp_pallas(x, s, b, w1, b1, w2, b2,
                                      act="gelu_tanh")).astype(np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 0.02


def test_int8_gemm_exact_on_hw():
    import jax.numpy as jnp
    from vit_fpga_tpu.ops.quant import int8_gemm_pallas
    rng = np.random.default_rng(4)
    xq = rng.integers(-127, 128, (512, 768), np.int8)
    wq = rng.integers(-127, 128, (768, 512), np.int8)
    ref = xq.astype(np.int32) @ wq.astype(np.int32)
    out = np.asarray(int8_gemm_pallas(jnp.asarray(xq), jnp.asarray(wq)))
    np.testing.assert_array_equal(out, ref)


def test_streamed_gemm_on_hw():
    import jax.numpy as jnp
    from vit_fpga_tpu.ops.streamed_gemm import streamed_gemm
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(256, 1024)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1024, 512)), jnp.float32)
    # in-kernel dots run at the MXU's default f32 precision, like jnp.dot
    ref = np.asarray(jnp.dot(x, w))
    out = np.asarray(streamed_gemm(x, w, bk=256))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)
    # round-5 tiled grid: production-size shapes the single-cell layout
    # could not fit (L@384 b1 MLP up-projection)
    x2 = jnp.asarray(rng.normal(size=(584, 1024)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(1024, 4096)), jnp.bfloat16)
    ref2 = np.asarray(jnp.dot(x2, w2, preferred_element_type=jnp.float32))
    out2 = np.asarray(streamed_gemm(x2, w2, bk=512, bt=584,
                                    bn=1024)).astype(np.float32)
    np.testing.assert_allclose(out2, ref2, rtol=2e-2, atol=2e-2)


def test_int8_mlp_raised_vmem_on_hw():
    """ViT-H-size int8 MLP weights (12.5 MB > the 11 MB default-plan
    gate) under the round-5 raised scoped-VMEM plan: compiles and
    matches the jnp reference.  The per-linear fallback provably
    compile-OOMs at this geometry (experiments/perf_vith_int8.py)."""
    import jax.numpy as jnp
    from vit_fpga_tpu.ops.quant_block import (MLP_INT8_BIG_VMEM,
                                              mlp_block_int8,
                                              mlp_block_int8_ref,
                                              mlp_plan_int8)
    from vit_fpga_tpu.ops.quant_fused import quantize_weight_colwise
    rng = np.random.default_rng(12)
    t, d, m = 512, 1280, 5120
    bt, vmem = mlp_plan_int8(t, d, m)
    assert bt > 0 and vmem == MLP_INT8_BIG_VMEM
    x = jnp.asarray(rng.normal(size=(t, d)), jnp.bfloat16)
    ls = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32)
    lb = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    w1q, w1s = quantize_weight_colwise(rng.normal(size=(d, m)) * 0.05)
    w2q, w2s = quantize_weight_colwise(rng.normal(size=(m, d)) * 0.05)
    b1 = jnp.asarray(rng.normal(size=(m,)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(d,)) * 0.2, jnp.float32)
    args = (x, ls, lb, jnp.asarray(w1q), jnp.asarray(w1s), b1,
            jnp.asarray(w2q), jnp.asarray(w2s), b2)
    ref = np.asarray(mlp_block_int8_ref(*args), np.float32)
    out = np.asarray(mlp_block_int8(*args, block_t=bt, vmem_limit=vmem),
                     np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 0.03


def test_flash_attention_on_hw():
    import jax.numpy as jnp
    from vit_fpga_tpu.ops.attention import mha_xla
    from vit_fpga_tpu.ops.flash_attention import flash_attention
    rng = np.random.default_rng(6)
    q, k, v = (jnp.asarray(rng.normal(size=(1, 4, 2048, 64)),
                           jnp.bfloat16) for _ in range(3))
    ref = np.asarray(mha_xla(q, k, v)).astype(np.float32)
    out = np.asarray(flash_attention(q, k, v)).astype(np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 0.03


def test_flash_dispatch_in_mha_qkv_on_hw():
    """mha_qkv auto-routes to the blockwise flash kernel at long N."""
    import jax.numpy as jnp
    from vit_fpga_tpu.ops.attention import (FLASH_SEQ_THRESHOLD, mha_qkv,
                                            mha_qkv_xla)
    rng = np.random.default_rng(7)
    n = FLASH_SEQ_THRESHOLD + 36   # also exercises row padding
    qkv = jnp.asarray(rng.normal(size=(2, n, 3 * 256)), jnp.bfloat16)
    ref = np.asarray(mha_qkv_xla(qkv, 4)).astype(np.float32)
    out = np.asarray(mha_qkv(qkv, 4, impl="pallas")).astype(np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 0.03


def test_attn_block_big_tier_on_hw():
    """ViT-L/16@384 geometry (seq 577) runs the fused kernel via the
    raised-VMEM tier and matches the XLA reference."""
    import jax.numpy as jnp
    from vit_fpga_tpu.ops.attn_block import attn_block_pallas, attn_block_xla
    rng = np.random.default_rng(8)
    D, H = 1024, 16
    x = jnp.asarray(rng.normal(size=(2, 577, D)), jnp.bfloat16)
    ls = jnp.asarray(rng.normal(size=(D,)) * 0.1 + 1.0, jnp.float32)
    lb = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    wq = jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.02, jnp.bfloat16)
    bq = jnp.asarray(rng.normal(size=(3 * D,)) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.normal(size=(D, D)) * 0.02, jnp.bfloat16)
    bo = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    ref = np.asarray(attn_block_xla(x, ls, lb, wq, bq, wo, bo, H)
                     ).astype(np.float32)
    out = np.asarray(attn_block_pallas(x, ls, lb, wq, bq, wo, bo, H)
                     ).astype(np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 0.03


def test_int8_mega_kernels_on_hw():
    import jax.numpy as jnp
    from vit_fpga_tpu.ops import quant_block as qb
    from vit_fpga_tpu.ops.quant_fused import quantize_weight_colwise
    rng = np.random.default_rng(9)
    B, N, D, H, M = 2, 197, 768, 12, 3072
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)
    ls = jnp.ones((D,), jnp.float32); lb = jnp.zeros((D,), jnp.float32)
    wq, ws = (jnp.asarray(a) for a in quantize_weight_colwise(
        rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.05))
    wo, wos = (jnp.asarray(a) for a in quantize_weight_colwise(
        rng.normal(size=(D, D)).astype(np.float32) * 0.05))
    bq = jnp.zeros((3 * D,), jnp.float32); bo = jnp.zeros((D,), jnp.float32)
    ref = np.asarray(qb.attn_block_int8_ref(
        x, ls, lb, wq, ws, bq, wo, wos, bo, H)).astype(np.float32)
    out = np.asarray(qb.attn_block_int8(
        x, ls, lb, wq, ws, bq, wo, wos, bo, H)).astype(np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 0.05

    w1, w1s = (jnp.asarray(a) for a in quantize_weight_colwise(
        rng.normal(size=(D, M)).astype(np.float32) * 0.05))
    w2, w2s = (jnp.asarray(a) for a in quantize_weight_colwise(
        rng.normal(size=(M, D)).astype(np.float32) * 0.05))
    b1 = jnp.zeros((M,), jnp.float32); b2 = jnp.zeros((D,), jnp.float32)
    x2 = x.reshape(B * N, D)
    mref = np.asarray(qb.mlp_block_int8_ref(
        x2, ls, lb, w1, w1s, b1, w2, w2s, b2)).astype(np.float32)
    mout = np.asarray(qb.mlp_block_int8(
        x2, ls, lb, w1, w1s, b1, w2, w2s, b2)).astype(np.float32)
    mscale = np.abs(mref).max() + 1e-6
    assert np.abs(mout - mref).max() / mscale < 0.05


def test_pjrt_native_client_on_hw(tmp_path):
    """The pure-native PJRT client (no libpython) compiles and runs a ViT
    export against the plugin, matching the Python forward."""
    import subprocess
    demo = os.path.join(os.path.dirname(__file__),
                        "../native/build/vft_pjrt_demo")
    if not os.path.exists(demo):
        pytest.skip("native build not present (run cmake/ninja first)")
    plugin = os.environ.get("VFT_PJRT_PLUGIN", "/opt/axon/libaxon_pjrt.so")
    if not os.path.exists(plugin):
        pytest.skip(f"no PJRT plugin at {plugin}")
    from vit_fpga_tpu.utils.export_pjrt import export_vit
    out = export_vit(str(tmp_path / "model"), variant="vit_ti16",
                     image_size=64, batch=2, num_classes=10)
    ldd = subprocess.run(["ldd", demo], capture_output=True, text=True)
    assert "python" not in ldd.stdout.lower()
    env = dict(os.environ,
               AXON_POOL_SVC_OVERRIDE=os.environ.get(
                   "AXON_POOL_SVC_OVERRIDE", "127.0.0.1"),
               AXON_LOOPBACK_RELAY="1",
               TPU_WORKER_HOSTNAMES=os.environ.get(
                   "TPU_WORKER_HOSTNAMES", "localhost"))
    run = subprocess.run([demo, f"model={out}", "iters=2"], env=env,
                         capture_output=True, text=True, timeout=900)
    assert run.returncode == 0, run.stderr[-2000:]
    assert "PJRT NATIVE DEMO OK" in run.stdout


def test_native_backward_kernels_on_hw():
    """The native MLP and attention backward kernels compile and match
    jax.vjp of the XLA references on device (bf16-tolerance)."""
    import jax.numpy as jnp
    from vit_fpga_tpu.ops import attn_block as ab
    from vit_fpga_tpu.ops.fused_mlp import (fused_mlp_bwd_pallas,
                                            fused_mlp_xla)
    rng = np.random.default_rng(10)
    B, N, D, H, M = 2, 197, 768, 12, 3072
    f32 = lambda *s, sc=0.1: jnp.asarray(rng.normal(size=s) * sc,
                                         jnp.float32)
    bf = lambda *s, sc=0.1: jnp.asarray(rng.normal(size=s) * sc,
                                        jnp.bfloat16)
    x = bf(B, N, D, sc=0.5)
    ls = f32(D) + 1.0; lb = f32(D)
    wq = bf(D, 3 * D); bq = f32(3 * D); wo = bf(D, D)
    g = bf(B, N, D, sc=0.5)
    _, vjp = jax.vjp(
        lambda *a: ab.attn_block_xla(*a, jnp.zeros((D,), jnp.float32),
                                     num_heads=H),
        x, ls, lb, wq, bq, wo)
    ref = vjp(g)
    got = ab.attn_block_bwd_pallas(x, ls, lb, wq, bq, wo, g, H)
    for r, o in zip(ref, got[:6]):
        r = np.asarray(r, np.float32); o = np.asarray(o, np.float32)
        scale = np.abs(r).max() + 1e-6
        assert np.abs(o - r).max() / scale < 0.05

    x2 = bf(B * N, D, sc=0.5)
    w1 = bf(D, M); b1 = f32(M); w2 = bf(M, D); b2 = f32(D)
    g2 = bf(B * N, D, sc=0.5)
    _, vjp2 = jax.vjp(
        lambda *a: fused_mlp_xla(*a, act="gelu_tanh"),
        x2, ls, lb, w1, b1, w2, b2)
    ref2 = vjp2(g2)
    got2 = fused_mlp_bwd_pallas(x2, ls, lb, w1, b1, w2, g2,
                                act="gelu_tanh")
    for r, o in zip(ref2, got2):
        r = np.asarray(r, np.float32); o = np.asarray(o, np.float32)
        scale = np.abs(r).max() + 1e-6
        assert np.abs(o - r).max() / scale < 0.05


def test_pjrt_native_dense_and_filter_on_hw(tmp_path):
    """The native client runs the reference's BOTH device programs —
    the dense net ('network_v1') and the 1080p filter ('image_process')
    — with oracle parity (filter checksum is bit-exact)."""
    import subprocess
    demo = os.path.join(os.path.dirname(__file__),
                        "../native/build/vft_pjrt_demo")
    if not os.path.exists(demo):
        pytest.skip("native build not present")
    plugin = os.environ.get("VFT_PJRT_PLUGIN", "/opt/axon/libaxon_pjrt.so")
    if not os.path.exists(plugin):
        pytest.skip(f"no PJRT plugin at {plugin}")
    import vit_fpga_tpu as vf
    from vit_fpga_tpu.backends.cpu import NetCPU
    from vit_fpga_tpu.ops.image_filter import filter_image_numpy
    from vit_fpga_tpu.utils.export_pjrt import export_dense, export_filter

    dense_dir = export_dense(str(tmp_path / "dense"), n_ins=784,
                             widths=(256, 10))
    filt_dir = export_filter(str(tmp_path / "filter"), 256, 384,
                             "sharpen")
    env = dict(os.environ,
               AXON_POOL_SVC_OVERRIDE=os.environ.get(
                   "AXON_POOL_SVC_OVERRIDE", "127.0.0.1"),
               AXON_LOOPBACK_RELAY="1",
               TPU_WORKER_HOSTNAMES=os.environ.get(
                   "TPU_WORKER_HOSTNAMES", "localhost"))

    # dense: same deterministic input as the demo binary
    run = subprocess.run([demo, f"model={dense_dir}", "iters=1"], env=env,
                         capture_output=True, text=True, timeout=900)
    assert run.returncode == 0, run.stderr[-2000:]
    x = (((np.arange(784, dtype=np.uint64) * 2654435761) >> np.uint64(24))
         .astype(np.float32) / 255.0)
    oracle = NetCPU(vf.random_net(784, [256, 10], seed=0)).launch_forward(x)
    assert f"argmax={int(np.argmax(oracle))}" in run.stdout

    # filter: bit-exact checksum vs the numpy oracle
    run = subprocess.run([demo, f"model={filt_dir}", "iters=1"], env=env,
                         capture_output=True, text=True, timeout=900)
    assert run.returncode == 0, run.stderr[-2000:]
    n = 256 * 384
    i = np.arange(n, dtype=np.uint64)
    img = ((i * 2654435761) >> np.uint64(24)).astype(np.uint8).reshape(
        256, 384)
    want = int(filter_image_numpy(img, "sharpen").astype(np.uint64).sum())
    assert f"checksum={want}" in run.stdout


def test_latency_forward_parity_on_hw():
    """The single-launch whole-encoder kernel matches the per-layer
    forward on device."""
    import jax.numpy as jnp
    from vit_fpga_tpu.models import vit
    cfg = vit.config("vit_b16", image_size=224, dtype="bfloat16")
    assert vit.latency_forward_supported(cfg, 2)
    params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
    imgs = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 224, 224, 3)), jnp.bfloat16)
    ref = np.asarray(vit.forward(params, imgs, cfg), np.float32)
    got = np.asarray(vit.forward_latency(params, imgs, cfg), np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.02


def test_full_latency_logits_parity_on_hw():
    """The ONE-kernel forward (embed + layers + head in a single
    pallas_call) matches the per-layer forward's logits on device, in
    both bf16 and int8."""
    import jax.numpy as jnp
    from vit_fpga_tpu.models import quantized, vit
    cfg = vit.config("vit_b16", image_size=224, dtype="bfloat16")
    assert vit.full_latency_supported(cfg, 1)
    params = jax.device_put(vit.init_params(jax.random.key(0), cfg))
    imgs = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 224, 224, 3)), jnp.float32)
    ref = np.asarray(vit.forward(params, imgs, cfg), np.float32)
    got = np.asarray(vit.forward_latency_logits(params, imgs, cfg),
                     np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() / scale < 0.02

    qp = jax.device_put(quantized.quantize_vit_fast(params))
    assert quantized.full_int8_latency_supported(qp, cfg, 1)
    gi = np.asarray(
        quantized.vit_forward_int8_latency_logits(qp, imgs, cfg),
        np.float32)
    # int8 vs f32 reference: cosine similarity over logits
    cos = float((gi * ref).sum()
                / (np.linalg.norm(gi) * np.linalg.norm(ref) + 1e-9))
    assert cos > 0.99, cos


def test_pjrt_native_stream_ring_on_hw(tmp_path):
    """The async in-flight execution ring (net::pjrt::Stream — the
    reference's 24-slot event chain done natively on TPU): frames
    pipelined through the ring must all complete, and streaming
    throughput must beat the blocking path (overlap factor > 1)."""
    import subprocess
    demo = os.path.join(os.path.dirname(__file__),
                        "../native/build/vft_pjrt_demo")
    if not os.path.exists(demo):
        pytest.skip("native build not present")
    plugin = os.environ.get("VFT_PJRT_PLUGIN", "/opt/axon/libaxon_pjrt.so")
    if not os.path.exists(plugin):
        pytest.skip(f"no PJRT plugin at {plugin}")
    from vit_fpga_tpu.utils.export_pjrt import export_filter
    filt_dir = export_filter(str(tmp_path / "filter"), 256, 384,
                             "sharpen")
    env = dict(os.environ,
               AXON_POOL_SVC_OVERRIDE=os.environ.get(
                   "AXON_POOL_SVC_OVERRIDE", "127.0.0.1"),
               AXON_LOOPBACK_RELAY="1",
               TPU_WORKER_HOSTNAMES=os.environ.get(
                   "TPU_WORKER_HOSTNAMES", "localhost"))
    run = subprocess.run([demo, f"model={filt_dir}", "mode=stream",
                          "frames=64", "depth=8"], env=env,
                         capture_output=True, text=True, timeout=900)
    assert run.returncode == 0, run.stderr[-2000:]
    assert "fetched=64 dropped=0" in run.stdout, run.stdout
    assert "PJRT STREAM OVERLAP OK" in run.stdout, run.stdout


def test_stats_chain_full_model_parity_on_hw():
    """The stats-epilogue encoder chain (the production ViT-B inference
    path) matches the XLA-block forward end to end."""
    import dataclasses
    import jax.numpy as jnp
    from vit_fpga_tpu.models import vit
    rng = np.random.default_rng(11)
    cfg = vit.config("vit_b16", dtype="bfloat16")
    assert vit._stats_chain_supported(cfg, 16)
    params = vit.init_params(jax.random.key(0), cfg)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.asarray(rng.normal(size=p.shape),
                                         p.dtype), params)
    images = jnp.asarray(rng.normal(size=(16, 224, 224, 3)), jnp.float32)
    got = np.asarray(vit.forward(params, images, cfg), np.float32)
    ref_cfg = dataclasses.replace(cfg, attn_impl="xla", mlp_impl="xla")
    want = np.asarray(vit.forward(params, images, ref_cfg), np.float32)
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 0.03
    # cosine over logits per image
    num = (got * want).sum(-1)
    den = (np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
           + 1e-9)
    assert (num / den).min() > 0.999


def test_pjrt_c_ffi_on_hw(tmp_path):
    """The C FFI over the native PJRT client (net_pjrt_c.h): blocking
    forward + the async ring, driven through ctypes from a clean
    subprocess (a second in-process PJRT client would contend with this
    test runner's own axon session) — any language with a C FFI can run
    the TPU client with zero Python in the data path."""
    import subprocess
    lib_path = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "../native/build/libnet_pjrt.so"))
    if not os.path.exists(lib_path):
        pytest.skip("native build not present")
    plugin = os.environ.get("VFT_PJRT_PLUGIN", "/opt/axon/libaxon_pjrt.so")
    if not os.path.exists(plugin):
        pytest.skip(f"no PJRT plugin at {plugin}")
    from vit_fpga_tpu.ops.image_filter import filter_image_numpy
    from vit_fpga_tpu.utils.export_pjrt import export_filter
    filt_dir = export_filter(str(tmp_path / "filter"), 256, 384,
                             "sharpen")
    img = np.random.default_rng(3).integers(0, 256, (256, 384), np.uint8)
    ref = filter_image_numpy(img, "sharpen")
    np.save(tmp_path / "img.npy", img)
    np.save(tmp_path / "ref.npy", ref)

    driver = f"""
import ctypes, sys
import numpy as np
lib = ctypes.CDLL({lib_path!r})
lib.vft_pjrt_load.restype = ctypes.c_void_p
lib.vft_pjrt_load.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
for name, args, res in [
    ("vft_pjrt_input_nbytes", [ctypes.c_void_p], ctypes.c_size_t),
    ("vft_pjrt_output_nbytes", [ctypes.c_void_p], ctypes.c_size_t),
    ("vft_pjrt_forward", [ctypes.c_void_p, ctypes.c_void_p,
                          ctypes.c_size_t, ctypes.c_void_p,
                          ctypes.c_size_t], ctypes.c_int),
    ("vft_pjrt_stream_create", [ctypes.c_void_p, ctypes.c_size_t],
     ctypes.c_void_p),
    ("vft_pjrt_stream_submit", [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_size_t], ctypes.c_int),
    ("vft_pjrt_stream_fetch", [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_size_t], ctypes.c_int),
    ("vft_pjrt_stream_destroy", [ctypes.c_void_p], None),
    ("vft_pjrt_model_destroy", [ctypes.c_void_p], None),
    ("vft_pjrt_last_error", [], ctypes.c_char_p)]:
    fn = getattr(lib, name); fn.argtypes = args; fn.restype = res
img = np.load({str(tmp_path / "img.npy")!r})
ref = np.load({str(tmp_path / "ref.npy")!r})
m = lib.vft_pjrt_load({plugin!r}.encode(), {filt_dir!r}.encode())
assert m, lib.vft_pjrt_last_error()
n_in = lib.vft_pjrt_input_nbytes(m)
n_out = lib.vft_pjrt_output_nbytes(m)
assert n_in == 256 * 384 and n_out == 256 * 384, (n_in, n_out)
out = np.zeros_like(img)
rc = lib.vft_pjrt_forward(m, img.ctypes.data_as(ctypes.c_void_p), n_in,
                          out.ctypes.data_as(ctypes.c_void_p), n_out)
assert rc == 0, lib.vft_pjrt_last_error()
np.testing.assert_array_equal(out, ref)
s = lib.vft_pjrt_stream_create(m, 4)
assert s, lib.vft_pjrt_last_error()
fetched = 0
for _ in range(6):
    while lib.vft_pjrt_stream_submit(
            s, img.ctypes.data_as(ctypes.c_void_p), n_in) != 1:
        got = np.zeros_like(img)
        assert lib.vft_pjrt_stream_fetch(
            s, got.ctypes.data_as(ctypes.c_void_p), n_out) == 1
        np.testing.assert_array_equal(got, ref)
        fetched += 1
while True:
    got = np.zeros_like(img)
    rc = lib.vft_pjrt_stream_fetch(
        s, got.ctypes.data_as(ctypes.c_void_p), n_out)
    if rc == 0:
        break
    assert rc == 1
    np.testing.assert_array_equal(got, ref)
    fetched += 1
assert fetched == 6, fetched
lib.vft_pjrt_stream_destroy(s)
lib.vft_pjrt_model_destroy(m)
print("C FFI OK")
"""
    env = dict(os.environ,
               AXON_POOL_SVC_OVERRIDE=os.environ.get(
                   "AXON_POOL_SVC_OVERRIDE", "127.0.0.1"),
               AXON_LOOPBACK_RELAY="1",
               TPU_WORKER_HOSTNAMES=os.environ.get(
                   "TPU_WORKER_HOSTNAMES", "localhost"))
    run = subprocess.run([os.sys.executable, "-c", driver], env=env,
                         capture_output=True, text=True, timeout=900)
    assert run.returncode == 0, (run.stdout[-1000:], run.stderr[-2000:])
    assert "C FFI OK" in run.stdout


def test_chunked_stats_chain_vit_l_on_hw():
    """Big-weight, few-row geometries (ViT-L) route the stats chain onto
    the CHUNKED stats MLP kernel (plan = -n_chunks); full-model parity
    vs the XLA-block forward on device."""
    import dataclasses
    import jax.numpy as jnp
    from vit_fpga_tpu.models import vit
    rng = np.random.default_rng(13)
    cfg = vit.config("vit_l16", dtype="bfloat16")
    assert vit._stats_chain_supported(cfg, 2)
    n_pad = (cfg.seq_len + 15) // 16 * 16
    assert vit._stats_chain_mlp_vmem(cfg, 2 * n_pad) == -2
    params = vit.init_params(jax.random.key(0), cfg)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.asarray(rng.normal(size=p.shape),
                                         p.dtype), params)
    images = jnp.asarray(rng.normal(size=(2, 224, 224, 3)), jnp.float32)
    got = np.asarray(vit.forward(params, images, cfg), np.float32)
    ref_cfg = dataclasses.replace(cfg, attn_impl="xla", mlp_impl="xla")
    want = np.asarray(vit.forward(params, images, ref_cfg), np.float32)
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 0.03
    num = (got * want).sum(-1)
    den = (np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
           + 1e-9)
    assert (num / den).min() > 0.999


def test_tp_partial_kernels_compile_and_match_on_hw():
    """Mosaic-compile the residual=False PARTIAL kernels at ViT-B tp=2
    shapes on the single real chip and check parity vs the XLA partial
    oracle (VERDICT r3 #9: the fused multi-chip path's per-shard kernels
    must not rest on interpret mode alone).  This runs the exact
    shard_map body (parallel/shard_model._attn/_mlp_partial_fwd_impl)
    single-device — same shapes, same kernels, no mesh needed."""
    import jax.numpy as jnp
    from vit_fpga_tpu.parallel import shard_model as sm

    d, heads, mlp, n, tp = 768, 12, 3072, 197, 2
    h_loc, da, m_loc = heads // tp, d // tp, mlp // tp
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    from vit_fpga_tpu.ops.common import pad_sublane, round_up
    n_pad = round_up(n, pad_sublane(dt))
    x = jnp.asarray(rng.normal(size=(2, n_pad, d)) * 0.5, dt)
    ls = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32)
    lb = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(d, 3 * da)) * 0.02, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * da,)) * 0.02, jnp.float32)
    wo = jnp.asarray(rng.normal(size=(da, d)) * 0.02, jnp.float32)

    got = np.asarray(sm._attn_partial_fwd_impl(
        x, ls, lb, wqkv, bqkv, wo, h_loc, 1e-6, n, "pallas", False),
        np.float32)
    want = np.asarray(sm._attn_partial_xla(
        x, ls, lb, wqkv, bqkv, wo, h_loc, 1e-6, n), np.float32)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    assert err < 2e-2, f"tp=2 partial attention mismatch: rel {err:.2e}"

    xt = x.reshape(2 * n_pad, d)
    w1 = jnp.asarray(rng.normal(size=(d, m_loc)) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(m_loc,)) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(m_loc, d)) * 0.02, jnp.float32)
    got = np.asarray(sm._mlp_partial_fwd_impl(
        xt, ls, lb, w1, b1, w2, 1e-6, "gelu_tanh", "pallas"), np.float32)
    want = np.asarray(sm._mlp_partial_xla(
        xt, ls, lb, w1, b1, w2, 1e-6, "gelu_tanh"), np.float32)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    assert err < 2e-2, f"tp=2 partial MLP mismatch: rel {err:.2e}"
