"""AOT-export artifact tests (manifest/weights consistency; the PJRT
client consumes these — hardware round-trip in test_tpu_hw.py)."""

import os

import numpy as np
import pytest

import jax

from vit_fpga_tpu.utils.export_pjrt import export_vit


def _check_artifacts(out):
    lines = open(os.path.join(out, "manifest.txt")).read().splitlines()
    assert lines[0] == "vft-pjrt-manifest v1"
    nargs = int(lines[1].split()[1])
    args = [ln.split() for ln in lines[2:2 + nargs]]
    assert len(args) == nargs
    wsize = os.path.getsize(os.path.join(out, "weights.bin"))
    total = 0
    n_inputs = 0
    for a in args:
        assert a[0] == "arg"
        kind, dt, ndim = a[2], a[3], int(a[4])
        dims = list(map(int, a[5:5 + ndim]))
        off, nb = int(a[5 + ndim]), int(a[6 + ndim])
        if kind == "weight":
            itemsize = {"f32": 4, "i32": 4, "bf16": 2, "u8": 1,
                        "i8": 1}[dt]
            assert nb == int(np.prod(dims)) * itemsize
            assert off + nb <= wsize
            total += nb
        else:
            n_inputs += 1
    assert n_inputs == 1
    assert total == wsize
    out_line = lines[2 + nargs].split()
    assert out_line[0] == "out" and out_line[1] == "f32"
    assert os.path.getsize(os.path.join(out, "model.mlir")) > 1000
    assert os.path.getsize(os.path.join(out, "compile_options.pb")) > 100


@pytest.mark.parametrize("variant,dtype,classes", [
    ("vit_ti16", "float32", 10),
    ("vit_ti16", "int8", 10),
    ("clip_vit_ti16", "bfloat16", 16),
])
def test_export_artifacts(tmp_path, variant, dtype, classes):
    if dtype == "int8" and jax.default_backend() != "tpu":
        pytest.skip("int8 export lowers Pallas TPU kernels (TPU-only)")
    out = export_vit(str(tmp_path / "m"), variant=variant, image_size=32,
                     batch=2, num_classes=classes, dtype=dtype)
    _check_artifacts(out)


def test_export_clip_int8(tmp_path):
    """CLIP + int8 export (the round-2 gap): artifacts lower and the
    manifest carries int8 weight tensors."""
    if jax.default_backend() != "tpu":
        pytest.skip("int8 export lowers Pallas TPU kernels (TPU-only)")
    out = export_vit(str(tmp_path / "m"), variant="clip_vit_ti16",
                     image_size=64, batch=2, num_classes=32,
                     dtype="int8")
    _check_artifacts(out)
    manifest = open(os.path.join(out, "manifest.txt")).read()
    assert " i8 " in manifest   # quantized weights present


def test_clip_int8_forward_parity(monkeypatch):
    """clip_forward_int8_fast matches the f32 CLIP tower within the int8
    quantization budget."""
    import jax.numpy as jnp
    from vit_fpga_tpu.models import clip, quantized
    from vit_fpga_tpu.ops import quant_fused as qf
    if jax.default_backend() != "tpu":
        orig = qf.int8_linear_fused
        monkeypatch.setattr(
            qf, "int8_linear_fused",
            lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    rng = np.random.default_rng(0)
    cfg = clip.clip_vision_config("vit_ti16", image_size=64,
                                  dtype="float32")
    params = clip.init_params(jax.random.key(0), cfg, projection_dim=32)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.asarray(rng.normal(size=p.shape),
                                         p.dtype), params)
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    want = np.asarray(clip.forward(params, images, cfg))
    qp = quantized.quantize_clip_vision_fast(params)
    got = np.asarray(quantized.clip_forward_int8_fast(qp, images, cfg))
    cos = (got * want).sum() / (np.linalg.norm(got)
                                * np.linalg.norm(want) + 1e-9)
    assert cos > 0.99, cos
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.2, rel
