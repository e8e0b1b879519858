"""Options parser + timing utility tests."""

import numpy as np
import pytest

from vit_fpga_tpu.models import mlp
from vit_fpga_tpu.utils.options import OptionError, Options
from vit_fpga_tpu.utils.timing import time_fn


def test_options_typed_get():
    o = Options(["model=vit_b16", "batch=64", "bf16=true", "lr=0.05",
                 "pos1"])
    assert o.get("model") == "vit_b16"
    assert o.get("batch", int) == 64
    assert o.get("bf16", bool) is True
    assert o.get("lr", float) == 0.05
    assert o.positional == ["pos1"]
    assert o.has("model") and not o.has("missing")
    assert o.get("missing", str, default="dflt") == "dflt"


def test_options_errors():
    with pytest.raises(OptionError):
        Options(["=value"])
    o = Options(["n=abc"])
    with pytest.raises(OptionError):
        o.get("n", int)
    with pytest.raises(OptionError):
        o.get("nonexistent")
    with pytest.raises(OptionError):
        Options(["flag=maybe"]).get("flag", bool)


def test_time_fn_measures():
    params, acts = mlp.random_model(16, [32, 4], seed=0)
    fn = mlp.jit_forward(acts)
    import jax.numpy as jnp
    x = jnp.zeros((4, 16), jnp.float32)
    t = time_fn(fn, params, x, iters=3, warmup=1, inner=2)
    assert t.iters == 3 and t.p50_s > 0 and t.min_s <= t.p50_s <= t.max_s


def test_mlp_model_matches_backend():
    from vit_fpga_tpu.backends.cpu import NetCPU
    from vit_fpga_tpu.defines import random_net
    data = random_net(24, [48, 12], seed=6)
    params, acts = mlp.from_net_data(data)
    x = np.random.default_rng(0).normal(size=(5, 24)).astype(np.float32)
    ours = np.asarray(mlp.forward(params, x, acts=acts))
    oracle = NetCPU(data).forward_batch(x)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)
    # round trip
    back = mlp.to_net_data(params, 24, acts)
    for a, b in zip(back.params, data.params):
        np.testing.assert_array_equal(a, b)
