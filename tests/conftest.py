"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so the full multi-chip sharding
story is exercised without TPU hardware (the driver separately dry-runs the
multichip path, and benches run on the real chip).  The env vars must be set
before the first ``import jax`` anywhere in the test process.
"""

import os

# Force CPU even when the environment preselects a TPU platform (e.g.
# JAX_PLATFORMS=axon); set VIT_TESTS_ON_TPU=1 to run the suite on hardware.
_ON_TPU = bool(os.environ.get("VIT_TESTS_ON_TPU"))
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
# transformers must not import TensorFlow (it wedges alongside JAX).
os.environ.setdefault("USE_TF", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_TPU:
    # The axon sitecustomize hook calls jax.config.update("jax_platforms",
    # "axon,cpu") at interpreter start, which beats the env var — override
    # it back before any backend initializes.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
