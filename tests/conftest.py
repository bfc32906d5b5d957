"""Test configuration: run all device code on a virtual 8-device CPU mesh
(the reference's CI runs every suite twice, asm and noasm
— ci/scripts/test.sh; our analog is pallas-interpret vs XLA on CPU here,
compiled pallas on real TPU in bench runs)."""
import os

# Must happen before jax import anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
