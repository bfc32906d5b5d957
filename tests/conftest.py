"""Test configuration: run all device code on a virtual 8-device CPU mesh
(the reference's CI runs every suite twice, asm and noasm —
ci/scripts/test.sh; our analog is pallas-interpret vs XLA on CPU here,
compiled pallas on real TPU in bench runs).

The container's sitecustomize pins JAX_PLATFORMS=axon (the real TPU
tunnel); tests override to CPU before any backend initializes so the suite
is fast, hermetic, and can fake an 8-device mesh.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
