"""The driver-facing harnesses must never bitrot: build the suite's
one-executable program at toy sizes and run the TPU smoke's oracle
checks, all on the CPU mesh."""
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_suite_program_builds_and_checks():
    from benchmarks.suite import build_program
    n, nh = 1 << 12, 1 << 10
    program, sum_oracle, configs = build_program(n, nh)
    K = len(configs)
    mask0 = jnp.asarray((np.arange(n) % 20) != 0)
    c1 = np.asarray(program(jnp.float64(0), jnp.ones(K, jnp.int32), mask0))
    assert c1[0] == sum_oracle
    # linear chain scaling on every config
    c3 = np.asarray(program(jnp.float64(0),
                            jnp.full(K, 3, jnp.int32), mask0))
    np.testing.assert_allclose(c3, 3 * c1, rtol=0, atol=0.5)


def test_tpu_smoke_passes_on_cpu():
    from ci.tpu_smoke import main
    assert main() == 0


def test_bench_py_importable():
    import bench
    assert callable(bench.main)
