"""Headline benchmark: masked Float64 Sum throughput (MB/s).

Mirrors the reference's published benchmark (arrow/math Sum over arrays,
README.md:105 — AVX2 float64 8192-element sum at 95,375 MB/s on
darwin/amd64). Our engine sums a null-masked float64 column resident in
HBM through the public reduction kernel path (ops/reductions, XLA path —
the same code `compute.sum` uses). Methodology matches the Go harness:
warmup, then steady-state timed iterations; a scalar dependency chain
prevents the runtime from deduplicating identical executions.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MBPS = 95_375.41  # reference Float64 Sum AVX2, README.md:105


def main() -> None:
    import jax
    import jax.numpy as jnp

    import arrow_go_tpu as agt
    from arrow_go_tpu.device import to_device
    from arrow_go_tpu.ops import bitmap, reductions

    n = 1 << 24                      # 16Mi rows, 128 MiB of float64
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 1000, n).astype(np.float64)
    mask = rng.random(n) < 0.95      # 5% nulls: the masked-sum engine path
    col = to_device(agt.from_numpy(vals, mask))

    @jax.jit
    def step(values, validity, bias):
        s = reductions.reduce_xla(values, validity, n, "sum")
        return s + bias              # accumulating chain: every call's input
                                     # differs, so no execution can be reused

    bias = jnp.asarray(0.0, jnp.float64)
    # warmup / compile
    bias = step(col.values, col.validity, bias)
    bias.block_until_ready()

    # dependent chain, each execution synced (deep async queues stall the
    # remote runtime); per-iteration wall times, robust aggregate
    iters = 30
    total_chain = 1
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        bias = step(col.values, col.validity, bias)
        bias.block_until_ready()
        times.append(time.perf_counter() - t0)
        total_chain += 1
    dt = float(np.median(times))

    expect = vals[mask].sum() * total_chain   # accumulated over the chain
    got = float(bias)
    if not np.isclose(got, expect, rtol=1e-9):
        raise SystemExit(f"WRONG RESULT: {got} != {expect}")

    mbps = vals.nbytes / dt / 1e6
    print(json.dumps({
        "metric": "masked_sum_f64_throughput",
        "value": round(mbps, 1),
        "unit": "MB/s",
        "vs_baseline": round(mbps / BASELINE_MBPS, 3),
    }))


if __name__ == "__main__":
    main()
