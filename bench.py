"""Headline benchmark: masked Float64 Sum throughput (MB/s).

Mirrors the reference's published benchmark (arrow/math Sum over arrays,
README.md:105 — AVX2 float64 8192-element sum at 95,375 MB/s on
darwin/amd64). Our engine sums a null-masked float64 column resident in
HBM through the public reduction kernel path (ops/reductions, XLA path —
the same code `compute.sum` uses).

Methodology (honest under the remote-TPU tunnel, whose first
block_until_ready can return before execution finishes): run two
dependent chains of different lengths, force completion by materializing
the final scalar VALUE on host, and difference the two wall times —
the fixed dispatch/transfer overhead cancels exactly, leaving pure
per-operation device time. The accumulating scalar chain makes every
execution's input distinct so no run can be elided, and the final value
is checked against the numpy oracle.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MBPS = 95_375.41  # reference Float64 Sum AVX2, README.md:105

L1, L2 = 8, 40             # chain lengths; per-op = (T2-T1)/(L2-L1)


def main() -> None:
    from arrow_go_tpu.jaxenv import jax, jnp

    import arrow_go_tpu as agt
    from arrow_go_tpu.device import to_device
    from arrow_go_tpu.ops import reductions

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

    base = vals[mask].sum()

    def chain(length: int) -> float:
        bias = jnp.asarray(0.0, jnp.float64)
        t0 = time.perf_counter()
        for _ in range(length):
            bias = step(col.values, col.validity, bias)
        got = float(bias)            # host materialization = true completion
        dt = time.perf_counter() - t0
        if not np.isclose(got, base * length, rtol=1e-9):
            raise SystemExit(f"WRONG RESULT: {got} != {base * length}")
        return dt

    # warmup / compile (+ first-use tunnel round trip)
    chain(1)
    chain(1)

    # median of 3 differenced measurements
    per_ops = []
    for _ in range(3):
        t1 = chain(L1)
        t2 = chain(L2)
        per_ops.append((t2 - t1) / (L2 - L1))
    dt = float(np.median(per_ops))

    mbps = vals.nbytes / dt / 1e6
    print(json.dumps({
        "metric": "masked_sum_f64_throughput",
        "value": round(mbps, 1),
        "unit": "MB/s",
        "vs_baseline": round(mbps / BASELINE_MBPS, 3),
    }))


if __name__ == "__main__":
    main()
