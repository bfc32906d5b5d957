"""Headline benchmark: Float64 Sum throughput vs the reference's published
number (arrow/math Float64Funcs.Sum — AVX2 float64 sum at 95,375 MB/s,
reference README.md:105; kernel arrow/math/float64.go:34, asm from
arrow/math/_lib/float64.c). Matching the reference semantics, the summed
column is all-valid, which takes our engine's no-mask fast path
(ops/reductions.reduce_xla — the same code compute.sum uses).

Methodology (honest under the remote-TPU tunnel, where each dispatch pays
a ~1ms host round trip and a first execution can stall): the dependency
chain runs INSIDE one jitted program as a lax.fori_loop with a runtime
trip count, so one dispatch executes L back-to-back device reductions.
An 8-byte dynamic_update_slice folds a runtime-zero bias into the column
every iteration — XLA cannot prove the update is identity, so the reduce
cannot be hoisted out of the loop, while the added traffic is one vector
register. Two chain lengths are differenced to cancel the fixed
dispatch + transfer overhead exactly; result = pure per-reduction device
time.

Correctness is verified against an ANALYTIC oracle: the column is
``(iota % 1024) + 1`` as float64, whose elements and partial sums are
integers < 2^53, so the device sum must equal ``n * 512.5`` EXACTLY no
matter the reduction order — an independent host-side check with zero
host<->device transfer (every new executable or large transfer costs
minutes of one-time warm-up through the tunnel, so the whole bench is
one executable; kernel-vs-numpy parity on random data is covered by
tests/ under the CPU mesh).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MBPS = 95_375.41  # reference Float64 Sum AVX2, README.md:105

L1, L2 = 8, 264            # chain lengths; per-op = (T2-T1)/(L2-L1).
                           # long chains: the differenced delta must dwarf
                           # ~1ms tunnel dispatch jitter (BENCH_NOTES.md)


def main() -> None:
    from arrow_go_tpu.jaxenv import jax, jnp

    from arrow_go_tpu.ops import reductions

    n = 1 << 24                      # 16Mi rows, 128 MiB of float64

    oracle = n * 512.5               # exact: integer-valued f64 elements
    nbytes = n * 8

    # ONE executable for the whole bench: the column is built on device
    # inside the program (once per call, before the loop — cancelled by the
    # differencing), then L dependent reductions run back-to-back
    @jax.jit
    def chained(bias, L):
        values = ((jnp.arange(n, dtype=jnp.int32) & 1023) + 1
                  ).astype(jnp.float64)
        def body(i, carry):
            vals, acc = carry
            vals = jax.lax.dynamic_update_slice(vals, vals[0:1] + bias, (0,))
            s = reductions.reduce_xla(vals, None, vals.shape[0], "sum")
            return vals, acc + s
        _, acc = jax.lax.fori_loop(
            0, L, body, (values, jnp.asarray(0.0, jnp.float64)))
        return acc

    bias = jnp.asarray(0.0, jnp.float64)
    got1 = float(chained(bias, 1))   # compile + first-execution warmup
    if got1 != oracle:               # exact equality: see module docstring
        raise SystemExit(f"WRONG RESULT: {got1} != {oracle}")

    def run(L: int) -> float:
        t0 = time.perf_counter()
        got = float(chained(bias, L))
        dt = time.perf_counter() - t0
        if got != oracle * L:
            raise SystemExit(f"WRONG RESULT: {got} != {oracle * L}")
        return dt

    run(L1); run(L2)                   # warm both trip counts
    per_ops = []
    for _ in range(5):
        t1, t2 = run(L1), run(L2)
        per_ops.append((t2 - t1) / (L2 - L1))
    dt = float(np.median(per_ops))

    mbps = nbytes / dt / 1e6
    print(json.dumps({
        "metric": "sum_f64_throughput",
        "value": round(mbps, 1),
        "unit": "MB/s",
        "vs_baseline": round(mbps / BASELINE_MBPS, 3),
    }))


if __name__ == "__main__":
    main()
