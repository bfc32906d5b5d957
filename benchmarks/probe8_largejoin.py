"""Probe 8: memory-bounded chunked join at the 100M-scale point.

Isolates the suite's hash_join_local --large config (33.5M probe rows /
8.4M build rows streamed in fixed chunks through the gather-free
sort-merge core) to find the largest per-chunk working set that runs
within v5e HBM alongside ~3.5 GB of resident suite data (round-3 had to
cap the probe at 8M rows; the chunked form must not).

Usage: python benchmarks/probe8_largejoin.py [--chunk-pow 21] [--nj-pow 25]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk-pow", type=int, default=21)
    ap.add_argument("--nj-pow", type=int, default=25)
    ap.add_argument("--l2", type=int, default=5)
    ns = ap.parse_args()

    from arrow_go_tpu.jaxenv import jax, jnp
    from arrow_go_tpu.ops import hashing
    from arrow_go_tpu.parallel.join import local_join_inner
    lax = jax.lax

    nj = 1 << ns.nj_pow
    CHUNK = 1 << ns.chunk_pow
    cap = 4 * CHUNK
    NR = nj // 4
    L2 = ns.l2

    @jax.jit
    def program(bias, trips):
        iota_j = jnp.arange(nj, dtype=jnp.int32)
        lk = (hashing.hash32(iota_j) % jnp.uint32(nj // 8)).astype(jnp.int64)
        rk = (hashing.hash32(jnp.arange(NR, dtype=jnp.int32) + jnp.int32(7))
              % jnp.uint32(nj // 8)).astype(jnp.int64)
        ones_c = jnp.ones(CHUNK, jnp.bool_)
        ones_r = jnp.ones(NR, jnp.bool_)

        def body(_, carry):
            l, acc = carry
            l = lax.dynamic_update_slice(
                l, l[0:1] + bias.astype(l.dtype), (0,))

            def chunk_body(c, acc2):
                lk_c = lax.dynamic_slice(l, (c * CHUNK,), (CHUNK,))
                li, ri, rperm, total, ov = local_join_inner(
                    lk_c, ones_c, rk, ones_r, cap)
                return acc2 + (total + li[0] + ri[cap // 2]
                               ).astype(jnp.float64)
            acc_c = lax.fori_loop(0, nj // CHUNK, chunk_body,
                                  jnp.float64(0))
            return l, acc + acc_c
        _, acc = lax.fori_loop(0, trips, body, (lk, jnp.float64(0)))
        return acc

    bias = np.float64(0)
    t0 = time.perf_counter()
    c1 = float(program(bias, 1))
    print(json.dumps({"note": "compiled", "s": round(
        time.perf_counter() - t0, 1), "check": c1}), flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        ch = float(program(bias, L2))
        t1 = time.perf_counter()
        t0b = time.perf_counter()
        cb = float(program(bias, 1))
        t1b = time.perf_counter()
        assert abs(ch - L2 * cb) < 0.5, (ch, cb)
        ts.append(((t1 - t0) - (t1b - t0b)) / (L2 - 1))
    dt_ = float(np.median(ts))
    print(json.dumps({
        "bench": "hash_join_chunked_large",
        "probe_rows": nj, "build_rows": NR, "chunk": CHUNK,
        "ms": round(dt_ * 1e3, 1),
        "rows_per_s": round((nj + NR) / dt_, 0)}), flush=True)


if __name__ == "__main__":
    main()
