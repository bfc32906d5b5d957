"""Roofline probe v5: group-by aggregation variants at suite size.

  A_scatter  — current: encode (sort) + P-sized scatter-add of values
  B_segment  — sorted-segment sums: values gathered into key order ride
               a cumsum; per-run sums read off at run boundaries; the
               only scatter carries n_runs updates (run results), not P
"""
from __future__ import annotations

import json
import time

import numpy as np

L2 = 41
REPEATS = 5


def main():
    from arrow_go_tpu.jaxenv import jax, jnp
    from arrow_go_tpu.ops import hashing
    from arrow_go_tpu import dtypes as dt

    lax = jax.lax
    nh = 1 << 22

    @jax.jit
    def program(bias, Ls):
        iota_h = jnp.arange(nh, dtype=jnp.int32)
        hv = (hashing.hash32(iota_h) % jnp.uint32(1000)).astype(jnp.int64)
        keys0 = (hashing.hash32(iota_h + 2)
                 % jnp.uint32(1 << 16)).astype(jnp.int64)
        checks = []

        def chain(idx, body):
            def b(_, carry):
                k, acc = carry
                k = lax.dynamic_update_slice(
                    k, k[0:1] + bias.astype(k.dtype), (0,))
                return k, acc + body(k).astype(jnp.float64)
            _, acc = lax.fori_loop(0, Ls[idx], b, (keys0, jnp.float64(0)))
            return acc

        def scatter_agg(k):
            res = hashing.encode_codes(k, dt.int64, None, nh, order="key")
            s = jnp.zeros(nh + 1, jnp.int64).at[
                jnp.where(res.codes >= 0, res.codes, nh)].add(
                hv, mode="drop")
            return res.n_unique + s[0] + s[nh // 2]

        def segment_agg(k):
            # inline encode pieces: sort, run starts, then segment sums
            key = k.astype(jnp.uint64) ^ (jnp.uint64(1) << 63)
            khi = (key >> jnp.uint64(32)).astype(jnp.uint32)
            klo = key.astype(jnp.uint32)
            iota = jnp.arange(nh, dtype=jnp.int32)
            shi, slo, sidx = jax.lax.sort((khi, klo, iota), num_keys=2,
                                          is_stable=True)
            prev_hi = jnp.concatenate([shi[:1], shi[:-1]])
            prev_lo = jnp.concatenate([slo[:1], slo[:-1]])
            start = (shi != prev_hi) | (slo != prev_lo) | (iota == 0)
            n_unique = jnp.sum(start.astype(jnp.int32))
            vs = jnp.take(hv, sidx)                      # key-order values
            # chunked 2-D cumsum: jnp.cumsum on 4M i64 trips an XLA
            # scoped-VMEM failure (64-bit reduce-window); row-wise cumsum
            # + row-prefix add compiles and is mathematically identical
            C = 2048
            v2 = vs.reshape(C, nh // C)
            row_cs = jnp.cumsum(v2, axis=1)
            row_tot = row_cs[:, -1]
            row_pref = jnp.cumsum(row_tot) - row_tot
            cs = (row_cs + row_pref[:, None]).reshape(-1)
            start_pos = jax.lax.cummax(jnp.where(start, iota, 0))
            base = jnp.where(start_pos > 0,
                             jnp.take(cs, jnp.maximum(start_pos - 1, 0)), 0)
            run_prefix = cs - base
            nxt = jnp.concatenate([start[1:],
                                   jnp.ones(1, start.dtype)])
            run_id = jnp.cumsum(start.astype(jnp.int32)) - 1
            sums = jnp.zeros(nh + 1, jnp.int64).at[
                jnp.where(nxt, run_id, nh)].set(run_prefix, mode="drop")
            return n_unique + sums[0] + sums[nh // 2]

        checks.append(chain(0, scatter_agg))
        checks.append(chain(1, segment_agg))
        return jnp.stack(checks)

    configs = ["A_scatter", "B_segment"]
    K = len(configs)
    bias = jnp.float64(0)
    zeros = jnp.zeros(K, jnp.int32)

    t0 = time.perf_counter()
    c1 = np.asarray(program(bias, jnp.ones(K, jnp.int32)))
    print(json.dumps({"note": "compiled", "s": round(
        time.perf_counter() - t0, 1), "checks_equal": bool(c1[0] == c1[1])}),
        flush=True)
    if c1[0] != c1[1]:
        raise SystemExit(f"variant mismatch: {c1}")

    def run(Ls):
        t0 = time.perf_counter()
        out = np.asarray(program(bias, Ls))
        return time.perf_counter() - t0, out

    for i, name in enumerate(configs):
        base_i = zeros.at[i].set(1)
        hi_i = zeros.at[i].set(L2)
        run(base_i); run(hi_i)
        deltas = []
        for _ in range(REPEATS):
            tb, cb = run(base_i)
            th, ch = run(hi_i)
            if not np.isclose(ch[i], L2 * cb[i], rtol=0, atol=1.0):
                raise SystemExit(f"chain check failed {name}")
            deltas.append((th - tb) / (L2 - 1))
        dt_ = max(float(np.median(deltas)), 1e-9)
        print(json.dumps({"bench": name, "ms": round(dt_ * 1e3, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
