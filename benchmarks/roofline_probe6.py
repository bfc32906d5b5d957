"""Roofline probe v6: group-by cost decomposition at 4M rows.

  sort5      — the 5-operand encode sort alone
  encode_key — full encode_codes(order='key')
  scatter_i64— the i64 scatter-add aggregation alone (codes precomputed
               OUTSIDE the chain: isolates the scatter)
  full_agg   — encode + scatter-add (the suite config body)
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
        res0 = hashing.encode_codes(keys0, dt.int64, None, nh, order="key")
        codes0 = res0.codes
        checks = []

        def chain(idx, body):
            def b(_, carry):
                k, acc = carry
                k = lax.dynamic_update_slice(
                    k, k[0:1] + bias.astype(k.dtype), (0,))
                return k, acc + body(k).astype(jnp.float64)
            _, acc = lax.fori_loop(0, Ls[idx], b, (keys0, jnp.float64(0)))
            return acc

        def sort5(k):
            key = k.astype(jnp.uint64) ^ (jnp.uint64(1) << 63)
            khi = (key >> jnp.uint64(32)).astype(jnp.uint32)
            klo = key.astype(jnp.uint32)
            iota = jnp.arange(nh, dtype=jnp.int32)
            ones = jnp.ones(nh, jnp.int32)
            z = jnp.zeros(nh, jnp.int32)
            a, b_, c, d, e = jax.lax.sort((z, khi, klo, iota, ones),
                                          num_keys=3, is_stable=True)
            return a[0] + b_[0].astype(jnp.int32) + d[0] + e[nh // 2]

        def encode_key(k):
            res = hashing.encode_codes(k, dt.int64, None, nh, order="key")
            return res.n_unique + res.codes[0] + res.first_index[nh // 2]

        def scatter_i64(k):
            # codes0 computed outside the chain; k folds in only via a
            # zero-contribution term so the chain dependency holds
            s = jnp.zeros(nh + 1, jnp.int64).at[
                jnp.where(codes0 >= 0, codes0, nh)].add(hv, mode="drop")
            return s[0] + s[nh // 2] + (k[0] - k[0])

        def full_agg(k):
            res = hashing.encode_codes(k, dt.int64, None, nh, order="key")
            s = jnp.zeros(nh + 1, jnp.int64).at[
                jnp.where(res.codes >= 0, res.codes, nh)].add(
                hv, mode="drop")
            return res.n_unique + s[0] + s[nh // 2]

        checks.append(chain(0, sort5))
        checks.append(chain(1, encode_key))
        checks.append(chain(2, scatter_i64))
        checks.append(chain(3, full_agg))
        return jnp.stack(checks)

    configs = ["sort5_4M", "encode_key_4M", "scatter_add_i64_4M",
               "full_agg_4M"]
    K = len(configs)
    bias = jnp.float64(0)
    zeros = jnp.zeros(K, jnp.int32)

    t0 = time.perf_counter()
    np.asarray(program(bias, jnp.ones(K, jnp.int32)))
    print(json.dumps({"note": "compiled", "s": round(
        time.perf_counter() - t0, 1)}), flush=True)

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
            tb, _ = run(base_i)
            th, _ = run(hi_i)
            deltas.append((th - tb) / (L2 - 1))
        dt_ = max(float(np.median(deltas)), 1e-9)
        print(json.dumps({"bench": name, "ms": round(dt_ * 1e3, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
