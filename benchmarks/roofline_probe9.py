"""Roofline probe v9: unique_dict_encode (70 ms) and join-expansion
(~155 ms) decomposition at suite shapes — where is the remaining time?

  encode_first    — full encode_codes(order='first_occurrence') @4M
  encode_key      — encode_codes(order='key') @4M (no 2nd sort/fill)
  sort4_4M        — the 4-operand encode sort alone
  sort3_4M        — the second (flag, f, sidx) sort alone
  u64fill_4M      — chunked u64 cummax @4M
  u64fill_16M     — chunked u64 cummax @16M (join expansion's fill)
  expand_16M      — join_expand alone (state precomputed outside chain)
"""
from __future__ import annotations

import json
import time

import numpy as np

L2 = 17
REPEATS = 5


def main():
    from arrow_go_tpu.jaxenv import jax, jnp
    from arrow_go_tpu.ops import hashing
    from arrow_go_tpu.ops.groupagg import chunked_cummax
    from arrow_go_tpu.parallel.join import join_expand, join_sorted_state
    from arrow_go_tpu import dtypes as dt

    lax = jax.lax
    nh = 1 << 22
    PL, PR = 1 << 22, 1 << 20
    CAP = 4 * PL

    @jax.jit
    def program(bias, Ls):
        iota_h = jnp.arange(nh, dtype=jnp.int32)
        keys0 = (hashing.hash32(iota_h + jnp.int32(11))
                 % jnp.uint32(1 << 16)).astype(jnp.int64)
        # join state precomputed OUTSIDE the chains (isolates expansion)
        lk0 = (hashing.hash32(jnp.arange(PL, dtype=jnp.int32))
               % jnp.uint32(PL // 8)).astype(jnp.int64)
        rk0 = (hashing.hash32(jnp.arange(PR, dtype=jnp.int32) + 7)
               % jnp.uint32(PL // 8)).astype(jnp.int64)
        st0 = join_sorted_state(lk0, jnp.ones(PL, jnp.bool_), rk0,
                                jnp.ones(PR, jnp.bool_))
        fill0_4 = (hashing.hash32(iota_h).astype(jnp.uint64)
                   << jnp.uint64(13))
        fill0_16 = (hashing.hash32(jnp.arange(CAP, dtype=jnp.int32))
                    .astype(jnp.uint64) << jnp.uint64(13))
        checks = []

        def chain(idx, body):
            def b(_, carry):
                k, acc = carry
                k = lax.dynamic_update_slice(
                    k, k[0:1] + bias.astype(k.dtype), (0,))
                return k, acc + body(k).astype(jnp.float64)
            _, acc = lax.fori_loop(0, Ls[idx], b, (keys0, jnp.float64(0)))
            return acc

        def encode_first(k):
            res = hashing.encode_codes(k, dt.int64, None, nh)
            return res.n_unique + res.codes[0] + res.first_index[0]

        def encode_key(k):
            res = hashing.encode_codes(k, dt.int64, None, nh, order="key")
            return res.n_unique + res.codes[0] + res.first_index[0]

        def sort4(k):
            khi = (k.astype(jnp.uint64) >> jnp.uint64(32)).astype(jnp.uint32)
            klo = k.astype(jnp.uint32)
            z = jnp.zeros(nh, jnp.int32)
            a, b_, c, d = jax.lax.sort(
                (z, khi, klo, jnp.arange(nh, dtype=jnp.int32)),
                num_keys=3, is_stable=True)
            return a[0] + b_[0].astype(jnp.int32) + d[nh // 2]

        def sort3(k):
            f = (hashing.hash32(k.astype(jnp.int32))).astype(jnp.uint32)
            z = jnp.zeros(nh, jnp.int32)
            a, b_, c = jax.lax.sort(
                (z, f, jnp.arange(nh, dtype=jnp.int32)),
                num_keys=2, is_stable=True)
            return a[0] + b_[0].astype(jnp.int32) + c[nh // 2]

        def u64fill4(k):
            v = fill0_4 + k[0].astype(jnp.uint64)
            return chunked_cummax(v)[nh - 1].astype(jnp.int32) & 0xFFFF

        def u64fill16(k):
            v = fill0_16 + k[0].astype(jnp.uint64)
            return chunked_cummax(v)[CAP - 1].astype(jnp.int32) & 0xFFFF

        def expand(k):
            st = st0._replace(
                total=st0.total + (k[0] - k[0]).astype(jnp.int32))
            li, ri, ov = join_expand(st, CAP)
            return li[0] + ri[CAP // 2]

        checks.append(chain(0, encode_first))
        checks.append(chain(1, encode_key))
        checks.append(chain(2, sort4))
        checks.append(chain(3, sort3))
        checks.append(chain(4, u64fill4))
        checks.append(chain(5, u64fill16))
        checks.append(chain(6, expand))
        return jnp.stack(checks)

    import jax.numpy as jnp2
    configs = ["encode_first_4M", "encode_key_4M", "sort4_4M", "sort3_4M",
               "u64fill_4M", "u64fill_16M", "expand_16M"]
    K = len(configs)
    bias = jnp2.float64(0)
    zeros = jnp2.zeros(K, jnp2.int32)

    t0 = time.perf_counter()
    np.asarray(program(bias, jnp2.ones(K, jnp2.int32)))
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
