"""Roofline probe v4: TPU primitive costs underlying the suite configs.

filter_take / group_by / join are built from scatter, gather, cumsum,
cummax, sort, searchsorted. This probe times each primitive at suite
sizes in ONE executable so kernel redesign targets the real bottleneck
(hypothesis: XLA scatter on TPU is serial and dominates; sort-based
reformulations should win).
"""
from __future__ import annotations

import json
import time

import numpy as np

L2 = 101
REPEATS = 5


def main():
    from arrow_go_tpu.jaxenv import jax, jnp

    lax = jax.lax
    n = 1 << 24       # 16Mi
    nh = 1 << 22      # 4Mi

    @jax.jit
    def program(bias, Ls):
        iota = jnp.arange(n, dtype=jnp.int32)
        iota_h = jnp.arange(nh, dtype=jnp.int32)
        perm = (iota.astype(jnp.uint32) * jnp.uint32(2654435761)
                % jnp.uint32(n)).astype(jnp.int32)
        perm_h = (iota_h.astype(jnp.uint32) * jnp.uint32(2654435761)
                  % jnp.uint32(nh)).astype(jnp.int32)
        v32 = iota ^ 12345
        sorted_small = jnp.arange(nh, dtype=jnp.int32) * 3
        checks = []

        def chain(idx, init, body):
            def b(_, carry):
                vv, acc = carry
                vv = lax.dynamic_update_slice(
                    vv, vv[0:1] + bias.astype(vv.dtype), (0,))
                out = body(vv)
                return vv, acc + out.astype(jnp.float64)
            _, acc = lax.fori_loop(0, Ls[idx], b, (init, jnp.float64(0)))
            return acc

        # 0 scatter_set_16M: out.at[perm].set(v)
        checks.append(chain(0, v32, lambda v: jnp.zeros(
            n, jnp.int32).at[perm].set(v)[0] + v[1]))
        # 1 scatter_add_4M: acc.at[codes].add(v)
        codes4 = perm_h % (1 << 16)
        checks.append(chain(1, iota_h, lambda v: jnp.zeros(
            1 << 16, jnp.int32).at[codes4].add(v[:nh])[0] + v[1]))
        # 2 gather_16M random
        checks.append(chain(2, v32, lambda v: jnp.take(v, perm)[0] + v[1]))
        # 3 cumsum_16M
        checks.append(chain(3, v32, lambda v: jnp.cumsum(v)[-1]))
        # 4 cummax_16M
        checks.append(chain(4, v32, lambda v: lax.cummax(v)[-1]))
        # 5 sort_pair_16M (u32 key + i32 payload)
        checks.append(chain(5, v32, lambda v: jax.lax.sort(
            (v.astype(jnp.uint32), iota), num_keys=1, is_stable=True
        )[1][0] + v[1]))
        # 6 searchsorted_sort: 16M queries into sorted 4M
        checks.append(chain(6, v32, lambda v: jnp.searchsorted(
            sorted_small, v % (3 * nh), method="sort")[0] + v[1]))
        # 7 searchsorted_scan: same via method='scan' (binary search)
        checks.append(chain(7, v32, lambda v: jnp.searchsorted(
            sorted_small, v % (3 * nh), method="scan_unrolled")[0] + v[1]))
        return jnp.stack(checks)

    configs = ["scatter_set_16M", "scatter_add_4M_to_64K", "gather_16M",
               "cumsum_16M", "cummax_16M", "sort_pair_16M",
               "searchsorted_sort_16Mq_4M", "searchsorted_scan_16Mq_4M"]
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
        dt = max(float(np.median(deltas)), 1e-9)
        print(json.dumps({"bench": name, "ms": round(dt * 1e3, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
