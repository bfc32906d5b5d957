"""Roofline probe v7: local join cost decomposition at suite shapes
(PL=4M probe, PR=1M build, cap_out=16M pairs) — the probe6 exercise for
hash_join_local (608 ms in BENCH_SUITE_r03, ~12 sort-equivalents).

  sort5_5M      — the combined 5-operand join sort alone (num_keys=4)
  count_pass    — local_join_inner at cap_out=1 (sort + count phase,
                  no expansion buffers)
  full_16M      — local_join_inner at cap_out=16M (the suite config)
  scatter_16M   — ONE scatter-max of 5M updates into a 16M buffer
  cummax_16M    — ONE i32 cummax over 16M
  gather_16M    — ONE random 16M-index gather from a 5M table
  gather_mono16M— ONE monotone (run-expanded) 16M-index gather from 5M
"""
from __future__ import annotations

import json
import time

import numpy as np

L2 = 9
REPEATS = 5


def main():
    from arrow_go_tpu.jaxenv import jax, jnp
    from arrow_go_tpu.ops import hashing
    from arrow_go_tpu.parallel.join import local_join_inner

    lax = jax.lax
    PL, PR = 1 << 22, 1 << 20
    N = PL + PR
    CAP = 4 * PL

    @jax.jit
    def program(bias, Ls):
        iota_l = jnp.arange(PL, dtype=jnp.int32)
        iota_r = jnp.arange(PR, dtype=jnp.int32)
        lk0 = (hashing.hash32(iota_l) % jnp.uint32(PL // 8)).astype(jnp.int64)
        rk0 = (hashing.hash32(iota_r + jnp.int32(7))
               % jnp.uint32(PL // 8)).astype(jnp.int64)
        ones_l = jnp.ones(PL, jnp.bool_)
        ones_r = jnp.ones(PR, jnp.bool_)
        # fixed inputs for the isolated-primitive configs
        iota_n = jnp.arange(N, dtype=jnp.int32)
        upd_pos = (hashing.hash32(iota_n) % jnp.uint32(CAP)).astype(jnp.int32)
        upd_pos = jnp.sort(upd_pos)              # monotone targets (as in fill)
        table5 = hashing.hash32(iota_n).astype(jnp.int32)
        ridx = (hashing.hash32(jnp.arange(CAP, dtype=jnp.int32))
                % jnp.uint32(N)).astype(jnp.int32)
        mono_idx = jnp.sort(ridx)                # monotone run-expanded form
        checks = []

        def chain(idx, body):
            def b(_, carry):
                k, acc = carry
                k = lax.dynamic_update_slice(
                    k, k[0:1] + bias.astype(k.dtype), (0,))
                return k, acc + body(k).astype(jnp.float64)
            _, acc = lax.fori_loop(0, Ls[idx], b, (lk0, jnp.float64(0)))
            return acc

        def sort5(k):
            keys_all = jnp.concatenate([rk0, k])
            side = jnp.concatenate([jnp.zeros(PR, jnp.int32),
                                    jnp.ones(PL, jnp.int32)])
            orig = jnp.concatenate([iota_r, iota_l])
            flag = jnp.zeros(N, jnp.int32)
            k_u = lax.bitcast_convert_type(keys_all, jnp.uint64) \
                ^ (jnp.uint64(1) << 63)
            khi = (k_u >> jnp.uint64(32)).astype(jnp.uint32)
            klo = k_u.astype(jnp.uint32)
            sflag, shi, slo, sside, sorig = jax.lax.sort(
                (flag, khi, klo, side, orig), num_keys=4, is_stable=True)
            return sflag[0] + shi[0].astype(jnp.int32) + sside[N // 2] \
                + sorig[-1]

        def count_pass(k):
            li, ri, rperm, total, ov = local_join_inner(k, ones_l, rk0, ones_r, 1)
            return total + li[0]

        def full(k):
            li, ri, rperm, total, ov = local_join_inner(k, ones_l, rk0, ones_r, CAP)
            return total + li[0] + ri[CAP // 2]

        def scatter16(k):
            buf = jnp.zeros(CAP, jnp.int32).at[upd_pos].max(
                iota_n, mode="drop")
            return buf[0] + buf[CAP // 2] + (k[0] - k[0]).astype(jnp.int32)

        def cummax16(k):
            pre = jnp.zeros(CAP, jnp.int32).at[0].set(
                k[0].astype(jnp.int32))
            return lax.cummax(pre)[CAP - 1]

        def gather16(k):
            t = table5 + k[0].astype(jnp.int32)
            return jnp.take(t, ridx)[0]

        def gather_mono16(k):
            t = table5 + k[0].astype(jnp.int32)
            return jnp.take(t, mono_idx)[0]

        checks.append(chain(0, sort5))
        checks.append(chain(1, count_pass))
        checks.append(chain(2, full))
        checks.append(chain(3, scatter16))
        checks.append(chain(4, cummax16))
        checks.append(chain(5, gather16))
        checks.append(chain(6, gather_mono16))
        return jnp.stack(checks)

    import jax.numpy as jnp2
    configs = ["sort5_5M", "count_pass", "full_16M", "scatter_16M",
               "cummax_16M", "gather_16M", "gather_mono16M"]
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
