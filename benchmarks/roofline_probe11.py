"""Roofline probe v11: the Pallas sequential scan (ops/scan.py) vs the
chunked u64 cummax it replaces (join expansion forward fills).

  u64fill_16M         — chunked_cummax of one u64 pack @16M (old path)
  u64fill2_16M        — TWO chunked_cummax fills (the join's actual
                        cost: pack A and pack B share their hi word)
  scan2_16M           — ops/scan.cummax_u64_lanes with 2 lo lanes @16M
                        (ONE pass fills base + both payloads)
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
    from arrow_go_tpu.ops.scan import cummax_u64_lanes

    lax = jax.lax
    P = 1 << 24

    @jax.jit
    def program(bias, Ls):
        iota = jnp.arange(P, dtype=jnp.int32)
        hi0 = hashing.hash32(iota)
        a0 = hashing.hash32(iota + 1)
        b0 = hashing.hash32(iota + 2)
        checks = []

        def chain(idx, body):
            def b(_, carry):
                k, acc = carry
                k = lax.dynamic_update_slice(
                    k, k[0:1] + bias.astype(k.dtype), (0,))
                return k, acc + body(k).astype(jnp.float64)
            _, acc = lax.fori_loop(0, Ls[idx], b, (hi0, jnp.float64(0)))
            return acc

        def fill1(h):
            pack = (h.astype(jnp.uint64) << jnp.uint64(32)) \
                | a0.astype(jnp.uint64)
            f = chunked_cummax(pack)
            return (f[0] + f[P // 2]).astype(jnp.uint32).astype(jnp.int32)

        def fill2(h):
            pa = (h.astype(jnp.uint64) << jnp.uint64(32)) \
                | a0.astype(jnp.uint64)
            pb = (h.astype(jnp.uint64) << jnp.uint64(32)) \
                | b0.astype(jnp.uint64)
            fa = chunked_cummax(pa)
            fb = chunked_cummax(pb)
            return (fa[P // 2] + fb[P // 2]).astype(jnp.uint32) \
                .astype(jnp.int32)

        def scan2(h):
            fh, fa, fb = cummax_u64_lanes(h, [a0, b0])
            return (fh[P // 2] + fa[P // 2] + fb[P // 2]).astype(jnp.int32)

        checks.append(chain(0, fill1))
        checks.append(chain(1, fill2))
        checks.append(chain(2, scan2))
        return jnp.stack(checks)

    configs = ["u64fill_16M", "u64fill2_16M", "scan2_16M"]
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
